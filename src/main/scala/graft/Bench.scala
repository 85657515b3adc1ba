package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Queries are forced through the `noop` sink — `count()` would let
  * Catalyst prune away projected columns and skip most of the work, so
  * noop-writing the full result is the honest measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // start wide so hot-key aggregations (the shingle self-join) keep
      // per-task hash maps small; AQE coalesces the small stages back
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)

    // session warm-up (JVM/codegen/FS metadata), not counted per-query
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.table(spark, sfDir, n).schema)

    val results = SparkEntry.specs.filter(_.bench).map { q =>
      // drop persisted intermediates from prior queries and let the
      // ContextCleaner reap dead broadcasts (it is GC-triggered):
      // leftover blocks inflate GC pressure and skew later measurements
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      (q.name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // failed queries report -1 and are excluded from total, so the one
    // JSON line can't silently pass a failure off as a timing
    val qs = results.map { case (k, v, ok) =>
        "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.filter(!_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
