package graft

import org.apache.spark.sql.functions._

/** Directed coverage for [[graft.Spread]] — the r17-opt scan-parallelism
  * heal. The shared test session disables it (plan suites pin at-scale
  * shapes); each test here enables it explicitly and restores the conf.
  */
class SpreadSpec extends SparkSpec {

  private def withSpread[T](f: => T): T = {
    spark.conf.set(Spread.EnabledConf, "true")
    try f finally spark.conf.set(Spread.EnabledConf, "false")
  }

  test("narrow(): true on a single-row-group file, false once the " +
      "layout carries at least cores/2 row groups") {
    // the driver tables ship as one row group per file at every SF
    assert(Spread.narrow(spark, sf("sf0.001") + "/lineitem.parquet"))
    // a layout with >= defaultParallelism/2 row groups must be left
    // alone — at scale the heal is a structural no-op
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    try {
      spark.range(0, 1000).repartition(8)
        .write.mode("overwrite").parquet(s"$dir/wide.parquet")
      assert(graft.sources.ParquetStats
        .rowGroupCount(spark, s"$dir/wide.parquet").exists(_ >= 2))
      assert(!Spread.narrow(spark, s"$dir/wide.parquet"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("spread results are identical to the unspread plan and the " +
      "heal is one hash exchange (no sort-before-repartition)") {
    val d = sf("sf0.001")
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy("l_returnflag", "l_linestatus")
      .agg(Q.dsum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
    val base = agg(Tables.lineitem(spark, d)).collect()
    withSpread {
      val df = agg(Spread(spark, s"$d/lineitem.parquet",
        Tables.lineitem(spark, d), col("l_orderkey")))
      assert(df.collect() === base, "spread changed aggregate results")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(l_orderkey"),
        "heal exchange missing:\n" + plan.take(1200))
      assert(!plan.contains("roundrobin"),
        "heal must hash-partition, not round-robin (sort cost):\n" +
          plan.take(1200))
    }
  }

  test("multi-pass consumers share ONE healed scan via ReusedExchange " +
      "(winsorize local shape)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withSpread {
      val plan = graft.queries.AnalyticsQueries
        .winsorize(spark, sf("sf0.001"))
        .queryExecution.executedPlan.toString
      val factScans = plan.linesIterator
        .count(l => l.contains("FileScan") && l.contains("orders.parquet"))
      assert(factScans == 1,
        s"expected the two percentile passes to share one healed scan, " +
          s"got $factScans:\n" + plan.take(1500))
      assert(plan.contains("ReusedExchange"), plan.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("heal width = min(defaultParallelism, availableProcessors): " +
      "never more simultaneous heavy tasks than the host can run") {
    // r18 (VERDICT r17 #2): local[32] advertises 32 regardless of the
    // cgroup CPU quota; a 32-task memory-heavy wave on fewer effective
    // cores oversubscribes (driver ngram_hot 7.6 s vs 0.7 s quiet)
    assert(Spread.width(32, 16) == 16, "cap at the cgroup quota")
    assert(Spread.width(8, 32) == 8, "never exceed the session's ask")
    assert(Spread.width(32, 32) == 32)
    assert(Spread.width(4, 0) == 1, "degenerate quota still positive")
    // and the live path uses it: the healed exchange's partition count
    // is the capped width, not raw defaultParallelism
    val d = sf("sf0.001")
    withSpread {
      val expected = math.min(spark.sparkContext.defaultParallelism,
        Runtime.getRuntime.availableProcessors)
      val plan = Spread(spark, s"$d/lineitem.parquet",
        Tables.lineitem(spark, d), col("l_orderkey"))
        .queryExecution.sparkPlan.toString
      assert(plan.contains(s"hashpartitioning(l_orderkey#") &&
        plan.contains(s", $expected)"),
        s"expected a $expected-way heal exchange:\n" + plan.take(800))
    }
  }

  test("disabled or wide layout: no repartition exchange is added") {
    val d = sf("sf0.001")
    // conf off (the suite default): identity
    val p0 = Spread(spark, s"$d/lineitem.parquet",
      Tables.lineitem(spark, d), col("l_orderkey"))
      .queryExecution.logical.toString
    assert(!p0.contains("RepartitionByExpression"), p0.take(600))
  }
}
