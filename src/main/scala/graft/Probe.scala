package graft
import org.apache.spark.sql.functions._
object Probe {
  def t[A](n: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"$n: ${(System.nanoTime-t0)/1e9}%.2f s"); r }
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // warm
    s.range(100000).selectExpr("sum(id)").collect()
    t("full dedup_semantic (1st)")(graft.queries.PipelineQueries.dedupSemantic(s, d).collect())
    t("full dedup_semantic (2nd)")(graft.queries.PipelineQueries.dedupSemantic(s, d).collect())
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
      graft.functions.VecF.normF(col("embedding")).as("norm"))
    val n = t("count")(emb.count())
    val p = graft.pipeline.IvfIndex.plan(n)
    val banks = t("sampleBanks")(graft.pipeline.IvfIndex.sampleBanks(emb, "vec_id", "embedding", p))
    val assigned = graft.pipeline.IvfIndex.assignCells(emb, "vec_id", "embedding", p, banks)
    t("assign collect")(assigned.collect())
    val base = assigned
    val a = base.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("ea"), col("norm").as("na"))
    val b = base.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("eb"), col("norm").as("nb"))
    val pairs = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(graft.functions.VecF.dotF(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= 0.35).select("id_a", "id_b")
    t("pairs")(pairs.collect())
    t("clusterPairs+agg")(graft.pipeline.Dedup.clusterPairs(pairs).groupBy("cluster")
      .agg(count(lit(1)).as("n"), concat_ws(",", sort_array(collect_list(col("id")))).as("m")).collect())
  }
}
