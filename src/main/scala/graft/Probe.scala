package graft
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Similarity
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, d)
      for ((qs, cs, tag) <- Seq((emb.filter(col("label")<5), emb.filter(col("label")>=5), "A->B"),
                                 (emb.filter(col("label")>=5), emb.filter(col("label")<5), "B->A"))) {
      // exact top-4
      val bf = Similarity.bruteForceTopK(cs, qs, "vec_id", "embedding", 4)
        .select("query_id","neighbor_id")
      // hamming rank of every (q,c)
      val sigs = cs.select(col("vec_id").as("neighbor_id"), graft.functions.VecF.signPack(col("embedding")).as("sig"))
      val qsig = qs.select(col("vec_id").as("query_id"), graft.functions.VecF.signPack(col("embedding")).as("q_sig"))
      val ham = sigs.crossJoin(broadcast(qsig))
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.VecF.hamming(col("sig"), col("q_sig")).as("h"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy(col("h"), col("neighbor_id"))
      val ranked = ham.withColumn("hrank", row_number().over(w))
      val worst = bf.join(ranked, Seq("query_id","neighbor_id"))
        .agg(max("hrank"), percentile_approx(col("hrank"), lit(0.99), lit(1000))).collect()(0)
      println(s"$d $tag worst_hamming_rank=${worst.get(0)} p99=${worst.get(1)} corpus=${cs.count()}")
      }
    }
  }
}
