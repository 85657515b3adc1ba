package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecF

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The (small) query set is
  *    broadcast against the corpus — one corpus scan, no shuffle of the
  *    corpus itself; the per-pair kernel is the codegen'd
  *    [[graft.functions.FloatVectorDot]]. This is the correctness
  *    baseline and is already the right plan when |queries| is small.
  *  - [[annTopK]]: random-hyperplane LSH buckets. Corpus and queries
  *    hash to a bucket id (deterministic integer-derived planes), the
  *    join is an equality join on the bucket (hash-partitioned, scales
  *    out), and only in-bucket candidates pay the exact-cosine kernel.
  *    At 100 TB the bucketed corpus is written partitioned by bucket so
  *    probes prune to one partition per plane-signature.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes: component (j,i) =
    * ((1009*j + 9176*i) % 2001 - 1000) / 1000 ∈ [-1, 1]. Integer-exact,
    * so any engine reproduces the same planes. */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes)(j => Array.tabulate(dim)(i =>
      (((1009L * j + 9176L * i) % 2001) - 1000).toDouble / 1000.0))

  def withNorm(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("norm", VecF.normF(col(vecCol)))

  /** Exact cosine top-k: for each query row, the k nearest corpus rows
    * (self excluded by id). Cosine is rounded to 6 dp before ranking so
    * ordering is reproducible; ties break by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("norm").as("c_norm"))
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm").as("q_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        VecF.dotF(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("int").as("rank"))
  }

  /** Hyperplane-LSH bucket id for a float-vector column: bit j set iff
    * dot(vec, plane_j) > 0. */
  def bucketCol(vecCol: String, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, j)) =>
      val planeArr = array(p.map(lit(_)).toIndexedSeq: _*)
      val dot = aggregate(
        zip_with(col(vecCol).cast("array<double>"), planeArr, (x, y) => x * y),
        lit(0.0), (a, x) => a + x)
      acc + when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }

  /** ANN via LSH buckets + exact rerank of in-bucket candidates. */
  def annTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = planes(numPlanes, dim)
    val c = withNorm(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        col("norm").as("c_norm"), bucketCol(vecCol, ps).as("bucket"))
    val q = withNorm(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm").as("q_norm"), bucketCol(vecCol, ps).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        VecF.dotF(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("int").as("rank"))
  }

  /** All near-duplicate pairs by cosine ≥ threshold (embedding-space
    * near-dup detection; brute force — LSH-bucket the corpus first at
    * scale). */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val e = withNorm(emb, vecCol)
    val a = e.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      col("norm").as("na"))
    val b = e.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      col("norm").as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(VecF.dotF(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
