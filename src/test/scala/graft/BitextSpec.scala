package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Recall contract for bitext_mine's ANN candidate routing.
  *
  * The query routes both kNN passes through the binary-signature tier
  * ([[Similarity.binaryTopK]], prefilter =
  * [[graft.queries.EngineQueries.BitextPrefilter]]) and the DuckDB
  * oracle mirrors the SAME candidate generation, so the correctness
  * gate proves determinism — this spec is the honesty check that the
  * candidates actually find neighbors:
  *
  *  - In the clustered regime (parallel corpora ARE clustered — a
  *    translation pair is a near-duplicate in embedding space, which
  *    is the entire premise of margin-based mining), the ANN top-4
  *    must EQUAL the brute-force top-4, so mining loses nothing.
  *  - On the synthetic test corpus, where cross-half similarities are
  *    near-noise (measured worst-case Hamming rank of a true top-4
  *    neighbor ≈ 0.9·n — no signature can cover that), recall is
  *    measured and pinned at an honest floor rather than hidden.
  */
class BitextSpec extends SparkSpec {

  private val dim = 64

  /** Two aligned "languages": halves share cluster centres (a pair of
    * aligned sentences = same centre, different noise), mirroring the
    * SimilarityRecallSpec generator. */
  private def alignedHalves(nClusters: Int = 25): (DataFrame, DataFrame) = {
    def half(off: Int): DataFrame = {
      val vecs = for (c <- 0 until nClusters; p <- 0 until 5) yield {
        val emb = Array.tabulate(dim) { i =>
          val centre =
            (((2654435761L * (c * dim + i + 1)) % 2001) - 1000).toDouble / 1000.0
          val noise =
            (((((off + c * 5 + p) * dim + i) * 48271L) % 201) - 100).toDouble / 100.0
          (centre + 0.02 * noise).toFloat
        }
        (off + c * 5 + p, emb)
      }
      import spark.implicits._
      vecs.toDF("vec_id", "embedding")
    }
    (half(0), half(10000))
  }

  test("clustered regime: ANN top-4 equals brute-force top-4") {
    val (a, b) = alignedHalves()
    val ann = Similarity.binaryTopK(a, b, "vec_id", "embedding", k = 4,
        prefilter = graft.queries.EngineQueries.BitextPrefilter)
      .select("query_id", "neighbor_id", "cos", "rank")
      .collect().map(_.toSeq).toSet
    val bf = Similarity.bruteForceTopK(a, b, "vec_id", "embedding", k = 4)
      .collect().map(_.toSeq).toSet
    assert(ann == bf, "ANN candidates missed exact top-4 on a clustered corpus")
  }

  /** the bitext_mine_ivf candidate stage: assign IVF cells over the
    * combined corpus, mine each query's top-4 opposite-half neighbors
    * within its cell (mirrors EngineQueries.bitextMineIvf.cellTopK) */
  private def ivfTop4(queries: DataFrame,
                      corpus: DataFrame): Set[(Any, Any)] = {
    val emb = queries.withColumn("q", lit(true))
      .unionByName(corpus.withColumn("q", lit(false)))
      .select(col("vec_id"), col("q"), col("embedding"),
        graft.functions.VecF.normF(col("embedding")).as("norm"))
    val base = graft.pipeline.IvfIndex
      .withCells(emb, "vec_id", "embedding").persist()
    val qs = base.filter(col("q"))
      .select(col("cell"), col("vec_id").as("query_id"),
        col("embedding").as("q_vec"), col("norm").as("q_norm"))
    val cs = base.filter(!col("q"))
      .select(col("cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("c_vec"), col("norm").as("c_norm"))
    val scored = cs.join(qs, Seq("cell"))
      .withColumn("cos", round(graft.functions.VecF.dotF(
        col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), 6))
      .select("query_id", "neighbor_id", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val out = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select("query_id", "neighbor_id")
      .collect().map(r => (r.get(0), r.get(1))).toSet
    base.unpersist()
    out
  }

  private def recall4(got: Set[(Any, Any)], queries: DataFrame,
                      corpus: DataFrame): Double = {
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.get(0), r.get(1)))
    bf.count(got.contains).toDouble / bf.length
  }

  test("clustered regime: IVF-celled candidates keep recall@4 >= 0.95 " +
      "(the parallel-corpus premise the at-scale branch mines)") {
    val (a, b) = alignedHalves()
    val r = recall4(ivfTop4(a, b), a, b)
    info(f"bitext clustered-regime IVF recall@4 = $r%.3f")
    // not exactly 1.0: a cluster sitting on a centroid boundary can
    // split between two cells (measured 0.976 on this fixed corpus)
    assert(r >= 0.95,
      f"IVF recall@4 $r%.3f collapsed below the measured floor 0.95")
  }

  test("noise regime: IVF-celled recall@4 measured and floored — the " +
      "honest cost of same-cell-only candidates on unstructured data") {
    val d = sf("sf0.01")
    val emb = Tables.embeddings(spark, d)
    val a = emb.filter(col("label") < 5).select("vec_id", "embedding")
    val b = emb.filter(col("label") >= 5).select("vec_id", "embedding")
    val r = recall4(ivfTop4(a, b), a, b)
    info(f"bitext noise-regime IVF recall@4 = $r%.3f (measured 0.37)")
    assert(r >= 0.3,
      f"IVF recall@4 $r%.3f collapsed below the measured-floor 0.3")
  }

  test("noise regime: recall@4 measured and above the honest floor") {
    val d = sf("sf0.01")
    val emb = Tables.embeddings(spark, d)
    val a = emb.filter(col("label") < 5)
    val b = emb.filter(col("label") >= 5)
    val ann = Similarity.binaryTopK(b, a, "vec_id", "embedding", k = 4,
        prefilter = graft.queries.EngineQueries.BitextPrefilter)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    val bf = Similarity.bruteForceTopK(b, a, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.get(0), r.get(1)))
    val recall = bf.count(ann.contains).toDouble / bf.length
    info(f"bitext noise-regime recall@4 = $recall%.3f " +
      f"(prefilter ${graft.queries.EngineQueries.BitextPrefilter})")
    assert(recall >= 0.5,
      f"recall@4 $recall%.3f collapsed below the measured-floor 0.5")
  }
}
