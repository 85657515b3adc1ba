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
