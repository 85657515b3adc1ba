package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Recall gates for the ANN tiers: the oracle queries prove the
  * bucketed plans are deterministic, but say nothing about whether the
  * buckets actually FIND neighbors. On a clustered corpus (the regime
  * ANN exists for — near-duplicate embeddings), recall@k against
  * [[Similarity.bruteForceTopK]] must clear a pinned floor with the
  * SHIPPED parameters (sim_ann_lsh: 8 planes / dim 64; sim_ann_ivf:
  * the data-driven [[graft.pipeline.IvfIndex]] — k = ceil(n/128)
  * sampled two-level cells). The IVF floor is checked at TWO corpus
  * sizes, because the cell count now grows with the corpus and recall
  * must survive the cells getting finer. Generation is
  * integer-deterministic, so the measured recall is reproducible, not
  * flaky. */
class SimilarityRecallSpec extends SparkSpec {

  private val dim = 64

  /** nClusters clusters × 10 points: centre from an integer hash in
    * [-1,1], per-point noise ~2% of the component scale (≈0.02 rad) —
    * tight near-duplicate clusters, the workload LSH/IVF are built for */
  private def clusteredCorpus(nClusters: Int = 20): DataFrame = {
    val vecs = for (c <- 0 until nClusters; p <- 0 until 10) yield {
      val emb = Array.tabulate(dim) { i =>
        val centre =
          (((2654435761L * (c * dim + i + 1)) % 2001) - 1000).toDouble / 1000.0
        val noise =
          ((((c * 10 + p) * dim + i) * 48271L % 201) - 100).toDouble / 100.0
        (centre + 0.02 * noise).toFloat
      }
      (c * 10 + p, emb)
    }
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def recallAt3(ann: DataFrame, exact: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val hit = ann.select("query_id", "neighbor_id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).count(e.contains)
    hit.toDouble / e.size
  }

  test("hyperplane-LSH recall@3 >= 0.9 with shipped parameters") {
    val emb = clusteredCorpus()
    val queries = emb.filter(col("vec_id") % 10 === 0) // one per cluster
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
      "embedding", 3)
    val ann = Similarity.annTopK(emb, queries, "vec_id", "embedding", 3,
      numPlanes = 8, dim = dim)
    val r = recallAt3(ann, exact)
    info(f"LSH recall@3 = $r%.3f")
    assert(r >= 0.9, f"LSH recall@3 $r%.3f below the 0.9 floor")
  }

  /** the shipped sim_ann_ivf shape: data-driven cells, probe own cell */
  private def ivfRecall(emb: DataFrame): Double = {
    val base = graft.pipeline.IvfIndex.withCells(
      emb.select(col("vec_id"), col("embedding"),
        graft.functions.VecF.normF(col("embedding")).as("norm")),
      "vec_id", "embedding")
    val queries = base.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"),
        col("norm").as("q_norm"), col("cell"))
    val scored = base.join(broadcast(queries), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(graft.functions.VecF.dotF(col("q_vec"),
        col("embedding")) / (col("q_norm") * col("norm")), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    val ann = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val exact = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding", 3)
    recallAt3(ann, exact)
  }

  test("IVF recall@3 >= 0.9 with shipped data-driven cells (n=200)") {
    val r = ivfRecall(clusteredCorpus(20)) // plan(200): 2 cells
    info(f"IVF recall@3 = $r%.3f at n=200")
    assert(r >= 0.9, f"IVF recall@3 $r%.3f below the 0.9 floor")
  }

  test("IVF recall@3 >= 0.9 when the cells grow with the corpus (n=2000)") {
    val r = ivfRecall(clusteredCorpus(200)) // plan(2000): 16 cells
    info(f"IVF recall@3 = $r%.3f at n=2000")
    assert(r >= 0.9, f"IVF recall@3 $r%.3f below the 0.9 floor")
  }

  /** deterministic no-structure corpus: every component through a
    * full-avalanche mixer (splitmix64), so the 16 sign bits are
    * effectively independent and band keys stay balanced — a linear
    * congruence here leaves cross-vector sign correlations that trip
    * the concentration probe */
  private def balancedCorpus(n: Int): DataFrame = {
    def mix(x: Long): Long = {
      var z = x * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val vecs = (0 until n).map { v =>
      val emb = Array.tabulate(dim) { i =>
        (mix(v.toLong * dim + i + 7) % 1001).toFloat / 1000f
      }
      (v, emb)
    }
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  test("emb near-dup routes: celled == banded == brute force where " +
      "both candidate schemes cover every qualifying pair") {
    // tight clusters: members share every sign band AND land in the
    // same IVF cell, so BOTH routes surface exactly the within-cluster
    // pairs — the regime where the dispatch must be invisible.
    // Threshold 0.99: within-cluster cos ≥ 0.9993 on this corpus while
    // the strongest cross-cluster correlation measures 0.912 — the
    // truth set is exactly the within-cluster pairs.
    val emb = clusteredCorpus(20)
    def pairs(df: DataFrame): Set[(Int, Int, Double)] =
      df.collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val banded = pairs(
      Similarity.cosinePairsLsh(emb, "vec_id", "embedding", 0.99))
    val celled = pairs(
      Similarity.cosinePairsCells(emb, "vec_id", "embedding", 0.99))
    val brute = pairs(
      Similarity.cosinePairs(emb, "vec_id", "embedding", 0.99))
    assert(brute.nonEmpty, "degenerate corpus: no near-dup pairs at all")
    assert(banded == brute, "banded route diverged from brute force")
    assert(celled == brute, "celled route diverged from brute force")
  }

  test("band-overload probe routes the auto dispatch: quadratic " +
      "candidate mass -> celled, bounded mass -> banded") {
    // sf0.1 testdata: banded candidate mass ≈ 267 pairs/row > the 128
    // factor (fixed 16-key bands are quadratic in n — this corpus has
    // crossed the line); sf0.001 (500 rows, ~66 pairs/row) has not
    val big = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    assert(Similarity.bandsOverloaded(big, "vec_id", "embedding"),
      "sf0.1 corpus no longer trips the candidate-mass probe")
    val small = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(!Similarity.bandsOverloaded(small, "vec_id", "embedding"),
      "sf0.001 corpus tripped the candidate-mass probe")
    val bal = balancedCorpus(400)
    assert(!Similarity.bandsOverloaded(bal, "vec_id", "embedding"),
      "hash-random 400-row corpus tripped the candidate-mass probe")
    // empty corpus: the probe's SUM is null — must answer "not
    // overloaded" (both routes return the empty frame), not NPE
    val empty = balancedCorpus(0)
    assert(!Similarity.bandsOverloaded(empty, "vec_id", "embedding"),
      "empty corpus broke the candidate-mass probe")
    assert(Similarity
      .cosinePairsAuto(empty, "vec_id", "embedding", 0.4).count() == 0)
    // the dispatch is the probe: auto == celled on one side,
    // auto == banded on the other
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    assert(rows(Similarity.cosinePairsAuto(big, "vec_id", "embedding", 0.4))
      == rows(Similarity.cosinePairsCells(big, "vec_id", "embedding", 0.4)))
    assert(rows(Similarity.cosinePairsAuto(small, "vec_id", "embedding", 0.4))
      == rows(Similarity.cosinePairsLsh(small, "vec_id", "embedding", 0.4)))
  }

  test("PQ-ADC recall@5 vs exact top-5 on the testdata corpus") {
    // sim_topk_pq and sim_cosine_topk share the 30-query/top-5
    // contract on the same table, so recall is a direct set compare:
    // how much of the exact top-5 survives the 50-wide ADC shortlist
    val d = "/root/testdata/sf0.001"
    val exact = graft.queries.PipelineQueries.simTopK(spark, d)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.queries.PipelineQueries.simTopKPq(spark, d)
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
    val r = pq.toDouble / exact.size
    info(f"PQ recall@5 = $r%.3f")
    assert(r >= 0.6, f"PQ recall@5 $r%.3f below the 0.6 floor")
  }
}
