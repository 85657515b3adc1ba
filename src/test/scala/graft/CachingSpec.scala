package graft

/** The pipeline operators persist intermediates (shingle tables,
  * signatures, bitsets) to defeat projection collapse — and must
  * release them before returning, or a long-lived server accumulates
  * cached blocks until memory pressure evicts them (VERDICT r3 item 2).
  * Contract: after any pipeline query's result materializes, the
  * session cache is empty.
  */
class CachingSpec extends SparkSpec {

  private val pipelineQueries = Seq(
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_keep_best", "dedup_emb_cosine",
    "decontaminate", "pipeline_curate", "bpe_train",
    // round-11 persisting queries (scalar-threshold TPC-H shapes,
    // iterative graph shapes, the spine-building gap fill)
    "q11_important_parts", "q15_top_supplier", "q17_small_qty_revenue",
    "graph_bfs_levels", "graph_kcore_peel", "cube_gapfill_linear",
    // round-11 third sweep: the chi-square cell table and the
    // calibration bin table
    "chi2_independence", "calibration_ece",
    // roc_auc persists the bounded score-domain table
    "roc_auc",
    // round-11 fourth sweep: the per-source bin histogram and the
    // link-prediction edge/degree/oriented-edge triple
    "score_quantile_norm", "graph_link_predict",
    // round-12: the duplicated-span table behind the corpus cut, and
    // the suffix-rank pipeline (RDD-level caches only — the assert
    // below also proves it leaves no cacheManager entries)
    "dedup_substring_cut", "substring_repeat_profile",
    // round-16: the signature-group table behind the cluster surface
    "dedup_simhash_clusters")

  for (name <- pipelineQueries)
    test(s"$name leaves no cached blocks behind") {
      spark.catalog.clearCache()
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      assert(df.count() >= 0)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the cache manager")
    }
}
