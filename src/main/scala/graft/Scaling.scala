package graft

/** Scaling-ratio probe: times the heaviest registered queries at two
  * scale factors in one JVM and records t(10×)/t(1×) per query.
  *
  * The bench answers "how fast at SF x"; this answers "what happens
  * when the data grows 10×" — the question that matters for the 100 TB
  * target. A healthy distributed plan grows ≤ ~linearly (ratio ≈ 10
  * plus log factors and fixed overheads; small-SF runs are dominated by
  * scheduling constants, so ratios well BELOW 10 are common and fine);
  * a super-linear ratio (≳12) flags a plan whose work grows faster than
  * its input — e.g. an unbounded candidate-pair join — and fails this
  * probe loudly.
  *
  * Usage: runMain graft.Scaling [outFile] (defaults to SCALING.json).
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SCALE_RUNS (default 3).
  */
object Scaling {

  /** The heaviest bench queries (by the round-10 record) plus the two
    * iterative graph queries — the ones whose scale behavior is worth
    * pinning. */
  val targets: Seq[String] = Seq(
    "dedup_simhash", "pipeline_curate", "dedup_keep_best",
    "dedup_clusters", "dedup_semantic", "graph_hits", "dedup_jaccard",
    "graph_pagerank", "dedup_substring", "dsir_importance",
    "text_bigram_logprob", "dedup_minhash_lsh", "bm25_topk",
    "dedup_incremental", "graph_triangles", "assoc_rules",
    "knn_classify", "dedup_containment",
    "graph_communities", "ngram_hot", "text_kn_bigram",
    "text_stupid_backoff", "sketch_hll_distinct",
    "corr_matrix", "events_stickiness", "conversion_latency",
    // round-11 additions with non-trivial scale shapes: bigram-PMI
    // count joins, the O(days²) Theil-Sen pair join, the learned-BPE
    // per-lang application, and the label-term tf-idf joins
    "pmi_collocations", "trend_theil_sen", "tokenizer_fertility",
    "cluster_label_terms",
    // round-11 tail: iterative graph shapes (frontier BFS, k-core
    // peeling), the grid×calendar gap-fill spine, the CMS join-size
    // sketch, and the two heaviest TPC-H completions (Q21's fact-fact
    // join + triple distinct aggregate; Q2's grouped-min window)
    "graph_bfs_levels", "graph_kcore_peel", "cube_gapfill_linear",
    "sketch_join_size", "q21_waiting_supplier", "q2_min_cost_supplier",
    // round-11 third sweep: Bloom semi-join reduction (prune ratio is
    // the scale story), the typed cogroup merge, the domain-bounded
    // skyline, and the shared-as-of SCD2 point-in-time lookup
    "join_bloom_prune", "timeline_cogroup", "skyline_pareto",
    "scd2_lookup",
    // round-11 fourth sweep + round-12 reworks, previously unmeasured:
    // the dense/distributed link-predict dispatch, ANN-routed bitext
    // mining, lattice FD discovery, iterative-narrowing percentiles
    // (bounded and unbounded domains), the delta-maintained join view,
    // bitmap exact-distinct, per-source quantile normalization,
    // positional phrase search, sequential patterns, the binary ANN
    // tier, and the unigram-LM trainer
    "graph_link_predict", "bitext_mine", "fd_discovery",
    "percentile_twophase", "percentile_twophase_ts", "ivm_delta_join",
    "bitmap_distinct", "score_quantile_norm", "phrase_search",
    "seq_patterns", "sim_topk_binary", "unigram_train",
    // round-12 additions: the Lee-et-al corpus cut and the
    // suffix-rank repeat profile — both the dispatched default (dense
    // driver-side suffix sort under the 2²² guard) and the forced
    // distributed form (log-round build, stage-count-bound at small
    // SF — its ratio is the honest answer to whether the quadrupling
    // rounds scale)
    "dedup_substring_cut", "substring_repeat_profile",
    "substring_repeat_profile_dist",
    // round-13 widening (verdict: the decade panel is the only
    // 100×-design evidence the harness records — cover the registry
    // broadly, not just the tail): the full TPC-H suite, every ANN
    // tier + the recall evals, the remaining dedup family, the
    // embedding kernels, the text-analysis scans, the event-sequence
    // shapes, and the join/window/sketch workhorses. Fixture-driven
    // multimodal queries are excluded on purpose — their input does
    // not scale with SF, so a ratio would be meaningless.
    "q1_pricing_summary", "q3_top_revenue", "q4_priority_exists",
    "q5_regional_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_priority_shipping", "q13_custdist",
    "q14_promo_share", "q15_top_supplier", "q16_supplier_cnt",
    "q17_small_qty_revenue", "q18_large_orders", "q19_disjunctive_rev",
    "q20_excess_shippers", "q22_sales_opportunity",
    "sim_ann_ivf", "sim_ann_ivf_persisted", "sim_ann_lsh",
    "sim_cosine_topk", "sim_topk_pq", "sim_topk_mrl", "sim_topk_rp",
    "ivf_recall_eval", "lsh_recall_eval",
    "dedup_exact", "dedup_paragraph", "dedup_emb_cosine", "url_dedup",
    "decontaminate", "decontaminate_semantic",
    "emb_kmeans", "emb_pca_power", "emb_outliers", "emb_rp_project",
    "emb_quantize",
    "bpe_train", "tokenize_learned", "ngram_novelty", "overlap_matrix",
    "text_tfidf_top", "text_token_bpe", "text_entropy", "text_langid",
    "text_quality", "retrieval_rrf_fusion", "retrieval_ndcg_eval",
    "vocab_growth",
    "sessionize", "events_funnel", "events_retention", "events_markov",
    "events_pattern_match", "events_acf",
    "window_running", "window_rank", "grouped_topk", "percentiles",
    "interval_join", "fuzzy_join_parts", "skew_salted_join",
    "gaps_islands", "sketch_cms_heavy", "sketch_kmv_distinct",
    "sketch_quantile", "snapshot_upsert", "scd2_build",
    "zorder_prune_eval")

  def main(args: Array[String]): Unit = {
    val outFile = args.headOption.getOrElse("SCALING.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt
    val sfSmall = "/root/testdata/sf0.01"
    val sfBig = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogFilters.muteSanctionedGlobalWindowWarning()
    Tables.configure(spark)
    // warm-up: JVM/codegen/FS metadata for both SF dirs
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq(sfSmall, sfBig).foreach(d =>
      Tables.names.foreach(n => Tables.table(spark, d, n).schema))

    val specs = SparkEntry.specs.filter(q => targets.contains(q.name))
    def time(name: String, dir: String): Double = {
      val q = specs.find(_.name == name).get
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = os.getSystemLoadAverage
    val rows = targets.filter(n => specs.exists(_.name == n)).map { n =>
      val tSmall = time(n, sfSmall)
      val tBig = time(n, sfBig)
      (n, tSmall, tBig, tBig / tSmall)
    }
    val json = rows.map { case (n, a, b, r) =>
      f""""$n":{"sf001_sec":$a%.3f,"sf01_sec":$b%.3f,"ratio":$r%.2f}"""
    }.mkString(",")
    val worst = rows.maxBy(_._4)
    val out =
      f"""{"data_ratio":10,"runs":$runs,"cpus":$cpus,""" +
        f""""load_avg_start":$loadStart%.2f,""" +
        f""""load_avg_end":${os.getSystemLoadAverage}%.2f,""" +
        f""""worst":{"name":"${worst._1}","ratio":${worst._4}%.2f},""" +
        s""""queries":{$json}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
    // a ratio ≳ 12 means super-linear growth on a 10× data step
    rows.filter(_._4 > 12.0).foreach { case (n, _, _, r) =>
      System.err.println(f"SUPER-LINEAR: $n ratio $r%.2f > 12")
    }
    if (rows.exists(_._4 > 12.0)) sys.exit(1)
  }
}
