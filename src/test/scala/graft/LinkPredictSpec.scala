package graft

/** Pins the dense broadcast-CSR link-prediction path to the fully
  * distributed sort-RLE formulation: identical rows at both test SFs,
  * so the dispatch guard can never change answers — only plans. */
class LinkPredictSpec extends SparkSpec {
  test("dense and distributed link-predict paths agree") {
    val s = spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dense = graft.queries.EngineQueries.graphLinkPredict(s, sf)
        .collect().map(_.toSeq).toSeq
      val dist = graft.queries.EngineQueries
        .graphLinkPredictDistributed(s, sf)
        .collect().map(_.toSeq).toSeq
      assert(dense == dist, s"paths diverge at $sf")
      assert(dense.size == 20)
    }
  }

  test("forced anti-join branch (edges over the broadcast guard) " +
      "matches the fused broadcast form") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val fused = graft.queries.EngineQueries
      .graphLinkPredictDistributed(s, sf)
      .collect().map(_.toSeq).toSeq
    // broadcastMax = 0 forces the at-scale branch: shuffled wedge
    // join, full run-length candidate emission, distributed left_anti
    val anti = graft.queries.EngineQueries
      .graphLinkPredictDistributed(s, sf, 0L)
      .collect().map(_.toSeq).toSeq
    assert(fused == anti, "anti-join branch diverges from fused branch")
    assert(fused.size == 20)
  }

  test("dense and distributed triangle paths agree") {
    val s = spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dense = graft.queries.PipelineQueries.graphTriangles(s, sf)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      val dist = graft.queries.PipelineQueries
        .graphTrianglesDistributed(s, sf)
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(dense == dist, s"triangle paths diverge at $sf")
      assert(dense.size == 20)
    }
  }
}
