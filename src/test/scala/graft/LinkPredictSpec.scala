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
