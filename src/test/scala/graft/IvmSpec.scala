package graft

/** The compute-it-twice proof for incremental view maintenance: the
  * delta-maintained orders⋈lineitem monthly view must equal the
  * from-scratch recompute row for row. Lives here (not in the bench
  * query) so the bench pays for the view once. */
class IvmSpec extends SparkSpec {
  test("delta-maintained join view equals from-scratch recompute") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val m = graft.queries.EngineQueries.ivmDeltaJoin(spark, d)
        .collect().map(_.toSeq).toSeq
      val f = graft.queries.EngineQueries.ivmDeltaJoinFull(spark, d)
        .collect().map(_.toSeq).toSeq
      assert(m.nonEmpty && m == f, s"maintained view diverges at $d")
    }
  }
}
