package graft

import org.apache.spark.sql.DataFrame

import graft.operators.BipartiteFixpoint
import graft.queries.PipelineQueries

/** Pins the dense (driver-CSR) branches of the five iterative graph
  * fixpoints to their distributed forms ROW-FOR-ROW on real testdata —
  * the dispatch may only ever route between bit-identical results
  * (every kernel is integer-only, so "equal" means equal, not close).
  * Also pins the guard: an undersized bound must reject and the
  * wrapper must then produce the distributed plan's rows (it always
  * produces SOME rows; the _dist oracle twins keep the at-scale form
  * checked independently). */
class BipartiteFixpointSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def pin(name: String, dense: => Option[DataFrame],
                  dist: => DataFrame): Unit = {
    val den = dense.getOrElse(fail(s"$name: guard rejected sf0.001"))
    assert(den.schema == dist.schema, s"$name: schema diverged")
    assert(rows(den) == rows(dist), s"$name: dense != distributed")
  }

  test("pagerank: dense == distributed, bit-exact") {
    pin("pagerank", BipartiteFixpoint.pagerank(spark, d),
      PipelineQueries.graphPagerankDistributed(spark, d))
  }

  test("hits: dense == distributed, bit-exact") {
    pin("hits", BipartiteFixpoint.hits(spark, d),
      PipelineQueries.graphHitsDistributed(spark, d))
  }

  test("bfs levels: dense == distributed, bit-exact") {
    pin("bfs", BipartiteFixpoint.bfsLevels(spark, d),
      PipelineQueries.graphBfsLevelsDistributed(spark, d))
  }

  test("kcore peel: dense == distributed, bit-exact") {
    pin("kcore", BipartiteFixpoint.kcorePeel(spark, d),
      PipelineQueries.graphKcorePeelDistributed(spark, d))
  }

  test("communities: dense == distributed, bit-exact") {
    import org.apache.spark.sql.functions.col
    val proj = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    pin("communities",
      graft.operators.DenseGraph.communitiesDense(spark, proj),
      PipelineQueries.graphCommunitiesDistributed(spark, d))
  }

  test("assoc_rules: dense == distributed, bit-exact incl. round/ln") {
    import org.apache.spark.sql.functions.col
    val proj = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    pin("assoc_rules",
      graft.operators.DenseGraph.assocRulesDense(spark, proj),
      PipelineQueries.assocRulesDistributed(spark, d))
  }

  test("undersized guard rejects; wrapper falls back to distributed") {
    assert(BipartiteFixpoint.pagerank(spark, d, maxPairs = 4).isEmpty)
    assert(BipartiteFixpoint.hits(spark, d, maxPairs = 4).isEmpty)
    assert(BipartiteFixpoint.bfsLevels(spark, d, maxPairs = 4).isEmpty)
    assert(BipartiteFixpoint.kcorePeel(spark, d, maxPairs = 4).isEmpty)
  }

  test("empty edge relation: dense dispatch declines (no 1/0, no " +
      "empty-frontier min) and leaves the result to the distributed twin") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bifix-empty").toString
    Seq.empty[(Long, Long)].toDF("l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    // an empty file has no row-group statistics → the footer fast path
    // declines and the FALLBACK branch must mirror its raw.isEmpty
    // guard: Some((empty, empty)) would crash every kernel
    assert(BipartiteFixpoint.pagerank(spark, dir).isEmpty)
    assert(BipartiteFixpoint.hits(spark, dir).isEmpty)
    assert(BipartiteFixpoint.bfsLevels(spark, dir).isEmpty)
    assert(BipartiteFixpoint.kcorePeel(spark, dir).isEmpty)
  }
}
