package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.{BipartiteFixpoint, DenseGraph}
import graft.queries.{EngineQueries, PipelineQueries}

/** Randomized dense-vs-distributed cross-checks for the whole
  * dense-dispatch graph family, on REAL written parquet (so the footer
  * fast path — row counts and key ranges from row-group statistics —
  * is exercised end-to-end, not just the in-memory fallback guard).
  * Each trial writes a random lineitem projection with skewed degrees
  * and duplicate rows, then pins every dense kernel row-for-row to its
  * distributed twin. A final trial plants keys past the 32-bit pack
  * range and asserts the footer guard REJECTS (the wrapper must then
  * equal the distributed form trivially). */
class RandomGraphEquivSpec extends SparkSpec {

  private def writeLineitem(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-randgraph").toString
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(2)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def randomRows(seed: Int, nOrders: Int, nParts: Int,
                         nSupps: Int, nRows: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nRows).map { _ =>
      // skew: a few hot parts/orders, ids colliding across rows,
      // duplicates common (nRows >> distinct triples)
      val o = (if (rnd.nextInt(10) == 0) rnd.nextInt(3)
               else rnd.nextInt(nOrders)).toLong + 1
      val p = (if (rnd.nextInt(7) == 0) rnd.nextInt(4)
               else rnd.nextInt(nParts)).toLong + 1
      val sKey = (p * 31 + rnd.nextInt(nSupps)).toLong % nSupps + 1
      (o, p, sKey)
    }
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def pinAll(d: String): Unit = {
    def pin(name: String, dense: Option[DataFrame], dist: DataFrame): Unit = {
      val den = dense.getOrElse(fail(s"$name: dense guard rejected"))
      assert(den.schema == dist.schema, s"$name: schema diverged")
      assert(rows(den) == rows(dist), s"$name: dense != distributed")
    }
    pin("pagerank", BipartiteFixpoint.pagerank(spark, d),
      PipelineQueries.graphPagerankDistributed(spark, d))
    pin("hits", BipartiteFixpoint.hits(spark, d),
      PipelineQueries.graphHitsDistributed(spark, d))
    pin("bfs", BipartiteFixpoint.bfsLevels(spark, d),
      PipelineQueries.graphBfsLevelsDistributed(spark, d))
    pin("kcore", BipartiteFixpoint.kcorePeel(spark, d),
      PipelineQueries.graphKcorePeelDistributed(spark, d))
    val proj = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val footer = Some((s"$d/lineitem.parquet", "l_orderkey", "l_partkey"))
    pin("communities",
      DenseGraph.communitiesDense(spark, proj, footer = footer),
      PipelineQueries.graphCommunitiesDistributed(spark, d))
    pin("assoc_rules",
      DenseGraph.assocRulesDense(spark, proj, footer = footer),
      PipelineQueries.assocRulesDistributed(spark, d))
    pin("triangles",
      DenseGraph.trianglesDense(spark, proj, footer = footer),
      PipelineQueries.graphTrianglesDistributed(spark, d))
    pin("link_predict",
      DenseGraph.densePath(spark, proj, footer = footer),
      EngineQueries.graphLinkPredictDistributed(spark, d))
  }

  test("random skewed corpora: every dense kernel == its distributed " +
      "twin row-for-row (footer fast path)") {
    for (trial <- 1 to 2) {
      val d = writeLineitem(randomRows(
        seed = 1000 + trial, nOrders = 300, nParts = 80,
        nSupps = 25, nRows = 2500))
      pinAll(d)
    }
  }

  test("degenerate shapes: single order, single part, two rows") {
    // one order holding every part (max fan-out shape, still tiny)
    pinAll(writeLineitem((1 to 40).map(p => (1L, p.toLong, (p % 5 + 1).toLong))))
    // one part everywhere (star)
    pinAll(writeLineitem((1 to 40).map(o => (o.toLong, 7L, (o % 3 + 1).toLong))))
    // minimal
    pinAll(writeLineitem(Seq((1L, 1L, 1L), (1L, 2L, 1L))))
  }

  test("keys past the 32-bit pack range: footer guard rejects dense") {
    val big = (1L << 31) + 5L
    val d = writeLineitem(Seq((big, 1L, 1L), (big, 2L, 2L),
      (big + 1, 1L, 2L)))
    val proj = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val footer = Some((s"$d/lineitem.parquet", "l_orderkey", "l_partkey"))
    assert(DenseGraph.trianglesDense(spark, proj, footer = footer).isEmpty,
      "order key >= 2^31 must reject the packed collect")
    // supplier key past the pack range: the bipartite FAST path must
    // refuse to pack, but its fallback collects UNPACKED tuples, so the
    // dense branch still engages — and must still match the distributed
    // twin row-for-row (node ids are 2s+1 longs, width-safe to 2^62)
    val d2 = writeLineitem(Seq((1L, 1L, (1L << 32) + 3L), (2L, 2L, 1L),
      (3L, 1L, 1L)))
    val den = BipartiteFixpoint.pagerank(spark, d2)
      .getOrElse(fail("bipartite fallback path must engage"))
    val dist = PipelineQueries.graphPagerankDistributed(spark, d2)
    assert(rows(den) == rows(dist),
      "wide-suppkey corpus: dense fallback != distributed")
  }
}
