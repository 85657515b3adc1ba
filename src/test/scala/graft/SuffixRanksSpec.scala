package graft

import graft.operators.SuffixRanks

/** Pins the suffix-rank repeat profile: dense-broadcast and join-walk
  * LCP forms agree row for row (the dispatch guard can change plans,
  * never answers), and hand-built corpora hit known exact lengths. */
class SuffixRanksSpec extends SparkSpec {

  test("dense and join walks agree on the test corpora") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val docs = Tables.documents(spark, d)
      val a = SuffixRanks.maxRepeatProfile(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSeq
      val b = SuffixRanks.maxRepeatProfileJoinWalk(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSeq
      assert(a == b && a.nonEmpty, s"walks diverge at $d")
    }
  }

  test("known exact repeat lengths on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y c d e f g h q r"), // shares c..h (6) with doc 1
      (3L, "z z z"),               // self-overlap: max 2
      (4L, "solo unique tokens only here")
    ).toDF("doc_id", "text")
    val got = SuffixRanks.maxRepeatProfile(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(1L -> 6L, 2L -> 6L, 3L -> 2L, 4L -> 0L), got.toString)
  }

  test("rankWithin assigns exact dense ranks across partition boundaries") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k%03d".format(i % 97), i)).toDF("k", "v")
    val ranked = SuffixRanks.rankWithin(df, Seq("k"), "r")
      .select("k", "r").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // 97 distinct keys → ranks exactly 0..96 in key order
    assert(ranked.map(_._2).toSeq == (0L until 97L))
  }

  test("uniform-lead block ranking equals the sampled range ranking") {
    import spark.implicits._
    // lead is a dense value in [0, 50); secondary key has duplicates
    val df = (0 until 5000)
      .map(i => ((i * 7919) % 50).toLong -> ((i * 31) % 11).toLong)
      .toDF("lead", "sub")
    val a = SuffixRanks.rankWithinTotal(df, Seq("lead", "sub"), "r",
        Some(50L))
    val b = SuffixRanks.rankWithinTotal(df, Seq("lead", "sub"), "r", None)
    assert(a._2 == b._2)
    val am = a._1.select("lead", "sub", "r").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bm = b._1.select("lead", "sub", "r").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(am == bm)
  }
}
