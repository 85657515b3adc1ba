package graft

import org.apache.spark.sql.functions._

import graft.functions.HashF

/** Pins the one-pass span-hash kernel to the expression form it
  * replaced: h1 must equal `xxhash64(concat_ws(' ', slice(w, i, L)))`
  * bit-for-bit for every (doc, window) — the kernel's claim is that
  * split-on-space + join-by-space is the identity on byte ranges, so
  * hashing the byte range IS hashing the reconstructed span string.
  * h2 is deliberately NOT the old `xxhash64(span, 1)` (that was a pure
  * function of h1 — 64 real bits dressed as 128); the spec pins h2 to
  * an independent seed-1 fold instead, plus the grouping-equivalence
  * that matters: two windows share (h1,h2) iff they share span text on
  * this corpus. */
class SpanHashesSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def oldSpans(L: Int) = Tables.documents(spark, d)
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .withColumn("n", size(col("w")))
    .filter(col("n") >= L)
    .select(col("doc_id"), explode(expr(
      s"transform(sequence(1, n - ${L - 1}), i -> " +
        s"struct(i AS i, concat_ws(' ', slice(w, i, $L)) AS sp))")).as("s"))
    .select(col("doc_id"), col("s.i").as("i"), col("s.sp").as("span"))

  private def newSpans(L: Int) = Tables.documents(spark, d)
    .filter(HashF.tokenCount(col("text")) >= L)
    .select(col("doc_id"), explode(HashF.spanHashes(col("text"), L)).as("sp"))
    .select(col("doc_id"), col("sp.i").as("i"),
      col("sp.h1").as("h1"), col("sp.h2").as("h2"))

  for (l <- Seq(3, 8)) {
    test(s"L=$l: kernel h1 == xxhash64(span) for every window; " +
        "h2 groups identically to span text") {
      val want = oldSpans(l)
        .select(col("doc_id"), col("i"), xxhash64(col("span")).as("h1"))
      val got = newSpans(l).select("doc_id", "i", "h1")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"L=$l span hashes diverged from the expression form")
      // h2 resolution: (h1,h2) must partition windows exactly like the
      // span TEXT does (no collision and no over-splitting, since h2 is
      // a deterministic function of the same bytes)
      val byText = oldSpans(l).select("span").distinct().count()
      val byHash = newSpans(l).select("h1", "h2").distinct().count()
      assert(byText == byHash, s"L=$l: $byText span texts vs $byHash keys")
    }
  }

  test("h2 is NOT derivable from h1 the old way (independent fold)") {
    val r = newSpans(8).select("h1", "h2").limit(100).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) != org.apache.spark.sql.catalyst.expressions
          .XXH64.hashLong(1L, row.getLong(0)),
        "h2 still the hashLong(1, h1) chain — only 64 real bits")
    }
  }

  test("tokenCount == size(split) incl. empty tokens and multi-byte") {
    import spark.implicits._
    val docs = Seq("", " ", "a", "a b", "a  b ", "héllo wörld  x",
      "ελληνικά κείμενο  δοκιμή", "a b c d e f g h i").toDF("text")
    val bad = docs.filter(
      HashF.tokenCount(col("text")) =!= size(split(col("text"), " ")))
    assert(bad.isEmpty, bad.collect().mkString(","))
  }

  test("multi-byte and empty-token spans hash as their reconstruction") {
    import spark.implicits._
    val docs = Seq((1L, "héllo  wörld  a b c d e f g"),
      (2L, "a b c"), (3L, "ab"), (4L, " x  y z")).toDF("doc_id", "text")
    val want = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 2), i -> " +
          "struct(i AS i, concat_ws(' ', slice(w, i, 3)) AS sp))")).as("s"))
      .select(col("doc_id"), col("s.i").as("i"),
        xxhash64(col("s.sp")).as("h1"))
    val got = docs
      .filter(HashF.tokenCount(col("text")) >= 3)
      .select(col("doc_id"),
        explode(HashF.spanHashes(col("text"), 3)).as("sp"))
      .select(col("doc_id"), col("sp.i").as("i"), col("sp.h1").as("h1"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
