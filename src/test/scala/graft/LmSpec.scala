package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.LmQueries

/** N-gram LM operators: hand-computed Kneser-Ney values (including the
  * unseen-context branch sf0.01 never exercises), and hot-n-gram
  * two-pass completeness. */
class LmSpec extends SparkSpec {

  /** write a toy documents.parquet with the driver schema */
  private def toyDir(rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-lm").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src1").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("KN bigram: hand-computed values, both context branches") {
    // train (doc_id % 10 != 0): 9 copies of "a b a c"
    //   cb: (a,b)=9 (b,a)=9 (a,c)=9; B=3 types; V={a,b,c}=3
    //   c1(a)=18 n1p_fwd(a)=2; c1(b)=9 n1p_fwd(b)=1
    //   n1p_bwd: a=1 b=1 c=1
    // held doc 0 = "z q": unseen context z -> p = pcont(q) = (0+1)/(3+3)
    // held doc 10 = "a b": known     -> p = (max(9-.75,0) + .75*2*(2/6))/18
    val dir = toyDir(
      (1L to 9L).map(i => (i * 10 + 1, "a b a c")) ++
        Seq((0L, "z q"), (10L, "a b")))
    val got = LmQueries.textKnBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val pUnseen = 1.0 / 6.0
    val pKnown = (math.max(9.0 - 0.75, 0.0) + 0.75 * 2 * (2.0 / 6.0)) / 18.0
    assert(got(0L) == ((1L, 0L,
      BigDecimal(-math.log(pUnseen)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(10L) == ((1L, 1L,
      BigDecimal(-math.log(pKnown)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("stupid backoff: unigram floor scores unseen words, never ln(0)") {
    // held doc 0 has a trigram of entirely unseen words
    val dir = toyDir(
      (1L to 9L).map(i => (i * 10 + 1, "a b c a b c")) ++
        Seq((0L, "x y z")))
    val row = LmQueries.textStupidBackoff(spark, dir)
      .filter(col("doc_id") === 0).head
    assert(row.getLong(4) == 1) // n_uni_hit
    // N = 9*6 = 54 train tokens; floor p = 0.4*0.4*(0+1)/54
    val p = 0.4 * 0.4 * (1.0 / 54.0)
    assert(row.getDouble(5) ==
      BigDecimal(-math.log(p)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("ngram_hot: the hash-pruned two-pass finds exactly the direct " +
      "group-by answer on real data") {
    val d = sf("sf0.001")
    val got = LmQueries.ngramHot(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // direct single-pass truth (text on the exchange — test-only)
    val w = split(col("text"), " ")
    val want = Tables.documents(spark, d)
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 5,
          sequence(lit(1), size(col("w")) - 4))
        .otherwise(array().cast("array<int>"))).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(5))).as("ng"))
      .groupBy("ng")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("n_occ"))
      .filter(col("df") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }
}
