package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SentencePiece-style unigram-LM tokenizer training (Kudo 2018):
  * seed a substring vocabulary from the corpus, then EM — E-step
  * Viterbi-segments every word under the current piece costs, M-step
  * re-estimates piece probabilities from path usage and prunes unused
  * multi-char pieces (single chars are floored, never pruned, so
  * every word stays segmentable). The complement to the BPE trainer:
  * BPE grows greedily by pair frequency; unigram starts big and
  * prunes by likelihood.
  *
  * Distribution shape (the 100 TB argument, same as `bpe_train`):
  *  - ONE corpus scan builds the word-frequency table; training never
  *    touches the corpus again — EM runs over the |distinct words|
  *    table with frequencies as weights;
  *  - seeding is a map-side-combined substring-count aggregate
  *    (bounded ≤ MaxWordLen·MaxPieceLen substrings per word);
  *  - each E-step is one pass of the [[graft.functions.UnigramSegment]]
  *    kernel over the word table plus a piece-count aggregate — the
  *    vocabulary (≤ 64 entries) is DRIVER state, like the k-means
  *    centroids and BPE merges;
  *  - all EM arithmetic is integer: costs are micro-nats
  *    round(1e6·ln(total/usage)), so Viterbi compares longs and the
  *    DuckDB oracle replays the identical DP bit-for-bit (ties break
  *    by smallest split point).
  */
object UnigramLm {
  val MaxPieceLen = 4
  val MaxWordLen = 12
  val VocabSize = 64

  /** integer micro-nat costs from usage counts: round(1e6·ln(Σu/u)) */
  def costsOf(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.map(_._2).sum
    vocab.map { case (p, u) =>
      p -> math.round(1e6 * math.log(total.toDouble / u))
    }.toMap
  }

  /** Viterbi segmentation under integer piece costs. dp[j] minimizes
    * total cost over splits; ties keep the SMALLEST split point i
    * (first-found on the ascending scan — the oracle's
    * `ORDER BY cost, previ`). Single chars must all be present. */
  def segment(word: String,
              costs: java.util.HashMap[String, java.lang.Long])
      : Array[String] = {
    val n = word.length
    val Inf = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(Inf)
    val prev = new Array[Int](n + 1)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) {
        val c = costs.get(word.substring(i, j))
        if (c != null && dp(i) != Inf && dp(i) + c < dp(j)) {
          dp(j) = dp(i) + c
          prev(j) = i
        }
        i += 1
      }
      j += 1
    }
    require(dp(n) != Inf, s"unsegmentable word '$word' (missing chars)")
    var k = n
    var out = List.empty[String]
    while (k > 0) {
      out = word.substring(prev(k), k) :: out
      k = prev(k)
    }
    out.toArray
  }

  /** distinct-word frequency table from one corpus scan */
  def wordTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** all substrings of length 1..MaxPieceLen, as a Spark SQL column */
  private def substringsExpr: String =
    s"""filter(flatten(transform(sequence(1, length(word)), i ->
       transform(sequence(1, $MaxPieceLen), l ->
         CASE WHEN i + l <= length(word) + 1
              THEN substring(word, i, l) END))), x -> x IS NOT NULL)"""

  /** Run seeding + `rounds` EM iterations; returns the final vocab as
    * (piece, usage, cost) plus the persisted word table's release
    * being the caller's concern — `train` unpersists before return. */
  def train(s: SparkSession, d: String, rounds: Int = 2)
      : Seq[(String, Long, Long)] = {
    val words = wordTable(s, d).persist()
    try {
      val seed = words
        .select(col("f"), explode(expr(substringsExpr)).as("sub"))
        .groupBy("sub").agg(sum(col("f")).as("c"))
        .persist()
      val chars = seed.filter(length(col("sub")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      require(chars.length <= VocabSize,
        s"unigram-LM vocab size $VocabSize cannot even hold the " +
          s"${chars.length}-char alphabet — raise VocabSize (single " +
          "chars are never prunable or every word with a missing char " +
          "becomes unsegmentable)")
      val multi = seed.filter(length(col("sub")) > 1)
        .orderBy(col("c").desc, col("sub"))
        .limit(VocabSize - chars.length)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      seed.unpersist()
      var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
      var costs = costsOf(vocab)
      for (_ <- 1 to rounds) {
        val usage = words
          .select(col("f"),
            explode(graft.functions.UnigramF.segment(col("word"), costs))
              .as("piece"))
          .groupBy("piece").agg(sum(col("f")).as("u"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        vocab = vocab.flatMap { case (p, _) =>
          if (p.length == 1) Some((p, math.max(usage.getOrElse(p, 0L), 1L)))
          else usage.get(p).map(u => (p, u))
        }
        costs = costsOf(vocab)
      }
      val cs = costs
      vocab.map { case (p, u) => (p, u, cs(p)) }
    } finally words.unpersist()
  }
}
