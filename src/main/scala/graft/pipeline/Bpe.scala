package graft.pipeline

/** Byte-pair-encoding tokenizer with an embedded merges table — the
  * real algorithm (rank-ordered pair merging, as in the public GPT-2 /
  * subword-nmt BPE formulation), not a regex approximation: token
  * counts drive mixture planning and dedup budgets at pipeline scale,
  * so they must come from an actual merges-driven segmentation.
  *
  * The merges table is WELL-FORMED (every rule's sides are single
  * characters or outputs of earlier rules — the invariant every
  * learned BPE vocabulary has by construction). For such tables,
  * applying rules in rank order each to fixpoint is equivalent to the
  * classic lowest-rank-pair loop, which is what lets the DuckDB oracle
  * replicate the segmentation as an ordered replace fold.
  *
  * Pre-tokenization matches the engine's existing convention:
  * `[a-z]{1,16}|[0-9]|[^a-z0-9 ]` (lowercase word runs capped at 16
  * chars, single digits, single other non-space chars). The 16-char
  * cap is load-bearing for the oracle equivalence: the DuckDB replay
  * gives each merge rule 4 replace-to-fixpoint passes, and a string
  * pass halves a same-pair run — 16 symbols → 8 → 4 → 2 → 1 in
  * exactly 4. An uncapped elongated word ("llll…" × 32) would need a
  * 5th pass and silently diverge between the engines.
  */
object Bpe {

  /** GPT-2 merges-file format: one "left right" pair per line, rank =
    * position. A compact English-ish table; each side is a single char
    * or an earlier rule's output. */
  val MergesText: String =
    """t h
      |th e
      |i n
      |a n
      |an d
      |e r
      |o n
      |r e
      |e n
      |a t
      |o r
      |e s
      |i s
      |i t
      |o u
      |in g
      |e d
      |t o
      |s t
      |a r
      |o f
      |l l
      |h e
      |s e
      |n o
      |m e
      |d e
      |c o
      |r a
      |l i
      |w i
      |u s
      |a s
      |p a
      |m a
      |f or
      |b e
      |wi th
      |no t
      |co m
      |he r""".stripMargin

  /** (left, right) by rank */
  val Merges: IndexedSeq[(String, String)] =
    MergesText.linesIterator.map { l =>
      val Array(a, b) = l.split(' '); (a, b)
    }.toIndexedSeq

  /** shared with the oracle SQL — see the scaladoc's 16-char-cap note */
  val PreTokenRegex = "[a-z]{1,16}|[0-9]|[^a-z0-9 ]"

  /** the embedded table as a [[BpeTable]] */
  val Default: BpeTable = new BpeTable(Merges)

  def segment(word: String): Seq[String] = Default.segment(word)

  def countTokens(text: String): Long = Default.countTokens(text)
}

/** A BPE merges table plus the segmentation loop, parameterized so a
  * CORPUS-LEARNED table (bpe_train's output) can drive tokenization,
  * not just the embedded one. Instances are driver state: they ride
  * the plan into the codegen token-count kernel via addReferenceObj,
  * exactly like the k-means centroids and PQ codebooks. */
final class BpeTable(val merges: IndexedSeq[(String, String)])
    extends Serializable {

  private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** classic BPE: repeatedly merge the lowest-rank adjacent pair (all
    * leftmost non-overlapping occurrences), until no pair has a rank */
  def segment(word: String): Seq[String] = {
    if (word.length <= 1) return if (word.isEmpty) Seq.empty else Seq(word)
    var syms: IndexedSeq[String] = word.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toIndexedSeq
      }
    }
    syms
  }

  @transient private lazy val preToken =
    java.util.regex.Pattern.compile(Bpe.PreTokenRegex)

  /** total BPE token count of a text: pre-tokenize, segment each
    * pre-token, sum. One pass, no allocation beyond the segment call. */
  def countTokens(text: String): Long = {
    val m = preToken.matcher(text)
    var n = 0L
    while (m.find()) {
      val w = m.group()
      // digits / single non-word chars are single tokens by
      // construction; only word runs need the merge loop
      n += (if (w.length <= 1) 1 else segment(w).length)
    }
    n
  }
}
