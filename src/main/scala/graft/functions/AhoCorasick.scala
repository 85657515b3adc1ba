package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring automaton over raw UTF-8
  * bytes — the blocklist / keyword-scan kernel.
  *
  * The naive form — one `contains` (or worse, one regex alternation)
  * per pattern per row — is O(patterns × text) and falls off a cliff
  * past a few dozen patterns; the automaton walks each text byte
  * exactly once regardless of pattern count. Matching on UTF-8 BYTES
  * (not decoded chars) is exact for any pattern byte sequence because
  * UTF-8 is self-synchronizing, and lets the kernel run straight off
  * Spark's `UTF8String` without decoding or allocation.
  *
  * This kernel reports which of ≤ 64 patterns occur (a Long bitmask
  * internally — popcount = distinct patterns present). Larger
  * blocklists shard into ⌈n/64⌉ automata summed per row: still one
  * byte-walk each, never a per-pattern scan.
  *
  * Built once on the driver, shipped as a plan reference object, so
  * the probe inlines into whole-stage codegen like the Bloom and
  * colormap kernels.
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.size <= 64,
    s"1..64 patterns per automaton, got ${patterns.size}")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  // dense byte-transition trie
  private val pats = patterns.map(_.getBytes("UTF-8")).toArray
  private val maxNodes = pats.map(_.length).sum + 1
  private val goto_ = Array.fill(maxNodes * 256)(-1)
  private val fail = new Array[Int](maxNodes)
  private val out = new Array[Long](maxNodes)
  private var nNodes = 1

  locally {
    // trie build
    var p = 0
    while (p < pats.length) {
      val bytes = pats(p)
      var node = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        if (goto_(node * 256 + b) == -1) {
          goto_(node * 256 + b) = nNodes
          nNodes += 1
        }
        node = goto_(node * 256 + b)
        i += 1
      }
      out(node) |= 1L << p
      p += 1
    }
    // BFS fail links; collapse to a full goto function (dense DFA rows)
    val queue = new java.util.ArrayDeque[Int]()
    var b = 0
    while (b < 256) {
      val nxt = goto_(b)
      if (nxt == -1) goto_(b) = 0
      else { fail(nxt) = 0; queue.add(nxt) }
      b += 1
    }
    while (!queue.isEmpty) {
      val node = queue.poll()
      out(node) |= out(fail(node))
      var c = 0
      while (c < 256) {
        val nxt = goto_(node * 256 + c)
        if (nxt == -1) goto_(node * 256 + c) = goto_(fail(node) * 256 + c)
        else { fail(nxt) = goto_(fail(node) * 256 + c); queue.add(nxt) }
        c += 1
      }
    }
  }

  /** bitmask of patterns occurring as substrings of `s`. */
  def mask(s: UTF8String): Long = {
    val bytes = s.getBytes
    var node = 0
    var m = 0L
    var i = 0
    while (i < bytes.length) {
      node = goto_(node * 256 + (bytes(i) & 0xff))
      m |= out(node)
      i += 1
    }
    m
  }

  /** number of distinct patterns present in `s`. */
  def hits(s: UTF8String): Int = java.lang.Long.bitCount(mask(s))
}

/** `blocklist_hits(text)`: distinct-pattern count via one byte-walk. */
case class BlocklistHits(child: Expression, ac: AhoCorasick)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "blocklist_hits"

  override def nullSafeEval(v: Any): Any =
    ac.hits(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, v => s"$a.hits($v)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AhoCorasickF {
  def blocklistHits(c: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(BlocklistHits(
      GraftColumnBridge.expression(c), new AhoCorasick(patterns)))
}
