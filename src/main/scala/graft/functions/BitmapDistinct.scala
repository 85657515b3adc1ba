package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** EXACT distinct-count state as a roaring-style compressed bitmap
  * (Chambi et al. 2016, "Better bitmap performance with Roaring
  * bitmaps") expressed as a typed Spark [[Aggregator]] — the exact
  * counterpart to the HLL sketch in [[HllSketch]]: same engine shape
  * (ObjectHashAggregate, map-side partial before the exchange,
  * associative/commutative/idempotent merge, second-level
  * re-aggregation across groups), but the answer is exact, not a
  * ±6.5% estimate.
  *
  * Why an engine needs this: `COUNT(DISTINCT k)` is not additive —
  * per-group distinct counts cannot be rolled up to a parent group
  * without going back to the raw keys, which at 100 TB means a second
  * full shuffle of the key set per rollup level. A mergeable exact
  * bitmap makes distinct-count behave like `SUM`: per-group states OR
  * together, so day→month→total rollups (or the `__all__` row of a
  * per-type report) touch only the compressed states. The shuffle
  * carries ~1 bit per key in dense regions and 16 bits in sparse ones,
  * vs 64 bits per raw key for `countDistinct`'s expand-shuffle — and
  * vs an unbounded `collect_set` of boxed longs.
  *
  * State layout (everything is `Array[Long]`, the cheapest thing the
  * ExpressionEncoder round-trips at a shuffle boundary):
  *
  *  - a state is an array of containers, sorted by container key;
  *  - a container covers one 2^16-key block: word0 = key >>> 16,
  *    word1 = (kind << 32) | cardinality, payload from word2;
  *  - SPARSE (kind 0): the low 16 bits of each member, sorted, packed
  *    four per long (slot i → word 2+i/4, bits 16·(i&3)); arrays are
  *    exact-sized (len = 2 + ceil(n/4)) so state size is a pure
  *    function of the member set — no capacity padding rides the wire;
  *  - DENSE (kind 1): a 1024-word bit map (8 KiB). Promotion happens
  *    at n = 4097, the crossover where the packed sparse form would
  *    exceed the bitmap (2+1025 vs 2+1024 words).
  *
  * The 2^16 block size and 4096 promotion threshold are the published
  * Roaring constants; 64-bit keys are handled the roaring64 way (the
  * high 48 bits select the container). Keys must be non-negative.
  */
object RoaringLite {
  val SparseMax = 4096   // beyond this a container is stored dense
  val DenseWords = 1024  // 2^16 bits

  @inline def key(c: Array[Long]): Long = c(0)
  @inline def isDense(c: Array[Long]): Boolean = (c(1) >>> 32) == 1L
  @inline def card(c: Array[Long]): Int = (c(1) & 0xFFFFFFFFL).toInt
  /** i-th packed low of a sparse container */
  @inline def low(c: Array[Long], i: Int): Int =
    ((c(2 + (i >> 2)) >>> (16 * (i & 3))) & 0xFFFFL).toInt

  private def sparseLen(n: Int): Int = 2 + ((n + 3) >> 2)

  /** pack sorted distinct lows into an exact-sized sparse container */
  def packSparse(key: Long, lows: Array[Int], n: Int): Array[Long] = {
    val out = new Array[Long](sparseLen(n))
    out(0) = key
    out(1) = n.toLong
    var i = 0
    while (i < n) {
      out(2 + (i >> 2)) |= (lows(i).toLong & 0xFFFFL) << (16 * (i & 3))
      i += 1
    }
    out
  }

  private def denseFrom(key: Long, lows: Array[Int], n: Int): Array[Long] = {
    val out = new Array[Long](2 + DenseWords)
    out(0) = key
    out(1) = (1L << 32) | n.toLong
    var i = 0
    while (i < n) {
      val v = lows(i)
      out(2 + (v >>> 6)) |= 1L << (v & 63)
      i += 1
    }
    out
  }

  /** binary search a sparse container's packed lows; >=0 hit, else
    * -(insertion point)-1 (java.util.Arrays contract) */
  private def search(c: Array[Long], n: Int, v: Int): Int = {
    var lo = 0; var hi = n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val x = low(c, mid)
      if (x < v) lo = mid + 1
      else if (x > v) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  /** insert one low into a container; returns the (possibly new)
    * container array, mutating in place when the exact size allows */
  def insertLow(c: Array[Long], v: Int): Array[Long] = {
    if (isDense(c)) {
      val w = 2 + (v >>> 6); val bit = 1L << (v & 63)
      if ((c(w) & bit) == 0L) { c(w) |= bit; c(1) += 1L }
      return c
    }
    val n = card(c)
    val pos = search(c, n, v)
    if (pos >= 0) return c
    val ins = -pos - 1
    if (n == SparseMax) { // promote, then set the new bit
      val lows = new Array[Int](n)
      var i = 0; while (i < n) { lows(i) = low(c, i); i += 1 }
      val d = denseFrom(key(c), lows, n)
      return insertLow(d, v)
    }
    val out =
      if (sparseLen(n + 1) == c.length) c
      else java.util.Arrays.copyOf(c, sparseLen(n + 1))
    // shift packed tail one slot right (descending so in-place is safe)
    var i = n
    while (i > ins) { setLow(out, i, low(out, i - 1)); i -= 1 }
    setLow(out, ins, v)
    out(1) = (n + 1).toLong
    out
  }

  @inline private def setLow(c: Array[Long], i: Int, v: Int): Unit = {
    val w = 2 + (i >> 2); val sh = 16 * (i & 3)
    c(w) = (c(w) & ~(0xFFFFL << sh)) | (v.toLong & 0xFFFFL) << sh
  }

  /** OR two containers with the same key into a fresh array */
  def orContainers(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (isDense(a) || isDense(b)) {
      val out = new Array[Long](2 + DenseWords)
      out(0) = key(a)
      def mix(c: Array[Long]): Unit =
        if (isDense(c)) {
          var w = 0
          while (w < DenseWords) { out(2 + w) |= c(2 + w); w += 1 }
        } else {
          var i = 0; val n = card(c)
          while (i < n) {
            val v = low(c, i); out(2 + (v >>> 6)) |= 1L << (v & 63); i += 1
          }
        }
      mix(a); mix(b)
      var n = 0L; var w = 0
      while (w < DenseWords) {
        n += java.lang.Long.bitCount(out(2 + w)); w += 1
      }
      out(1) = (1L << 32) | n
      return out
    }
    val na = card(a); val nb = card(b)
    val lows = new Array[Int](na + nb)
    var (i, j, n) = (0, 0, 0)
    while (i < na || j < nb) {
      val takeA = j >= nb || (i < na && low(a, i) <= low(b, j))
      val v = if (takeA) low(a, i) else low(b, j)
      if (takeA) { i += 1; if (j < nb && low(b, j) == v) j += 1 }
      else j += 1
      lows(n) = v; n += 1
    }
    if (n > SparseMax) denseFrom(key(a), lows, n)
    else packSparse(key(a), lows, n)
  }

  /** add one key to a state (array of containers sorted by key) */
  def add(state: Array[Array[Long]], k: Long): Array[Array[Long]] = {
    val hi = k >>> 16
    val v = (k & 0xFFFFL).toInt
    var lo = 0; var hiI = state.length - 1
    while (lo <= hiI) {
      val mid = (lo + hiI) >>> 1
      val x = key(state(mid))
      if (x < hi) lo = mid + 1
      else if (x > hi) hiI = mid - 1
      else { state(mid) = insertLow(state(mid), v); return state }
    }
    val out = new Array[Array[Long]](state.length + 1)
    System.arraycopy(state, 0, out, 0, lo)
    out(lo) = packSparse(hi, Array(v), 1)
    System.arraycopy(state, lo, out, lo + 1, state.length - lo)
    out
  }

  /** merge two states (sorted container-key merge, OR on collisions) */
  def merge(a: Array[Array[Long]], b: Array[Array[Long]])
      : Array[Array[Long]] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Array[Long]](a.length + b.length)
    var (i, j, n) = (0, 0, 0)
    while (i < a.length || j < b.length) {
      if (j >= b.length || (i < a.length && key(a(i)) < key(b(j)))) {
        out(n) = a(i); i += 1
      } else if (i >= a.length || key(b(j)) < key(a(i))) {
        out(n) = b(j); j += 1
      } else {
        out(n) = orContainers(a(i), b(j)); i += 1; j += 1
      }
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def cardinality(state: Array[Array[Long]]): Long = {
    var n = 0L; var i = 0
    while (i < state.length) { n += card(state(i)); i += 1 }
    n
  }
}

/** Input: a non-negative long key. Output: the compressed state
  * (array of containers) — kept as state, not a count, so a second
  * aggregation level can OR per-group states into rollup rows. */
class BitmapAggregator
    extends Aggregator[Long, Array[Array[Long]], Array[Array[Long]]] {
  override def zero: Array[Array[Long]] = Array.empty
  override def reduce(buf: Array[Array[Long]], k: Long): Array[Array[Long]] =
    RoaringLite.add(buf, k)
  override def merge(a: Array[Array[Long]], b: Array[Array[Long]])
      : Array[Array[Long]] = RoaringLite.merge(a, b)
  override def finish(buf: Array[Array[Long]]): Array[Array[Long]] = buf
  override def bufferEncoder: Encoder[Array[Array[Long]]] =
    ExpressionEncoder[Array[Array[Long]]]()
  override def outputEncoder: Encoder[Array[Array[Long]]] =
    ExpressionEncoder[Array[Array[Long]]]()
}

/** Second-level rollup: input rows are already bitmap states. */
class BitmapMergeAggregator
    extends Aggregator[Array[Array[Long]], Array[Array[Long]],
      Array[Array[Long]]] {
  override def zero: Array[Array[Long]] = Array.empty
  override def reduce(buf: Array[Array[Long]], in: Array[Array[Long]])
      : Array[Array[Long]] = RoaringLite.merge(buf, in)
  override def merge(a: Array[Array[Long]], b: Array[Array[Long]])
      : Array[Array[Long]] = RoaringLite.merge(a, b)
  override def finish(buf: Array[Array[Long]]): Array[Array[Long]] = buf
  override def bufferEncoder: Encoder[Array[Array[Long]]] =
    ExpressionEncoder[Array[Array[Long]]]()
  override def outputEncoder: Encoder[Array[Array[Long]]] =
    ExpressionEncoder[Array[Array[Long]]]()
}

object BitmapF {
  /** exact-distinct bitmap state of a non-negative long key column */
  def bitmap(c: Column): Column =
    udaf(new BitmapAggregator, Encoders.scalaLong).apply(c)

  /** OR together already-built bitmap states */
  def bitmapMerge(c: Column): Column =
    udaf(new BitmapMergeAggregator,
      ExpressionEncoder[Array[Array[Long]]]()).apply(c)
}
