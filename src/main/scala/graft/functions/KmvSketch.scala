package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Final KMV summary: number of retained hashes (= k when saturated)
  * and the k-th smallest hash. Estimate = (kk-1) * P / hk. */
final case class KmvSummary(kk: Int, hk: Long)

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * [[Aggregator]] — the engine-grade form of the sketch: the aggregate
  * BUFFER is the k smallest distinct hash values (a sorted long array,
  * a few hundred bytes), updated map-side and min-merged across
  * partitions, so a 100 TB group contributes k longs to the shuffle
  * instead of every distinct hash. Spark plans it as an
  * ObjectHashAggregate with a partial_kmv before the exchange.
  *
  * The window-function formulation (distinct → row_number ≤ k) gives
  * identical results — KmvSpec asserts it — but shuffles the whole
  * distinct-hash table; this buffer-bounded form is why sketches exist.
  */
object KmvBuffer {
  /** insert keeping the buffer sorted, distinct and ≤ k long */
  def reduce(k: Int)(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (buf.length == k && ins == k) return buf // not among the k smallest
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  /** merge two sorted distinct arrays, keeping the k smallest */
  def merge(k: Int)(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, o) = (0, 0, 0)
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          if (j < b.length && a(i) == b(j)) j += 1 // drop duplicate
          val v = a(i); i += 1; v
        } else { val v = b(j); j += 1; v }
      out(o) = take; o += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }
}

class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], KmvSummary] {

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvBuffer.reduce(k)(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvBuffer.merge(k)(a, b)

  override def finish(buf: Array[Long]): KmvSummary =
    KmvSummary(buf.length, if (buf.isEmpty) 0L else buf.last)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[KmvSummary] =
    Encoders.product[KmvSummary]
}

/** Same sketch, but the FINAL value is the retained sorted hash array —
  * the form set-operation estimators need (theta-sketch intersection /
  * union work on the retained samples, not just the k-th value). Still
  * k longs per group on the wire; the array only reaches the driver for
  * the handful of group sketches being combined. */
class KmvArrayAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvBuffer.reduce(k)(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    KmvBuffer.merge(k)(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvF {
  /** untyped-DataFrame handle: `df.groupBy(...).agg(KmvF.kmv(64)(col))` */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k),
      Encoders.scalaLong)

  /** array-valued variant for set-operation estimators */
  def kmvArray(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvArrayAggregator(k),
      Encoders.scalaLong)
}
