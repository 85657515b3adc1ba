package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** One retained row of a grouped top-k: rank is 1-based, best first. */
final case class TopHit(rank: Int, value_cents: Long, id: Long)

/** Grouped top-k as a BOUNDED mergeable aggregate — the per-key
  * TakeOrdered Spark doesn't ship.
  *
  * The standard formulation (`row_number() over (partition by key
  * order by v desc) <= k`) shuffles EVERY row to its key's partition
  * and sorts full partitions — at 100 TB the exchange carries the
  * whole table to produce k rows per key. This aggregate keeps the
  * top-k pairs in its buffer, so the map-side partial pass reduces
  * each partition to ≤ k pairs per key BEFORE the exchange: the
  * shuffle carries k·parts rows per key, the plan is the aggregate
  * shape (partial → exchange → final), and no sort of the input ever
  * happens. KmvSpec-style equivalence with the window form is
  * asserted in TopKSpec.
  *
  * Ordering is total and deterministic: value descending, id
  * ascending on ties. Values are exact integer "cents" (the caller
  * scales decimals), so no float comparison ambiguity exists anywhere
  * in the buffer.
  */
object TopKBuffer {
  /** is (v1,i1) strictly better than (v2,i2)? */
  def better(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
    v1 > v2 || (v1 == v2 && i1 < i2)

  /** buf is flattened [v,id] pairs, best-first; insert keeping ≤ k. */
  def reduce(k: Int)(buf: Array[Long], v: Long, id: Long): Array[Long] = {
    val n = buf.length / 2
    if (n == k && !better(v, id, buf(2 * k - 2), buf(2 * k - 1))) return buf
    var ins = 0
    while (ins < n && better(buf(2 * ins), buf(2 * ins + 1), v, id)) ins += 1
    val m = math.min(n + 1, k)
    val out = new Array[Long](2 * m)
    System.arraycopy(buf, 0, out, 0, 2 * ins)
    out(2 * ins) = v
    out(2 * ins + 1) = id
    System.arraycopy(buf, 2 * ins, out, 2 * ins + 2, 2 * (m - ins - 1))
    out
  }

  /** merge two best-first pair arrays, keeping the k best. */
  def merge(k: Int)(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val na = a.length / 2; val nb = b.length / 2
    val m = math.min(na + nb, k)
    val out = new Array[Long](2 * m)
    var (i, j, o) = (0, 0, 0)
    while (o < m) {
      val takeA = j >= nb ||
        (i < na && better(a(2 * i), a(2 * i + 1), b(2 * j), b(2 * j + 1)))
      if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
      else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
      o += 1
    }
    out
  }
}

class TopKAggregator(k: Int)
    extends org.apache.spark.sql.expressions
      .Aggregator[(Long, Long), Array[Long], Seq[TopHit]] {

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] =
    TopKBuffer.reduce(k)(buf, in._1, in._2)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    TopKBuffer.merge(k)(a, b)
  override def finish(buf: Array[Long]): Seq[TopHit] =
    (0 until buf.length / 2).map(i =>
      TopHit(i + 1, buf(2 * i), buf(2 * i + 1)))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[TopHit]] =
    ExpressionEncoder[Seq[TopHit]]()
}

object TopK {
  /** top-k aggregate column over (value_cents, id) pairs. */
  def topKBy(k: Int)(valueCents: Column, id: Column): Column =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(valueCents, id)
}
