package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed Spark [[Aggregator]]
  * (Flajolet et al. 2007, the cardinality sketch every warehouse ships
  * as `approx_count_distinct`). The aggregate buffer is the fixed
  * 256-register array — 1 KiB per group REGARDLESS of cardinality,
  * built map-side and max-merged across partitions, so a 100 TB group
  * contributes one register array to the shuffle instead of its
  * distinct-key set. Spark plans it as ObjectHashAggregate with a
  * partial before the exchange (same engine shape as the CMS/KMV
  * sketches here).
  *
  * Register geometry is pinned to the [[HashKernels.PW]] hash so the
  * DuckDB oracle can rebuild the registers BIT-FOR-BIT (the
  * correctness gate checks register state, not an approximate count):
  * h ∈ [0, PW) with PW the largest prime < 2^58; bucket = h mod 256;
  * w = h div 256 < 2^50 (so W = 50); rho(w) = 51 − bitlength(w), with
  * rho(0) = 51. Unlike production HLLs there is no per-run seed —
  * determinism is the contract, and the house polynomial hash is the
  * only hash both engines implement identically.
  *
  * Merge is elementwise max — associative, commutative, idempotent —
  * which also makes per-type sketches composable into a union sketch
  * without touching the raw data (demonstrated by the `__all__` row of
  * the `sketch_hll_distinct` query).
  */
object HllSketch {
  val M = 256          // registers
  val W = 50           // bit width of w = h / M under the PW modulus
  /** alpha_m bias constant for m = 256 (HLL paper §4; the SQL oracle
    * embeds the identical `0.7213/(1+1.079/256.0)` expression so both
    * engines evaluate the same IEEE double). */
  val Alpha256: Double = 0.7213 / (1 + 1.079 / 256.0)

  def rho(w: Long): Int =
    if (w == 0L) W + 1 else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))

  def update(regs: Array[Int], h: Long): Array[Int] = {
    val b = if (regs.length == 0) new Array[Int](M) else regs
    val bucket = (h % M).toInt
    val r = rho(h / M)
    if (r > b(bucket)) b(bucket) = r
    b
  }

  def maxMerge(a: Array[Int], b: Array[Int]): Array[Int] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
}

/** Input: a [[HashKernels.PW]]-domain hash (use `HashF.polyHashWide`).
  * Output: the 256 registers. */
class HllAggregator extends Aggregator[Long, Array[Int], Array[Int]] {
  override def zero: Array[Int] = Array.emptyIntArray
  override def reduce(buf: Array[Int], h: Long): Array[Int] =
    HllSketch.update(buf, h)
  override def merge(a: Array[Int], b: Array[Int]): Array[Int] =
    HllSketch.maxMerge(a, b)
  override def finish(buf: Array[Int]): Array[Int] =
    if (buf.length == 0) new Array[Int](HllSketch.M) else buf
  override def bufferEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()
}

/** Codegen'd HLL rho of a PW-domain hash: rho(h/256) per
  * [[HllSketch.rho]] — one numberOfLeadingZeros instruction, replacing
  * the `51 - length(bin(w))` string formulation (per-row allocation)
  * in streaming register maintenance. */
case class HllRho(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, IntegerType}

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hll_rho"

  override def nullSafeEval(v: Any): Any =
    HllSketch.rho(v.asInstanceOf[Long] / HllSketch.M)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HllSketch.rho($c / ${HllSketch.M}L)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object HllF {
  /** untyped-DataFrame handle: `df.groupBy(...).agg(HllF.hll(col))` */
  def hll: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllAggregator, Encoders.scalaLong)

  /** codegen rho(h/256) of a PW-domain hash column */
  def hllRho(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(HllRho(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
