package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spark-side exact-arithmetic aggregate helpers, mirrored 1:1 by
  * graft.queries.Sql for the DuckDB oracles.
  *
  * Double summation is order-dependent; Spark's partial aggregation order
  * varies run-to-run, so raw `sum(double)` can never hash-match an oracle.
  * Casting each value to DECIMAL(38,6) makes the sum exact and
  * order-independent in both engines; the final round+cast returns a plain
  * double column for schema parity.
  */
object Q {
  val Dec: DecimalType = DecimalType(38, 6)

  /** Exact decimal sum rounded to `scale`, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(Dec)), scale).cast("double")

  /** Exact decimal sum / count, divided in IEEE double, rounded. */
  def davg(c: Column, scale: Int = 6): Column =
    round(sum(c.cast(Dec)).cast("double") / count(c), scale)

  /** Windowed variant of dsum. */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec,
               scale: Int = 2): Column =
    round(sum(c.cast(Dec)).over(w), scale).cast("double")

  /** ISO-8601 UTC second-resolution formatting (reference F1 semantics,
    * xcube_server/utils.py:86-97). */
  def iso(c: Column): Column = date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
}
