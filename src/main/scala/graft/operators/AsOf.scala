package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose time
  * is <= the left row's time, per join key (reference J5 semantics,
  * xcube_server/context.py:437-438 'current'/nearest scalar lookups,
  * generalized to a full relational operator).
  *
  * Scalable implementation — NOT a per-row lookup: both sides are
  * unioned and sorted once per key (a single shuffle), then the right
  * payload is carried forward with a `last(_, ignoreNulls)` running
  * window. Wall-clock is O(n log n) in the partition, no broadcast of
  * either side, no skew beyond the key distribution itself; at 100 TB
  * this is one exchange + one sort, the same shape Spark uses for a
  * sort-merge join.
  */
object AsOf {

  /** @param left      left rows
    * @param right     right rows
    * @param key       join key column name (must exist on both sides)
    * @param leftTime  event-time column on `left` (ascending comparable)
    * @param rightTime event-time column on `right`
    * @param rightTie  tie-break column on `right`: among right rows with
    *                  equal time, the one with the greatest tie value wins
    * @return left rows + struct column `asof` (null when no right row
    *         precedes the left row) containing all right columns
    */
  /** Ordering key for a time column. TIMESTAMP must map to epoch
    * MICROseconds — a plain cast("long") floors to whole seconds, which
    * would merge sub-second events into one rank and let a right row at
    * 10:00:00.900 match a left row at 10:00:00.100. */
  private def ordCol(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      // NTZ → LTZ is a wall-clock identity under the engine's UTC
      // session contract; a direct cast("long") on NTZ is an
      // AnalysisException, so route through the timestamp cast.
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("long")
      case _ => col(c).cast("long")
    }

  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightTie: String): DataFrame = {
    val rightCols = right.columns.filter(_ != key)
    val leftType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val r = right.select(
      col(key).as("_k"), ordCol(right, rightTime).as("_t"),
      lit(0).as("_side"), col(rightTie).cast("long").as("_tie"),
      struct(rightCols.map(col).toIndexedSeq: _*).as("_payload"),
      lit(null).cast(leftType).as("_l"))
    // Build the left side with a typed-null payload struct matching r's.
    val payloadType = r.schema("_payload").dataType
    val l = left.select(
      col(key).as("_k"), ordCol(left, leftTime).as("_t"),
      lit(1).as("_side"), lit(null).cast("long").as("_tie"),
      lit(null).cast(payloadType).as("_payload"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"))
    // Right rows at time t sort before left rows at t (side 0 < 1), so the
    // join is inclusive (right.time <= left.time); right ties resolve to
    // the max tie-break value.
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("asof", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*"), col("asof"))
  }
}
