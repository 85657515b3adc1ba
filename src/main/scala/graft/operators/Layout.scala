package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Morton

/** Write-side data layout passes.
  *
  * The analytic twin ([[graft.queries.AnalyticsQueries.zorderLayout]] /
  * `zorder_prune_eval`) measures what multi-dimensional clustering
  * buys; THIS is the pass that buys it: re-order rows by a Morton key
  * before writing, so parquet's per-file (and per-row-group) min/max
  * column statistics become compact rectangles in BOTH dimensions and
  * readers prune files for predicates on either column. At 100 TB this
  * is a one-off `repartitionByRange` shuffle at ingest (range
  * partitioning keeps file sizes balanced — hash partitioning on zkey
  * would scatter the curve), amortized over every later scan.
  */
object Layout {

  /** Z-order `df` by two numeric columns: bin each to `bits` via its
    * GLOBAL max (one tiny aggregate, broadcast), interleave with the
    * codegen Morton cascade, range-partition into `numFiles` and sort
    * within each partition. Row content is unchanged — only order and
    * file assignment move. */
  def zorder(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
             numFiles: Int): DataFrame = {
    val n = 1L << bits
    val mx = df.agg(max(xCol).cast("long").as("__mx"),
      max(yCol).cast("long").as("__my"))
    df.crossJoin(broadcast(mx))
      .withColumn("__zkey", Morton.interleave(
        floor(xCol.cast("double") * n / (col("__mx") + 1)),
        floor(yCol.cast("double") * n / (col("__my") + 1)), bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey", "__mx", "__my")
  }
}
