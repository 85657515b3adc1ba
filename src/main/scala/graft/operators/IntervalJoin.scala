package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval join.
  *
  * Spark has no native range-join operator: `p JOIN iv ON pt >= s AND
  * pt < e` plans as BroadcastNestedLoopJoin (every point × every
  * interval) the moment the interval side outgrows a broadcast — the
  * classic silent quadratic. The standard fix is BUCKET EXPANSION:
  * pick a bucket width, map each point to its bucket, explode each
  * interval to the buckets it overlaps, equi-join on the bucket key
  * (hash-partitioned, linear), and re-check the exact predicate.
  * Each point lives in exactly one bucket, so no post-join dedup is
  * needed. Cost: |points| + Σ interval_span/bucket join rows — choose
  * `bucket` near the typical interval length so intervals expand to
  * O(1) buckets each.
  */
object IntervalJoin {

  /** Join `points` (integer point column `ptCol`) to `intervals`
    * (half-open [startCol, endCol)) on containment. Columns from both
    * sides survive; the internal bucket key is dropped. */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive: $bucket")
    val p = points.withColumn("__bucket", expr(s"$ptCol div ${bucket}L"))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      expr(s"$startCol div ${bucket}L"),
      expr(s"($endCol - 1) div ${bucket}L"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join (half-open [s, e) on both sides),
    * same bucket expansion — with the standard dedup-free trick: a
    * pair of intervals can share many buckets, so the match is emitted
    * only in the FIRST bucket of their overlap (`bucket ==
    * max(s_a, s_b) div width`), exactly one bucket per true pair — no
    * post-join distinct over the (potentially huge) pair set. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
                      b: DataFrame, bStart: String, bEnd: String,
                      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive: $bucket")
    def expand(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket", explode(sequence(
        expr(s"$s div ${bucket}L"), expr(s"($e - 1) div ${bucket}L"))))
    expand(a, aStart, aEnd).join(expand(b, bStart, bEnd), Seq("__bucket"))
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bucket") ===
        expr(s"greatest($aStart, $bStart) div ${bucket}L"))
      .drop("__bucket")
  }
}
