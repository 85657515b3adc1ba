package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.HashF
import graft.pipeline.Dedup

/** Per-customer activity merged from two fact tables (events + orders)
  * inside one cogroup call. `kind` 0 = event, 1 = order. */
final case class GraftActivity(ts: Long, kind: Int, id: Long)

final case class GraftTimeline(
    uid: Long, n_events: Long, n_orders: Long,
    first_us: Long, last_us: Long, max_gap_us: Long, ev_before_first: Long)

/** Plan shapes that only matter once the data outgrows one machine:
  * runtime Bloom semi-join reduction, the typed cogroup escape hatch,
  * and an IEEE-pinned exponential smoother.
  *
  * These are deliberately *about the plan*, not just the answer — each
  * has a ScaleSpec contract pinning the physical property that makes it
  * 100 TB-viable (filter below the exchange, one exchange per side, no
  * global window).
  */
object ScaleOpsQueries {

  private val UsPerDay = 86400000000L

  // ---------------------------------------------------------------
  // join_bloom_prune — runtime-filter semi-join reduction
  // ---------------------------------------------------------------

  /** Fact⋈dim join where the dim side is *filtered but still too big to
    * broadcast* (the classic runtime-filter regime): build a bounded
    * Bloom over the dim join keys on the driver, push the probe onto
    * the fact scan BEFORE the shuffle, then let the exact join absorb
    * the Bloom's false positives. At 100 TB this is the difference
    * between shuffling every lineitem row and shuffling only the ~1/5
    * that can possibly match — the same trick Spark's own
    * `runtime.bloomFilter` optimizer plays, here made explicit and
    * bounded (128 MiB bit budget, fpp degrades gracefully; false
    * negatives are impossible so the join result is exact).
    *
    * The join itself is pinned `shuffle_hash`: the scenario assumes the
    * dim side exceeds the broadcast threshold, so the demonstration
    * must survive exactly that planning. */
  def joinBloomPrune(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    // estItems is a crude stats-level overestimate — boundedBloom only
    // uses it to tune the hash count, never the (capped) memory.
    val bloom = Dedup.boundedBloom(o, "o_orderkey", estItems = 1L << 22)
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(HashF.bloomMightContain(col("l_orderkey"), bloom))
    l.hint("shuffle_hash")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy("month")
  }

  val joinBloomPruneSql: String = s"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
      ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(DISTINCT o_orderkey) AS n_orders,
      COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY month"""

  // ---------------------------------------------------------------
  // timeline_cogroup — typed per-key merge of two fact tables
  // ---------------------------------------------------------------

  /** Merge each customer's event stream and order history into one
    * time-ordered activity timeline and reduce it imperatively —
    * `KeyValueGroupedDataset.cogroup`, the typed escape hatch for
    * per-key logic that genuinely wants both groups in hand at once.
    *
    * Scale contract: ONE exchange per input (hash on the key), no
    * window, no union shuffle; per-key state is the customer's own
    * activity (bounded, same class as sessionize). The reduction is
    * order-insensitive under timestamp ties (gaps between equal
    * timestamps are zero either way), so the sort inside the group is
    * for determinism of iteration, not of the answer.
    *
    * `ev_before_first` = events strictly before the first order
    * (-1 when the customer never ordered) — the "window shopping"
    * feature a training pipeline derives per user. */
  def timelineCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev: Dataset[(Long, GraftActivity)] = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)]
      .map { case (u, t, i) => (u, GraftActivity(t, 0, i)) }
    val ord: Dataset[(Long, GraftActivity)] = Tables.orders(s, d)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp_ltz))"),
        col("o_orderkey"))
      .as[(Long, Long, Long)]
      .map { case (u, t, i) => (u, GraftActivity(t, 1, i)) }
    ev.groupByKey(_._1).cogroup(ord.groupByKey(_._1)) { (uid, evs, ords) =>
      val all = (evs.map(_._2) ++ ords.map(_._2)).toArray
      java.util.Arrays.sort(all, Ordering.by((a: GraftActivity) =>
        (a.ts, a.kind, a.id)))
      var nEv = 0L; var nOrd = 0L
      var firstOrd = Long.MaxValue
      var maxGap = -1L
      var i = 0
      while (i < all.length) {
        val a = all(i)
        if (a.kind == 0) nEv += 1
        else { nOrd += 1; if (a.ts < firstOrd) firstOrd = a.ts }
        if (i > 0) { val g = a.ts - all(i - 1).ts; if (g > maxGap) maxGap = g }
        i += 1
      }
      if (all.length < 2) maxGap = -1L
      val evBefore =
        if (nOrd == 0) -1L
        else all.count(a => a.kind == 0 && a.ts < firstOrd).toLong
      Iterator.single(GraftTimeline(uid, nEv, nOrd,
        all.head.ts, all.last.ts, maxGap, evBefore))
    }.toDF()
      .orderBy("uid")
  }

  val timelineCogroupSql: String = s"""
    WITH acts AS (
      SELECT user_id AS uid, epoch_us(ts) AS tu, 0 AS kind
        FROM events WHERE user_id IS NOT NULL
      UNION ALL
      SELECT o_custkey, epoch_us(o_orderdate), 1 FROM orders),
    w AS (
      SELECT uid, tu, kind,
        tu - LAG(tu) OVER (PARTITION BY uid ORDER BY tu, kind) AS gap,
        MIN(CASE WHEN kind = 1 THEN tu END) OVER (PARTITION BY uid)
          AS first_ord
      FROM acts)
    SELECT uid,
      CAST(SUM(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_events,
      CAST(SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_orders,
      MIN(tu) AS first_us, MAX(tu) AS last_us,
      COALESCE(MAX(gap), -1) AS max_gap_us,
      CASE WHEN first_ord IS NULL THEN -1
           ELSE CAST(SUM(CASE WHEN kind = 0 AND tu < first_ord
                              THEN 1 ELSE 0 END) AS BIGINT)
      END AS ev_before_first
    FROM w GROUP BY uid, first_ord ORDER BY uid"""

  // ---------------------------------------------------------------
  // smooth_ewma — IEEE-pinned truncated exponential smoothing
  // ---------------------------------------------------------------

  /** Daily-revenue EWMA (α = 0.5, span truncated at 20 lags,
    * pandas-adjust normalization over the lags actually present).
    *
    * Floating-point smoothers usually can't hash-match across engines
    * because summation ORDER differs. Here every term is exact in
    * IEEE double — daily revenue is a 2-decimal value (x·100 < 2⁵³)
    * and the weights are powers of two, so each product just shifts
    * the exponent — and the sum is written as one explicit
    * left-associated 20-term chain, identical in the Spark Column tree
    * and the DuckDB SQL. Both engines therefore execute the *same*
    * IEEE operation sequence and agree bit-for-bit before the final
    * cosmetic round. The normalizer Σ½ᵏ = 2 − 2⁻ᵐ is exact the same
    * way. A window of 20 `lag`s over an already-aggregated daily
    * series is metadata-sized at any corpus scale. */
  def smoothEwma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp_ltz))" +
        s" div $UsPerDay").as("day"))
      .agg(Q.dsum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy("day")
    val lagged = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("m", least(col("rn") - 1, lit(19)))
    val num = (1 to 19).foldLeft(col("rev")) { (acc, k) =>
      acc + coalesce(lag(col("rev"), k).over(w), lit(0.0)) *
        lit(math.pow(0.5, k))
    }
    lagged
      .withColumn("norm", lit(2.0) - pow(lit(0.5), col("m")))
      .withColumn("ewma", round(num / col("norm"), 6))
      .select(col("day"), col("rev"), col("ewma"))
      .orderBy("day")
  }

  val smoothEwmaSql: String = {
    val num = (1 to 19).foldLeft("rev") { (acc, k) =>
      s"$acc + COALESCE(LAG(rev, $k) OVER (ORDER BY day), 0.0) * ${math.pow(0.5, k)}"
    }
    s"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // $UsPerDay AS day,
        ${Sql.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1),
    l AS (
      SELECT day, rev,
        LEAST(ROW_NUMBER() OVER (ORDER BY day) - 1, 19) AS m,
        ($num) AS num
      FROM daily)
    SELECT day, rev, ROUND(num / (2.0 - POWER(0.5, m)), 6) AS ewma
    FROM l ORDER BY day"""
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("join_bloom_prune", joinBloomPrune, Some(joinBloomPruneSql)),
    QuerySpec("timeline_cogroup", timelineCogroup, Some(timelineCogroupSql)),
    QuerySpec("smooth_ewma", smoothEwma, Some(smoothEwmaSql)))
}
