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

  // ---------------------------------------------------------------
  // smooth_rolling_median — robust trailing smoother (EWMA companion)
  // ---------------------------------------------------------------

  /** Exact 7-day trailing median of daily revenue — the robust
    * smoother that shrugs off the spike days that drag an EWMA. The
    * window runs over the DAILY aggregate (one row per calendar day,
    * metadata-sized at any corpus scale — same sanctioned class as
    * smooth_ewma); the median interpolates between two exact 2-dp
    * values, the identical IEEE a+(b−a)·f in both engines. */
  def smoothRollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp_ltz))" +
        s" div $UsPerDay").as("day"))
      .agg(Q.dsum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("med7",
        round(expr("percentile(rev, 0.5)")
          .over(w), 4))
      .select(col("day"), col("rev"), col("med7"))
      .orderBy("day")
  }

  val smoothRollingMedianSql: String = s"""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // $UsPerDay AS day,
        ${Sql.dsum("o_totalprice")} AS rev
      FROM orders GROUP BY 1)
    SELECT day, rev,
      ROUND(quantile_cont(rev, 0.5) OVER (ORDER BY day
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM daily ORDER BY day"""

  // ---------------------------------------------------------------
  // skyline_pareto — multi-objective Pareto front without a cartesian
  // ---------------------------------------------------------------

  /** 2-D skyline (Pareto front) over documents: the docs not dominated
    * in (token count, quality) — the multi-objective "keep the best
    * trade-offs" selection step. `q` dominates `p` iff q ≥ p on both
    * axes and > on at least one.
    *
    * The naive skyline is an all-pairs NOT EXISTS — quadratic, dead at
    * scale. The 2-D structure collapses it to: p is skyline iff
    * (a) p.y equals the max y at p.x, and (b) p.y strictly exceeds the
    * max y over all x' > p.x. So: one groupBy(x) aggregate (bounded by
    * the VALUE DOMAIN of x — token counts, a few thousand distinct —
    * not by corpus size), one cumulative max over that tiny table
    * (sanctioned global window above an aggregate), and one broadcast
    * join back. Corpus rows are touched exactly twice, shuffled once
    * (the groupBy), never paired. */
  def skylinePareto(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    // axes in genuine tension: length vs type-token ratio (lexical
    // diversity falls with length, so the front is a real curve)
    val pts = Tables.documents(s, d).select(
      col("doc_id"),
      nTok.cast("long").as("x"),
      round(size(array_distinct(toks)).cast("double") / nTok, 6).as("y"))
    val dx = pts.groupBy("x").agg(max(col("y")).as("ymax"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = dx
      .withColumn("cmax", max(col("ymax")).over(w))
      .filter(col("cmax").isNull || col("ymax") > col("cmax"))
      .select(col("x").as("fx"), col("ymax"))
    pts.join(broadcast(front),
        col("x") === col("fx") && col("y") === col("ymax"))
      .select(col("doc_id"), col("x").as("n_tok"), col("y").as("q"))
      .orderBy("n_tok", "doc_id")
  }

  val skylineParetoSql: String = s"""
    WITH pts AS (SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        ROUND(CAST(len(list_distinct(string_split(text, ' ')))
            AS DOUBLE)
          / len(string_split(text, ' ')), 6) AS y
      FROM documents),
    dx AS (SELECT x, MAX(y) AS ymax FROM pts GROUP BY x),
    f AS (SELECT x, ymax,
        MAX(ymax) OVER (ORDER BY x DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cmax
      FROM dx)
    SELECT p.doc_id, p.x AS n_tok, p.y AS q
    FROM pts p JOIN f ON p.x = f.x AND p.y = f.ymax
    WHERE f.cmax IS NULL OR f.ymax > f.cmax
    ORDER BY n_tok, doc_id"""

  // ---------------------------------------------------------------
  // grouped_topk — per-key TakeOrdered as a bounded aggregate
  // ---------------------------------------------------------------

  /** Top-3 orders per priority class WITHOUT the window-rank shape:
    * [[graft.functions.TopKAggregator]] keeps a bounded best-first
    * buffer, so the map-side partial pass reduces every partition to
    * ≤ 3 pairs per key before the exchange — the shuffle carries
    * k·partitions rows per key instead of the whole orders table, and
    * no full-partition sort exists anywhere in the plan. TopKSpec
    * pins equivalence with the window form; ScaleSpec pins the
    * partial-aggregate plan shape. Prices ride the aggregate as exact
    * integer cents (total deterministic order, ties to the lowest
    * order key). */
  def groupedTopk(s: SparkSession, d: String): DataFrame = {
    val cents = expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopK.topKBy(3)(cents, col("o_orderkey"))
        .as("hits"))
      .select(col("o_orderpriority"), explode(col("hits")).as("h"))
      .select(col("o_orderpriority"), col("h.rank").as("rnk"),
        col("h.id").as("o_orderkey"),
        (col("h.value_cents") / lit(100.0)).as("o_totalprice"))
      .orderBy("o_orderpriority", "rnk")
  }

  val groupedTopkSql: String = """
    WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
          ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
            o_orderkey) AS rnk
      FROM orders)
    SELECT o_orderpriority, CAST(rnk AS INTEGER) AS rnk, o_orderkey,
      o_totalprice
    FROM r WHERE rnk <= 3 ORDER BY o_orderpriority, rnk"""

  // ---------------------------------------------------------------
  // agg_sample_ci — approximate query processing with error bounds
  // ---------------------------------------------------------------

  /** Sampled aggregation with a confidence interval, checked against
    * the exact answer — the AQP bargain a 100 TB deployment actually
    * uses (scan 10%, answer with ±bounds, scan it all only when the
    * bound isn't tight enough). The sample predicate is a
    * deterministic row-hash mod (so both engines pick the SAME 10%),
    * and the CI is the classic mean ± 1.96·s/√n with s² from exact
    * DECIMAL first/second moments — every double op after the decimal
    * sums is the identical IEEE expression cross-engine, so even the
    * interval endpoints hash-match. `covered` records whether the
    * exact mean fell inside — the eval a pipeline monitors. */
  def aggSampleCi(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val sampled = li
      .filter((col("l_orderkey") * 7 + col("l_linenumber")) % 10 === 3)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_s"),
        sum(col("l_extendedprice").cast("decimal(38,6)")).as("s1"),
        sum((col("l_extendedprice") * col("l_extendedprice"))
          .cast("decimal(38,6)")).as("s2"))
      .select(col("l_returnflag"), col("n_s"),
        (col("s1").cast("double") / col("n_s")).as("m"),
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_s")) / (col("n_s") - 1)).as("sd"))
    val exact = li.groupBy(col("l_returnflag").as("ef"))
      .agg(Q.davg(col("l_extendedprice")).as("exact_mean"))
    sampled.join(broadcast(exact), col("l_returnflag") === col("ef"))
      .select(col("l_returnflag"), col("n_s").as("n_sample"),
        round(col("m"), 4).as("est_mean"),
        round(col("m") - lit(1.96) * col("sd") / sqrt(col("n_s")), 4)
          .as("ci_low"),
        round(col("m") + lit(1.96) * col("sd") / sqrt(col("n_s")), 4)
          .as("ci_high"),
        col("exact_mean"),
        (col("exact_mean") >=
            col("m") - lit(1.96) * col("sd") / sqrt(col("n_s")) &&
          col("exact_mean") <=
            col("m") + lit(1.96) * col("sd") / sqrt(col("n_s")))
          .as("covered"))
      .orderBy("l_returnflag")
  }

  val aggSampleCiSql: String = s"""
    WITH sa AS (SELECT l_returnflag, COUNT(*) AS n_s,
        SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS s1,
        SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6)))
          AS s2
      FROM lineitem
      WHERE (l_orderkey * 7 + l_linenumber) % 10 = 3
      GROUP BY l_returnflag),
    sm AS (SELECT l_returnflag, n_s,
        CAST(s1 AS DOUBLE) / n_s AS m,
        SQRT((CAST(s2 AS DOUBLE) -
          CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_s) / (n_s - 1))
          AS sd
      FROM sa),
    ex AS (SELECT l_returnflag AS ef,
        ${Sql.davg("l_extendedprice")} AS exact_mean
      FROM lineitem GROUP BY 1)
    SELECT l_returnflag, n_s AS n_sample,
      ROUND(m, 4) AS est_mean,
      ROUND(m - 1.96 * sd / SQRT(n_s), 4) AS ci_low,
      ROUND(m + 1.96 * sd / SQRT(n_s), 4) AS ci_high,
      exact_mean,
      (exact_mean >= m - 1.96 * sd / SQRT(n_s) AND
       exact_mean <= m + 1.96 * sd / SQRT(n_s)) AS covered
    FROM sm JOIN ex ON l_returnflag = ef
    ORDER BY l_returnflag"""

  // ---------------------------------------------------------------
  // agg_cube — the CUBE lattice (completes rollup/grouping-sets)
  // ---------------------------------------------------------------

  /** Full CUBE over (priority, status): all four grouping-set levels
    * in one pass — Spark expands the lattice map-side, so the scan is
    * still read once. Null grouping keys are labeled 'ALL' in BOTH
    * engines so the ORDER BY is engine-independent (Spark sorts nulls
    * first, DuckDB last). */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Q.dsum(col("o_totalprice")).as("revenue"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n_orders"), col("revenue"))
      .orderBy("prio", "status")

  val aggCubeSql: String = s"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
      COALESCE(o_orderstatus, 'ALL') AS status,
      COUNT(*) AS n_orders,
      ${Sql.dsum("o_totalprice")} AS revenue
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    ORDER BY prio, status"""

  // ---------------------------------------------------------------
  // text_blocklist — Aho-Corasick multi-pattern scan kernel
  // ---------------------------------------------------------------

  /** Blocklist terms, chosen to exercise the automaton's hard cases:
    * prefixes of each other (spa/spark, tab/table), a suffix overlap
    * (ark⊂spark), and multi-word phrases that span token boundaries. */
  val Blocklist: Seq[String] = Seq(
    "spark", "spa", "ark", "table", "tab", "scan slow", "slow fast",
    "fast table", "window table", "agg", "customer query", "value")

  /** Keyword/blocklist scan: distinct blocklist terms per document via
    * the [[graft.functions.AhoCorasick]] codegen kernel — ONE byte-walk
    * per document regardless of pattern count, vs the O(patterns×text)
    * per-row `contains` chain the oracle spells out. The aggregate is
    * the moderation report a filtering pipeline emits per source. */
  def textBlocklist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        graft.functions.AhoCorasickF
          .blocklistHits(col("text"), Blocklist).as("hits"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("hits").cast("long")).as("total_hits"),
        max(col("hits")).as("max_hits"))
      .orderBy("source")

  val textBlocklistSql: String = {
    val lst = Blocklist.map(p => s"'$p'").mkString(", ")
    s"""
    WITH h AS (SELECT source,
        len([p FOR p IN [$lst] IF contains(text, p)]) AS hits
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_flagged,
      CAST(SUM(hits) AS BIGINT) AS total_hits,
      CAST(MAX(hits) AS INTEGER) AS max_hits
    FROM h GROUP BY source ORDER BY source"""
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("join_bloom_prune", joinBloomPrune, Some(joinBloomPruneSql)),
    QuerySpec("timeline_cogroup", timelineCogroup, Some(timelineCogroupSql)),
    QuerySpec("smooth_ewma", smoothEwma, Some(smoothEwmaSql)),
    QuerySpec("skyline_pareto", skylinePareto, Some(skylineParetoSql)),
    QuerySpec("grouped_topk", groupedTopk, Some(groupedTopkSql)),
    QuerySpec("agg_sample_ci", aggSampleCi, Some(aggSampleCiSql)),
    QuerySpec("agg_cube", aggCube, Some(aggCubeSql)),
    QuerySpec("text_blocklist", textBlocklist, Some(textBlocklistSql)),
    QuerySpec("smooth_rolling_median", smoothRollingMedian,
      Some(smoothRollingMedianSql)))
}
