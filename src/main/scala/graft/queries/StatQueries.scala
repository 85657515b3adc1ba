package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.pipeline.Caching

/** Third-tier statistics coverage: the classical inference/diagnostic
  * toolkit a data platform runs over its event and revenue facts —
  * autocorrelation, OLS trend, two-proportion A/B z-test, Gini
  * concentration, PMI collocations, survival curves — plus two more
  * TPC-H-shaped relational plans (Q10/Q14).
  *
  * Cross-engine determinism strategy (same contract as [[Relational]]):
  * every statistic here is an algebraic function of EXACT integer or
  * DECIMAL(38,x) sufficient statistics (counts, Σx, Σx², Σxy), and the
  * final ratio is evaluated in IEEE double from ONE formula string that
  * is textually shared between the Spark plan (`expr(F)`) and the
  * DuckDB oracle SQL — identical parse → identical operation order →
  * identical bits, so `ROUND(..., 6)` matches byte-for-byte. Raw-double
  * accumulation (order-dependent) never happens: doubles only appear
  * AFTER aggregation, on scalar combine.
  *
  * Scale shape: every operator is sufficient-statistics-first — the
  * corpus-scale scan reduces map-side to a bounded aggregate (days,
  * event types, nations, weeks), and all cross-statistic combines
  * happen on those bounded tables via broadcast. Nothing here ships
  * rows to the driver or funnels the fact table through one task.
  */
object StatQueries {

  private val UsPerDay = 86400000000L

  // -------------------------------------------------- autocorrelation
  /** Sample autocorrelation of the daily event-count series at lags
    * 1..7 — the seasonality diagnostic behind "is traffic weekly?".
    *
    * r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², expanded to integer
    * sufficient statistics so no floating mean ever enters a sum:
    * with N days, S=Σx, SS=Σx², and per-lag overlap sums m, P=Σx_t·x_{t+k},
    * A=Σx_t, B=Σx_{t+k}:  r_k = (N²P − NS(A+B) + mS²) / (N²SS − NS²).
    * Products go through DECIMAL(19,0) casts so Σx·x stays exact at any
    * daily volume (3·10⁸ events/day squared overflows BIGINT).
    *
    * Scale: one scan → per-day aggregate (bounded by the calendar, a
    * few thousand rows at any corpus size); the lag expansion is a
    * 7-row broadcast, the self-join runs on the tiny aggregate, and the
    * global (N,S,SS) row is a broadcast scalar. */
  def eventsAcf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .select(expr(s"ts_us div $UsPerDay").as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
      .persist()
    val g = daily.agg(
      count(lit(1)).as("n_days"),
      sum(col("x")).as("s_tot"),
      sum(expr("CAST(x AS DECIMAL(19,0)) * x")).as("ss_tot"))
    val lags = Seq.range(1, 8).toDF("lag")
    val d1 = daily.toDF("day", "x1")
    val d2 = daily.toDF("day2", "x2")
    val pairs = d1.crossJoin(broadcast(lags))
      .join(d2, col("day") + col("lag") === col("day2"))
      .groupBy("lag")
      .agg(count(lit(1)).as("m"),
        sum(expr("CAST(x1 AS DECIMAL(19,0)) * x2")).as("p_sum"),
        sum(col("x1")).as("a_sum"),
        sum(col("x2")).as("b_sum"))
    val res = pairs.crossJoin(broadcast(g))
      .withColumn("acf", expr(AcfF))
      .select(col("lag"), col("m").as("n_pairs"), col("acf"))
      .orderBy("lag")
    Caching.materializeAndRelease(res, daily)
  }

  /** Shared Spark/DuckDB formula — see object doc. */
  private val AcfF: String =
    "ROUND((CAST(n_days AS DOUBLE)*n_days*CAST(p_sum AS DOUBLE)" +
      " - CAST(n_days AS DOUBLE)*s_tot*(CAST(a_sum AS DOUBLE)+b_sum)" +
      " + CAST(m AS DOUBLE)*s_tot*s_tot)" +
      " / (CAST(n_days AS DOUBLE)*n_days*CAST(ss_tot AS DOUBLE)" +
      " - CAST(n_days AS DOUBLE)*s_tot*s_tot), 6)"

  val eventsAcfSql: String = s"""
    WITH daily AS (SELECT epoch_us(ts) // $UsPerDay AS day, COUNT(*) AS x
      FROM events GROUP BY 1),
    g AS (SELECT COUNT(*) AS n_days, SUM(x) AS s_tot,
        SUM(CAST(x AS DECIMAL(19,0)) * x) AS ss_tot FROM daily),
    pairs AS (SELECT l.lag AS lag, COUNT(*) AS m,
        SUM(CAST(d1.x AS DECIMAL(19,0)) * d2.x) AS p_sum,
        SUM(d1.x) AS a_sum, SUM(d2.x) AS b_sum
      FROM daily d1, UNNEST(range(1, 8)) AS l(lag), daily d2
      WHERE d1.day + l.lag = d2.day
      GROUP BY 1)
    SELECT lag, m AS n_pairs, $AcfF AS acf
    FROM pairs, g
    ORDER BY lag"""

  // ------------------------------------------------------- OLS trend
  /** Per-event-type least-squares trend of daily counts over time —
    * "is this event growing, and how fast?". Closed-form OLS from
    * integer sufficient statistics (n, Σd, Σy, Σd², Σdy): the slope is
    * shift-invariant so raw epoch-day works directly, and the intercept
    * is reported at the group's own first day (x = day − min_day).
    * slope_raw stays unrounded for the intercept computation, exactly
    * as in the oracle, then both round to 6.
    *
    * Scale: one scan → (type, day) aggregate → per-type sums. Both
    * aggregations hash-partition on the same leading key; nothing
    * global. */
  def trendOls(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr(s"ts_us div $UsPerDay").as("day"))
      .agg(count(lit(1)).as("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        min(col("day")).as("d0"),
        sum(col("day")).as("sd"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(day AS DECIMAL(19,0)) * day")).as("sdd"),
        sum(expr("CAST(day AS DECIMAL(19,0)) * y")).as("sdy"))
      .withColumn("slope_raw", expr(SlopeF))
      .select(col("event_type"), col("n_days"),
        expr("ROUND(slope_raw, 6)").as("slope"),
        expr(InterceptF).as("intercept"))
      .orderBy("event_type")
  }

  private val SlopeF: String =
    "(CAST(n_days AS DOUBLE)*CAST(sdy AS DOUBLE)" +
      " - CAST(sd AS DOUBLE)*sy)" +
      " / (CAST(n_days AS DOUBLE)*CAST(sdd AS DOUBLE)" +
      " - CAST(sd AS DOUBLE)*sd)"
  private val InterceptF: String =
    "ROUND((CAST(sy AS DOUBLE) - slope_raw*(CAST(sd AS DOUBLE)" +
      " - CAST(n_days AS DOUBLE)*d0)) / n_days, 6)"

  val trendOlsSql: String = s"""
    WITH daily AS (SELECT event_type, epoch_us(ts) // $UsPerDay AS day,
        COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    g AS (SELECT event_type, COUNT(*) AS n_days, MIN(day) AS d0,
        SUM(day) AS sd, SUM(y) AS sy,
        SUM(CAST(day AS DECIMAL(19,0)) * day) AS sdd,
        SUM(CAST(day AS DECIMAL(19,0)) * y) AS sdy
      FROM daily GROUP BY 1),
    sl AS (SELECT *, $SlopeF AS slope_raw FROM g)
    SELECT event_type, n_days, ROUND(slope_raw, 6) AS slope,
      $InterceptF AS intercept
    FROM sl
    ORDER BY event_type"""

  // --------------------------------------------- A/B two-proportion z
  /** Two-proportion z-test on conversion: users hash-split into
    * variants A/B (user_id % 2 — the deterministic assignment an
    * experimentation platform derives from a stable id), conversion =
    * at least one high-value purchase (value > 150 — an unconditional
    * "any purchase" saturates to p̂ = 1 at this event density and the
    * pooled variance degenerates). z = (p̂_A−p̂_B)/√(p̂(1−p̂)(1/n_A+1/n_B))
    * with the pooled p̂ — computed in double from the four exact integer
    * counts via one shared formula string.
    *
    * Scale: scan → per-user flag (map-side combinable max), → 2-row
    * variant aggregate → single-row combine. */
  def abTestZ(s: SparkSession, d: String): DataFrame = {
    val conv = Tables.events(s, d)
      .groupBy(expr("user_id % 2").as("variant"), col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 150, 1).otherwise(0))
        .as("conv"))
    conv.groupBy(col("variant")).agg(count(lit(1)).as("n"),
        sum(col("conv")).as("c"))
      .agg(sum(when(col("variant") === 0, col("n"))).as("n_a"),
        sum(when(col("variant") === 0, col("c"))).as("c_a"),
        sum(when(col("variant") === 1, col("n"))).as("n_b"),
        sum(when(col("variant") === 1, col("c"))).as("c_b"))
      .withColumn("z", expr(ZF))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("ROUND(CAST(c_a AS DOUBLE)/n_a, 6)").as("p_a"),
        expr("ROUND(CAST(c_b AS DOUBLE)/n_b, 6)").as("p_b"),
        col("z"),
        expr("ABS(z) > CAST(1.96 AS DOUBLE)").as("significant"))
  }

  private val ZF: String =
    "ROUND((CAST(c_a AS DOUBLE)/n_a - CAST(c_b AS DOUBLE)/n_b)" +
      " / SQRT((CAST(c_a+c_b AS DOUBLE)/(n_a+n_b))" +
      " * (CAST(1 AS DOUBLE) - CAST(c_a+c_b AS DOUBLE)/(n_a+n_b))" +
      " * (CAST(1 AS DOUBLE)/n_a + CAST(1 AS DOUBLE)/n_b)), 6)"

  val abTestZSql: String = s"""
    WITH u AS (SELECT user_id % 2 AS variant, user_id,
        MAX(CASE WHEN event_type = 'purchase' AND value > 150
          THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2),
    v AS (SELECT variant, COUNT(*) AS n, SUM(conv) AS c
      FROM u GROUP BY 1),
    w AS (SELECT
        CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c_a,
        CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c_b
      FROM v),
    z AS (SELECT *, $ZF AS z FROM w)
    SELECT n_a, c_a, n_b, c_b,
      ROUND(CAST(c_a AS DOUBLE)/n_a, 6) AS p_a,
      ROUND(CAST(c_b AS DOUBLE)/n_b, 6) AS p_b,
      z, ABS(z) > CAST(1.96 AS DOUBLE) AS significant
    FROM z"""

  // --------------------------------------- chi-square independence test
  /** Pearson χ² independence test on the lang × source contingency
    * table — "is language distribution independent of corpus source?",
    * the categorical-drift screen run before mixing sources. The
    * corpus reduces map-side to the |langs|·|sources| cell table;
    * row/column margins and the grand total broadcast back onto it;
    * each cell's (O−E)²/E term is the shared formula string rounded
    * at 6dp, and the χ² total is an exact-decimal sum of those rounded
    * terms — order-independent, so cross-engine byte-equal. */
  def chi2Independence(s: SparkSession, d: String): DataFrame = {
    // the corpus scan happens ONCE: the cell table is persisted and
    // the margins/total derive from it, not from re-scans
    val cells = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
      .persist()
    val rowT = cells.groupBy("lang").agg(sum(col("o")).as("rl"))
    val colT = cells.groupBy("source").agg(sum(col("o")).as("cs"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val res = cells
      .join(broadcast(rowT), "lang")
      .join(broadcast(colT), "source")
      .crossJoin(broadcast(tot))
      .withColumn("term", expr(Chi2TermF))
      .agg(min(col("n")).as("n_docs"),
        min(col("n_langs")).as("n_langs"),
        min(col("n_sources")).as("n_sources"),
        min((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
        Q.dsum(col("term"), 6).as("chi2"))
    Caching.materializeAndRelease(res, cells)
  }

  private val Chi2TermF: String =
    "ROUND(POWER(o - CAST(rl AS DOUBLE) * cs / n, 2)" +
      " / (CAST(rl AS DOUBLE) * cs / n), 6)"

  val chi2IndependenceSql: String = s"""
    WITH cells AS (SELECT lang, source, COUNT(*) AS o
      FROM documents GROUP BY 1, 2),
    rt AS (SELECT lang, SUM(o) AS rl FROM cells GROUP BY 1),
    ct AS (SELECT source, SUM(o) AS cs FROM cells GROUP BY 1),
    tt AS (SELECT SUM(o) AS n, COUNT(DISTINCT lang) AS n_langs,
        COUNT(DISTINCT source) AS n_sources FROM cells),
    j AS (SELECT cells.o, rt.rl, ct.cs, tt.n, tt.n_langs, tt.n_sources
      FROM cells JOIN rt USING (lang) JOIN ct USING (source)
        CROSS JOIN tt)
    SELECT CAST(MIN(n) AS BIGINT) AS n_docs,
      CAST(MIN(n_langs) AS BIGINT) AS n_langs,
      CAST(MIN(n_sources) AS BIGINT) AS n_sources,
      CAST(MIN((n_langs - 1) * (n_sources - 1)) AS BIGINT) AS dof,
      ${Sql.dsum(Chi2TermF, 6)} AS chi2
    FROM j"""

  // --------------------------------------------- Gini / concentration
  /** Per-nation Gini coefficient of customer revenue — the
    * concentration audit ("do 1% of customers carry the book?").
    * G = (2·Σᵢ i·rᵢ − (n+1)·Σr) / (n·Σr) with rᵢ ascending; the rank
    * products stay in exact DECIMAL, only the final ratio is double.
    *
    * Scale: revenue is a decimal sum per customer (one shuffle on
    * custkey), ranks come from a window PARTITIONED BY NATION (never
    * global — a nation's customers sort within their own partition),
    * and the nation dim is an explicit broadcast. */
  def revenueGini(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(col("o_totalprice").cast(Q.Dec)).as("rev"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("rev"), col("c_custkey"))
    rev.withColumn("i", row_number().over(w))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        sum(expr("CAST(i AS DECIMAL(19,0)) * rev")).as("sir"),
        sum(col("rev")).as("sr"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_cust"), expr(GiniF).as("gini"))
      .orderBy("n_name")
  }

  private val GiniF: String =
    "ROUND((CAST(2 AS DOUBLE)*CAST(sir AS DOUBLE)" +
      " - (CAST(n_cust AS DOUBLE)+1)*CAST(sr AS DOUBLE))" +
      " / (CAST(n_cust AS DOUBLE)*CAST(sr AS DOUBLE)), 6)"

  val revenueGiniSql: String = s"""
    WITH rev AS (SELECT c_custkey, c_nationkey,
        SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY 1, 2),
    rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
        ORDER BY rev, c_custkey) AS i
      FROM rev),
    g AS (SELECT c_nationkey, COUNT(*) AS n_cust,
        SUM(CAST(i AS DECIMAL(19,0)) * rev) AS sir, SUM(rev) AS sr
      FROM rk GROUP BY 1)
    SELECT n_name, n_cust, $GiniF AS gini
    FROM g JOIN nation ON c_nationkey = n_nationkey
    ORDER BY n_name"""

  // ------------------------------------------------ PMI collocations
  /** Pointwise mutual information of adjacent word pairs — the classic
    * collocation extractor ("New York", "machine learning") a corpus
    * profiler runs before vocabulary decisions. PMI = ln(P(xy) /
    * (P(x)P(y))) with P(xy) = c_xy/T_bi, P(x) = c_x/T_uni, evaluated
    * from exact integer counts as ln(c_xy·T_uni² / (T_bi·c_x·c_y)).
    * Frequency floor c_xy ≥ 5 (the standard PMI noise gate — rare
    * pairs otherwise dominate with spuriously high scores).
    *
    * Scale: token/bigram extraction happens in the scan stage (arrays
    * never reach an exchange); the count tables shuffle only short
    * token strings; the unigram joins onto the bigram table are
    * big×big hash joins on the token key — a corpus-scale count table
    * is not broadcastable, same contract as the LM scorers. Totals are
    * one broadcast scalar row. */
  def pmiCollocations(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val toks = base.select(explode(col("w")).as("tok"))
    val bi = base.select(explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> struct(element_at(w, i) AS w1," +
          " element_at(w, i + 1) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cu = toks.groupBy("tok").agg(count(lit(1)).as("c")).persist()
    val tot = cu.agg(sum(col("c")).as("t_uni"))
    // total bigrams comes off the aggregated pair-count table, so the
    // corpus-scale bigram stream is consumed exactly once
    val cbAll = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .persist()
    val tbi = cbAll.agg(sum(col("c_xy")).as("t_bi"))
    val cb = cbAll.filter(col("c_xy") >= 5)
    val res = cb
      .join(cu.select(col("tok").as("w1"), col("c").as("c_x")), "w1")
      .join(cu.select(col("tok").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(tbi))
      .withColumn("pmi", expr(PmiF))
      .select(col("w1"), col("w2"), col("c_xy"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(40)
    Caching.materializeAndRelease(res, cu, cbAll)
  }

  private val PmiF: String =
    "ROUND(LN(CAST(c_xy AS DOUBLE)*t_uni*t_uni" +
      " / (CAST(t_bi AS DOUBLE)*c_x*c_y)), 6)"

  val pmiCollocationsSql: String = s"""
    WITH base AS (SELECT string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    toks AS (SELECT unnest(w) AS tok FROM base),
    bi AS (SELECT w[CAST(i AS INT)] AS w1, w[CAST(i + 1 AS INT)] AS w2
      FROM base, UNNEST(range(1, len(w))) AS t(i)),
    cu AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_uni FROM cu),
    cba AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bi GROUP BY 1, 2),
    tbi AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS t_bi FROM cba),
    cb AS (SELECT * FROM cba WHERE c_xy >= 5)
    SELECT w1, w2, c_xy, $PmiF AS pmi
    FROM cb
      JOIN (SELECT tok AS w1, c AS c_x FROM cu) USING (w1)
      JOIN (SELECT tok AS w2, c AS c_y FROM cu) USING (w2),
      tot, tbi
    ORDER BY pmi DESC, w1, w2
    LIMIT 40"""

  // ------------------------------------------------- survival curve
  /** Week-w survival: the fraction of users whose activity span covers
    * at least w weeks — the retention curve read off user lifetimes.
    * alive(w) = #users with span ≥ w, S(w) = alive(w)/total.
    *
    * Scale: scan → per-user (min,max) day aggregate → span histogram
    * (bounded by the calendar) → non-equi join against a 9-row
    * broadcast week axis. No window anywhere. */
  def survivalWeeks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val span = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(expr(s"(max(ts_us div $UsPerDay) - min(ts_us div $UsPerDay))" +
        " div 7").as("span_w"))
    val hist = span.groupBy("span_w").agg(count(lit(1)).as("cnt"))
      .persist()
    val total = hist.agg(sum(col("cnt")).as("total_users"))
    val weeks = Seq.range(0, 9).toDF("week")
    val res = hist.crossJoin(broadcast(weeks))
      .filter(col("span_w") >= col("week"))
      .groupBy("week").agg(sum(col("cnt")).as("alive"))
      .crossJoin(broadcast(total))
      .select(col("week"), col("alive"),
        expr("ROUND(CAST(alive AS DOUBLE)/total_users, 6)").as("surv"))
      .orderBy("week")
    Caching.materializeAndRelease(res, hist)
  }

  val survivalWeeksSql: String = s"""
    WITH span AS (SELECT user_id,
        (MAX(epoch_us(ts) // $UsPerDay) - MIN(epoch_us(ts) // $UsPerDay))
          // 7 AS span_w
      FROM events GROUP BY 1),
    hist AS (SELECT span_w, COUNT(*) AS cnt FROM span GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_users FROM hist),
    alive AS (SELECT w.week AS week, CAST(SUM(h.cnt) AS BIGINT) AS alive
      FROM hist h, UNNEST(range(0, 9)) AS w(week)
      WHERE h.span_w >= w.week GROUP BY 1)
    SELECT week, alive,
      ROUND(CAST(alive AS DOUBLE)/total_users, 6) AS surv
    FROM alive, tot
    ORDER BY week"""

  // ----------------------------------------------------- TPC-H Q10
  /** TPC-H Q10-shaped: top-20 customers by revenue lost to returns
    * (l_returnflag = 'R') — fact-fact join on orderkey, then a
    * broadcastable customer rollup. Revenue is the exact decimal sum;
    * the top-k order ties break on custkey. */
  def q10Returned(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue")
  }

  val q10ReturnedSql: String = s"""
    SELECT c_custkey, c_name,
      ${Sql.dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  // ----------------------------------------------------- TPC-H Q14
  /** TPC-H Q14-shaped: monthly promo revenue share — lineitem⨝part
    * with a conditional decimal aggregate per ship month. The share
    * ratio divides the two UNROUNDED decimal sums in double (shared
    * formula), so the rounded display columns never feed arithmetic. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    // r17-opt: group on the INT year*100+month key and render the
    // "yyyy-MM" label AFTER aggregation (≤ a few hundred rows) instead
    // of per fact row — date_format runs a DateTimeFormatter per row
    // and the string key hashed/compared per row in the aggregate;
    // year/month are integer field extractions. Identical labels: all
    // shipdates carry 4-digit years, so %04d-%02d reconstructs
    // date_format's zero-padded output exactly.
    graft.Spread(s, s"$d/lineitem.parquet", Tables.lineitem(s, d),
        col("l_orderkey"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .as("ym"))
      .agg(sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0)).cast(Q.Dec)).as("promo_d"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(Q.Dec)).as("total_d"))
      .select(format_string("%04d-%02d", expr("ym div 100"), expr("ym % 100"))
        .as("month"),
        expr("CAST(ROUND(promo_d, 2) AS DOUBLE)").as("promo_rev"),
        expr("CAST(ROUND(total_d, 2) AS DOUBLE)").as("total_rev"),
        expr(PromoPctF).as("promo_pct"))
      .orderBy("month")
  }

  private val PromoPctF: String =
    "ROUND(CAST(promo_d AS DOUBLE)*100 / CAST(total_d AS DOUBLE), 4)"

  val q14PromoShareSql: String = s"""
    WITH m AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
        SUM(CAST(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1.0 - l_discount)
            ELSE 0.0 END AS DECIMAL(38,6))) AS promo_d,
        SUM(CAST(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(38,6))) AS total_d
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1)
    SELECT month,
      CAST(ROUND(promo_d, 2) AS DOUBLE) AS promo_rev,
      CAST(ROUND(total_d, 2) AS DOUBLE) AS total_rev,
      $PromoPctF AS promo_pct
    FROM m
    ORDER BY month"""

  // ------------------------------------------------ Theil–Sen trend
  /** Robust median-slope trend per event type (Theil–Sen): the median
    * of all pairwise slopes (y_j−y_i)/(d_j−d_i) over the daily series
    * — immune to the outlier days that bend OLS (launch spikes,
    * outages). Median = the ⌈m/2⌉-th pair under the total order
    * (slope, day_i, day_j), the LOWER median, picked by a window
    * PARTITIONED BY TYPE. Scale: the pair join is the daily aggregate
    * against itself — O(D²) per type in CALENDAR DAYS (≤ ~10⁷ pairs at
    * a decade), constant in corpus rows; slopes are doubles computed
    * from exact integer counts by one shared formula. */
  def trendTheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), expr(s"ts_us div $UsPerDay").as("day"))
      .agg(count(lit(1)).as("y"))
    val a = daily.toDF("event_type", "da", "ya")
    val b = daily.toDF("bt", "db", "yb")
    val pairs = a.join(b, col("event_type") === col("bt") &&
        col("da") < col("db"))
      .withColumn("slope", expr(SenSlopeF))
    val m = pairs.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("slope"), col("da"), col("db"))
    pairs.withColumn("rn", row_number().over(w))
      .join(m, "event_type")
      .filter(col("rn") === expr("CAST((n_pairs + 1) / 2 AS BIGINT)"))
      .select(col("event_type"), col("n_pairs"),
        expr("ROUND(slope, 6)").as("sen_slope"))
      .orderBy("event_type")
  }

  private val SenSlopeF: String =
    "(CAST(yb AS DOUBLE) - ya) / (db - da)"

  val trendTheilSenSql: String = s"""
    WITH daily AS (SELECT event_type, epoch_us(ts) // $UsPerDay AS day,
        COUNT(*) AS y
      FROM events GROUP BY 1, 2),
    pairs AS (SELECT a.event_type,
        a.day AS da, b.day AS db, a.y AS ya, b.y AS yb,
        $SenSlopeF AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day),
    m AS (SELECT event_type, COUNT(*) AS n_pairs
      FROM pairs GROUP BY 1),
    rk AS (SELECT event_type, slope, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY slope, da, db) AS rn
      FROM pairs)
    SELECT rk.event_type, n_pairs, ROUND(slope, 6) AS sen_slope
    FROM rk JOIN m USING (event_type)
    WHERE rn = CAST((n_pairs + 1) / 2 AS BIGINT)
    ORDER BY event_type"""

  // ------------------------------------------------------- Zipf fit
  /** Zipf-law fit over the top-1000 token frequencies: log-log OLS of
    * ln(freq) on ln(rank) — the corpus-health diagnostic (natural text
    * fits slope ≈ −1; templated/boilerplate corpora bend the curve).
    * Per-row ln values are rounded to 9 dp (double ln agrees across
    * engines far beyond that; a last-ulp libm difference is 1e-15)
    * then summed in exact DECIMAL(38,12), so the regression inputs
    * are order-independent and the closed-form slope/intercept/r²
    * evaluate from ONE shared formula. Scale: the vocabulary
    * aggregate shuffles (token, count); the top-1000 is a distributed
    * TakeOrdered; the rank window runs over ≤1000 rows ABOVE that
    * aggregate (allow-listed global window, same class as
    * vocab_growth's Heaps curve). */
  def textZipfFit(s: SparkSession, d: String): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(1000)
    val w = Window.orderBy(col("c").desc, col("tok"))
    top.withColumn("r", row_number().over(w))
      .withColumn("lx", expr(
        "CAST(ROUND(LN(CAST(r AS DOUBLE)), 9) AS DECIMAL(38,12))"))
      .withColumn("ly", expr(
        "CAST(ROUND(LN(CAST(c AS DOUBLE)), 9) AS DECIMAL(38,12))"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(expr("CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(r AS DOUBLE)), 9) AS DECIMAL(38,12))")).as("sxx"),
        sum(expr("CAST(ROUND(LN(CAST(c AS DOUBLE)) * LN(CAST(c AS DOUBLE)), 9) AS DECIMAL(38,12))")).as("syy"),
        sum(expr("CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(c AS DOUBLE)), 9) AS DECIMAL(38,12))")).as("sxy"))
      .select(col("n_terms"), expr(ZipfSlopeF).as("slope"),
        expr(ZipfInterceptF).as("intercept"), expr(ZipfR2F).as("r2"))
  }

  private val ZipfSlopeF: String =
    "ROUND((CAST(n_terms AS DOUBLE)*CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))" +
      " / (CAST(n_terms AS DOUBLE)*CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6)"
  private val ZipfInterceptF: String =
    "ROUND((CAST(sy AS DOUBLE)" +
      " - ((CAST(n_terms AS DOUBLE)*CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))" +
      " / (CAST(n_terms AS DOUBLE)*CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))*CAST(sx AS DOUBLE))" +
      " / n_terms, 6)"
  private val ZipfR2F: String =
    "ROUND(((CAST(n_terms AS DOUBLE)*CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))" +
      " * (CAST(n_terms AS DOUBLE)*CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)))" +
      " / ((CAST(n_terms AS DOUBLE)*CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))" +
      " * (CAST(n_terms AS DOUBLE)*CAST(syy AS DOUBLE)" +
      " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6)"

  val textZipfFitSql: String = s"""
    WITH cnt AS (SELECT tok, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1),
    top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 1000),
    rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
      FROM top),
    g AS (SELECT COUNT(*) AS n_terms,
        SUM(CAST(ROUND(LN(CAST(r AS DOUBLE)), 9) AS DECIMAL(38,12)))
          AS sx,
        SUM(CAST(ROUND(LN(CAST(c AS DOUBLE)), 9) AS DECIMAL(38,12)))
          AS sy,
        SUM(CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(r AS DOUBLE)), 9)
          AS DECIMAL(38,12))) AS sxx,
        SUM(CAST(ROUND(LN(CAST(c AS DOUBLE)) * LN(CAST(c AS DOUBLE)), 9)
          AS DECIMAL(38,12))) AS syy,
        SUM(CAST(ROUND(LN(CAST(r AS DOUBLE)) * LN(CAST(c AS DOUBLE)), 9)
          AS DECIMAL(38,12))) AS sxy
      FROM rk)
    SELECT n_terms, $ZipfSlopeF AS slope, $ZipfInterceptF AS intercept,
      $ZipfR2F AS r2
    FROM g"""

  // ------------------------------------------------ key-skew profile
  /** Join-key skew profile of lineitem.l_partkey — the diagnostic a
    * planner (or an engineer sizing a salted join) reads before
    * picking a join strategy: distinct keys, max single-key share,
    * top-10 share, mean rows/key. No windows: the top-10 is a
    * distributed TakeOrdered over the per-key aggregate, and the
    * shares divide exact integers. */
  def keySkewProfile(s: SparkSession, d: String): DataFrame = {
    val kc = Tables.lineitem(s, d)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val tot = kc.agg(count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"), max(col("c")).as("max_c"))
    val top10 = kc.orderBy(col("c").desc, col("l_partkey")).limit(10)
      .agg(sum(col("c")).as("top10_rows"))
    tot.crossJoin(broadcast(top10))
      .select(col("n_keys"), col("n_rows"), col("max_c"),
        expr("ROUND(CAST(max_c AS DOUBLE) / n_rows, 6)").as("max_share"),
        expr("ROUND(CAST(top10_rows AS DOUBLE) / n_rows, 6)")
          .as("top10_share"),
        expr("ROUND(CAST(n_rows AS DOUBLE) / n_keys, 6)").as("rows_per_key"))
  }

  val keySkewProfileSql: String = """
    WITH kc AS (SELECT l_partkey, COUNT(*) AS c
      FROM lineitem GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
        CAST(MAX(c) AS BIGINT) AS max_c FROM kc),
    t10 AS (SELECT CAST(SUM(c) AS BIGINT) AS top10_rows FROM (
        SELECT c FROM kc ORDER BY c DESC, l_partkey LIMIT 10))
    SELECT n_keys, n_rows, max_c,
      ROUND(CAST(max_c AS DOUBLE) / n_rows, 6) AS max_share,
      ROUND(CAST(top10_rows AS DOUBLE) / n_rows, 6) AS top10_share,
      ROUND(CAST(n_rows AS DOUBLE) / n_keys, 6) AS rows_per_key
    FROM tot, t10"""

  // ----------------------------------------------------------- specs
  val specs: Seq[QuerySpec] = Seq(
    QuerySpec("events_acf", eventsAcf, Some(eventsAcfSql)),
    QuerySpec("trend_ols", trendOls, Some(trendOlsSql)),
    QuerySpec("ab_test_z", abTestZ, Some(abTestZSql)),
    QuerySpec("revenue_gini", revenueGini, Some(revenueGiniSql)),
    QuerySpec("pmi_collocations", pmiCollocations, Some(pmiCollocationsSql)),
    QuerySpec("survival_weeks", survivalWeeks, Some(survivalWeeksSql)),
    QuerySpec("q10_returned_items", q10Returned, Some(q10ReturnedSql)),
    QuerySpec("q14_promo_share", q14PromoShare, Some(q14PromoShareSql)),
    QuerySpec("trend_theil_sen", trendTheilSen, Some(trendTheilSenSql)),
    QuerySpec("text_zipf_fit", textZipfFit, Some(textZipfFitSql)),
    QuerySpec("key_skew_profile", keySkewProfile,
      Some(keySkewProfileSql)),
    QuerySpec("chi2_independence", chi2Independence,
      Some(chi2IndependenceSql)))
}
