package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global percentiles with NO global sort, for ANY value domain.
  *
  * The classic formulation (`ORDER BY v` + pick row k) is a full-table
  * range exchange at 100 TB. This is the iterative-narrowing
  * alternative: each round is one scan that histograms every target's
  * CURRENT candidate range into `Bins` equal-width sub-ranges (all
  * targets batched in the same scan via a broadcast range join), the
  * driver walks the ≤ targets·Bins cumulative counts to find which
  * sub-range holds each target's rank, and the next round recurses
  * into only those slivers. Ranges shrink ~Bins× per round, so a
  * 64-bit domain needs ≤ ⌈64/log₂Bins⌉ = 6 rounds WORST case and
  * real data (which concentrates) needs 1–2; each round's driver
  * state is bounded by targets·Bins, never by rows. When a target's
  * sliver is under [[SliverRows]] the final pass row_numbers only the
  * slivers — a pushed-down filter selecting a vanishing fraction of
  * the table.
  *
  * Exactness invariant per target: (lo, hi, k) with the k-th smallest
  * value of rows in [lo, hi] equal to the requested global rank's
  * value. Binning is any per-row deterministic monotone map (here
  * `floor((v-lo)·Bins/(hi-lo))` in double arithmetic, clamped), so
  * the invariant survives floating-point edge rounding: the SAME
  * expression assigns a row in the histogram pass and the recurse
  * filter. Rank semantics are type-1 (lower) sample quantiles,
  * r = ⌈p·N⌉ computed in integer permille arithmetic.
  */
object ExactPercentile {

  val Bins = 2048
  val SliverRows: Long = 65536L
  val MaxRounds = 8

  private case class Target(pm: Long, rank: Long, lo: Double, hi: Double,
                            k: Long, n: Long)

  /** v mapped to a bin in [0, Bins) for range [lo, hi]. Monotone in v,
    * total (clamped), and identical in the histogram and the recurse
    * filter. */
  private def binExpr(v: Column, lo: Double, hi: Double): Column = {
    val w = (hi - lo) / Bins
    if (w <= 0) lit(0)
    else least(greatest(floor((v.cast("double") - lit(lo)) / lit(w))
      .cast("int"), lit(0)), lit(Bins - 1))
  }

  /** Exact permille percentiles of `valCol` (numeric) over `df`.
    * Returns (p double, rank long, value <valCol type>) ordered by p.
    * Eager: runs the narrowing rounds at call time (driver state =
    * targets · Bins counts per round). */
  def percentiles(df: DataFrame, valCol: String, pms: Seq[Long]): DataFrame = {
    val s = df.sparkSession
    val v = col(valCol)
    val head = df.agg(count(v).as("n"),
      min(v).cast("double").as("lo"), max(v).cast("double").as("hi"))
      .collect()(0)
    val total = head.getLong(0)
    require(total > 0, "exact percentiles of an empty input")
    var targets = pms.map { pm =>
      val r = (pm * total + 999L) / 1000L
      Target(pm, r, head.getDouble(1), head.getDouble(2), r, total)
    }
    var round = 0
    while (targets.exists(_.n > SliverRows) && round < MaxRounds) {
      val live = targets.filter(t => t.n > SliverRows && t.hi > t.lo)
      if (live.isEmpty) {
        round = MaxRounds // degenerate slivers (hi == lo): final pass
      } else {
        val tdf = broadcast(s.createDataFrame(
          live.map(t => (t.pm, t.lo, t.hi))).toDF("pm", "t_lo", "t_hi"))
        // one scan, all live targets: range-join each row into the
        // targets whose candidate interval contains it, histogram per
        // (target, bin). Driver result ≤ targets·Bins rows.
        val binned = df.join(tdf,
            v.cast("double") >= col("t_lo") && v.cast("double") <= col("t_hi"))
        val hist = live.foldLeft(when(lit(false), lit(0))) { (acc, t) =>
            acc.when(col("pm") === t.pm, binExpr(v, t.lo, t.hi))
          }
        val counts = binned
          .groupBy(col("pm"), hist.as("bin"))
          .agg(count(lit(1)).as("c"),
            min(v.cast("double")).as("blo"), max(v.cast("double")).as("bhi"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (pm, rows) =>
            pm -> rows.map(r =>
              (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
              .sortBy(_._1)
          }
        targets = targets.map { t =>
          counts.get(t.pm) match {
            case Some(bins) if t.n > SliverRows && t.hi > t.lo =>
              var cum = 0L
              val (_, c, blo, bhi) =
                bins.find { case (_, c, _, _) => cum += c; cum >= t.k }.get
              val before = cum - c
              // recurse into the chosen bin's ACTUAL value extent:
              // binExpr is monotone, so bins partition the v-axis into
              // intervals and every row with v ∈ [blo, bhi] (the bin's
              // own min/max) belongs to exactly this bin — the range
              // filter of the next round selects PRECISELY the rows
              // this histogram counted, floating-point edges included
              Target(t.pm, t.rank, blo, bhi, t.k - before, c)
            case _ => t
          }
        }
        round += 1
      }
    }
    // final pass: row_number only the slivers
    val tdf = broadcast(s.createDataFrame(
      targets.map(t => (t.pm, t.lo, t.hi, t.k)))
      .toDF("pm", "t_lo", "t_hi", "t_k"))
    val w = Window.partitionBy("pm").orderBy(valCol)
    val ranks = broadcast(s.createDataFrame(
      targets.map(t => (t.pm, t.rank))).toDF("pm", "rank"))
    df.join(tdf,
        v.cast("double") >= col("t_lo") && v.cast("double") <= col("t_hi"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === col("t_k"))
      .join(ranks, Seq("pm"))
      .select((col("pm") / lit(1000.0)).as("p"), col("rank"),
        v.as("value"))
      .orderBy("p")
  }
}
