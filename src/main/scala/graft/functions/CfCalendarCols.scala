package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level CF-calendar date decoding — the same day-numbering as
  * [[graft.sources.CfTime]] (which decodes store AXES on the driver),
  * expressed as codegen'd integer arithmetic for decoding a day-count
  * COLUMN at scale (climate ensembles ship per-row day offsets in
  * model calendars; reference reads them via cftime,
  * context.py:243-250). Pure `functions._` composition — stays inside
  * whole-stage codegen, mirrors 1:1 into the DuckDB oracle SQL. */
object CfCalendarCols {

  private def pad(c: Column, n: Int): Column =
    lpad(c.cast("string"), n, "0")

  private def label(y: Column, mo: Column, d: Column): Column =
    concat(pad(y, 4), lit("-"), pad(mo, 2), lit("-"), pad(d, 2))

  /** truncating integer division — floor for the non-negative counts
    * these decoders take (exact through double: counts ≪ 2^52) */
  private def idiv(a: Column, b: Int): Column =
    (a / lit(b)).cast("long")

  /** `yyyy-MM-dd` label of `days` days since 1970-01-01 in the CF
    * `360_day` calendar (every month exactly 30 days). Non-negative
    * day counts (DIV/% agree with floor there; store axes with
    * pre-1970 bases decode on the driver via CfTime). */
  def iso360(days: Column): Column = {
    val d = days.cast("long")
    val y = lit(1970) + idiv(d, 360)
    val r = d % lit(360)
    label(y, idiv(r, 30) + lit(1), r % lit(30) + lit(1))
  }

  /** `yyyy-MM-dd` of `days` since 1970-01-01 in `noleap`/`365_day`
    * (no year has Feb 29); month via cumulative-length table lookup */
  def isoNoLeap(days: Column): Column = {
    val y = lit(1970) + idiv(days.cast("long"), 365)
    val r = (days.cast("long") % lit(365)).cast("int")
    // cumulative non-leap month starts; element_at is 1-based
    val cum = array(Seq(0, 31, 59, 90, 120, 151, 181, 212, 243, 273,
      304, 334).map(lit): _*)
    // month = count of cum entries <= r  (r in [0,364], so in [1,12])
    val mo = aggregate(cum, lit(0),
      (acc, c) => acc + when(c <= r, 1).otherwise(0))
    label(y, mo, r - element_at(cum, mo) + lit(1))
  }
}
