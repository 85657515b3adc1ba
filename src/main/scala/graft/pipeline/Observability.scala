package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline metrics.
  *
  * At 100 TB the worst observability anti-pattern is the audit
  * recount: a `df.count()` before and after every gate doubles the
  * scan bill. `Dataset.observe` piggybacks named aggregates on the
  * SAME physical pass — a `CollectMetrics` node folds per-task partial
  * rows into one driver-side row when the action that consumes the
  * frame runs — so per-stage row/char accounting costs nothing beyond
  * the job the pipeline was already going to run.
  *
  * The reference ships request-level perf tracing (`perf.py`,
  * mirrored in `server/Perf.scala`); this is the corresponding
  * DATA-level accounting surface for the curation pipeline:
  * every gate reports what it saw and what it kept, observable from
  * the driver after the write/collect completes.
  */
object Observability {

  /** Attach named metrics at this point in the plan. The metrics see
    * exactly the rows that flow past this node — attach before a
    * filter for input accounting, after it for survivor accounting. */
  def observed(df: DataFrame, name: String,
      metrics: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** A minimum-length quality gate with free in/out accounting: the
    * returned frame filters `docs` to `length(text) >= minChars`; the
    * two observations resolve — after the caller's next ACTION on the
    * frame — to (rows_in, chars_in) and (rows_kept, chars_kept). One
    * scan total. */
  def gatedWithAccounting(docs: DataFrame, minChars: Int)
      : (DataFrame, Observation, Observation) = {
    val (seen, inObs) = observed(docs, "gate_in",
      "rows_in" -> count(lit(1)),
      "chars_in" -> coalesce(sum(length(col("text"))), lit(0L)))
    val (kept, outObs) = observed(
      seen.filter(length(col("text")) >= minChars), "gate_out",
      "rows_kept" -> count(lit(1)),
      "chars_kept" -> coalesce(sum(length(col("text"))), lit(0L)))
    (kept, inObs, outObs)
  }
}
