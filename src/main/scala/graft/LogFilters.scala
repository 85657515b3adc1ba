package graft

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{Filter, LoggerContext}
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.logging.log4j.core.filter.RegexFilter

/** Targeted log suppression for the two driver mains (Bench, Verify).
  *
  * The two sanctioned ≤256-row global windows (dsir_importance,
  * shuffle_epoch) emit `WindowExec: No Partition Defined for Window
  * operation!` on every run and would bury a real warning in the bench
  * output. Raising the whole WindowExec logger to ERROR (the previous
  * approach) also muted warnings we DO want — spill notices, future
  * Spark diagnostics — so instead a [[RegexFilter]] denies exactly the
  * known-benign message and stays NEUTRAL for everything else.
  * ScaleSpec's registry-wide audit is what actually enforces the
  * no-unsanctioned-global-window contract; this is display-only.
  */
object LogFilters {

  private val WindowExecLogger =
    "org.apache.spark.sql.execution.window.WindowExec"

  /** Deny only the 'No Partition Defined' warning on WindowExec. */
  def muteSanctionedGlobalWindowWarning(): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    // getLoggerConfig returns the nearest ancestor when no config exists
    // for this exact name; attach the filter to a dedicated additive
    // config so ancestors (e.g. root, org.apache.spark) are untouched.
    val existing = cfg.getLoggerConfig(WindowExecLogger)
    val target =
      if (existing.getName == WindowExecLogger) existing
      else {
        val lc = new LoggerConfig(WindowExecLogger, existing.getLevel, true)
        cfg.addLogger(WindowExecLogger, lc)
        lc
      }
    target.addFilter(RegexFilter.createFilter(
      ".*No Partition Defined for Window operation.*",
      null, java.lang.Boolean.FALSE,
      Filter.Result.DENY, Filter.Result.NEUTRAL))
    ctx.updateLoggers()
  }
}
