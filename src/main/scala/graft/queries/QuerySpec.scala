package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator demonstration: a Spark query over the testdata
  * tables plus (where SQL-expressible) a DuckDB oracle that must produce
  * the hash-identical result on the same parquet inputs.
  *
  * Determinism rules (driver hash-compares row values, columns sorted by
  * name):
  *  - every output column is explicitly aliased, identically in both;
  *  - every query ends in ORDER BY over a unique key;
  *  - no raw double aggregates: sums go through DECIMAL(38,6) (exact,
  *    order-independent) and are rounded + cast back to double; averages
  *    are exact-decimal sums divided as double, then rounded;
  *  - timestamps are emitted as epoch-nanos BIGINT or ISO-8601 strings,
  *    never as native timestamp columns (DuckDB is ns, Spark is µs).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** queries worth timing at sf0.1 in Bench */
    bench: Boolean = true)

/** SQL-string builders mirroring graft.Q's Spark-side exact arithmetic. */
object Sql {
  /** Exact decimal sum rounded to `scale`, as double. */
  def dsum(x: String, scale: Int = 2): String =
    s"CAST(ROUND(SUM(CAST($x AS DECIMAL(38,6))), $scale) AS DOUBLE)"

  /** Exact decimal sum divided by count (IEEE double division), rounded. */
  def davg(x: String, scale: Int = 6): String =
    s"ROUND(CAST(SUM(CAST($x AS DECIMAL(38,6))) AS DOUBLE)/COUNT($x), $scale)"
}
