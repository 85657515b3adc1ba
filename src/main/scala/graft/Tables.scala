package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * All engine code reads through here so session-level parity settings
  * (UTC, nanosecond-timestamp handling) are applied exactly once.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings required for oracle (DuckDB) parity. Idempotent. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS) which Spark does not model;
    // read it as epoch-nanos LongType and convert explicitly (see events()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts_us: BIGINT` (epoch micros) and `ts: TIMESTAMP`
    * at the same precision. The file stores TIMESTAMP(NANOS); DuckDB 1.0
    * cannot observe sub-microsecond residue (`epoch_ns` truncates), so
    * microseconds — floor-truncated identically by `div 1000` here and
    * `epoch_us()` there — are the cross-engine time axis.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_raw_ns")
      .withColumn("ts_us", expr("ts_raw_ns div 1000"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .drop("ts_raw_ns")
}
