package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9: the reference has no
  * streaming engine — its only time-variant behaviors are config
  * hot-reload and 'current'-time selection. This module is the natural
  * Spark extension: cubes/events appended over time become a streaming
  * source with watermarked windowed aggregation, giving the same
  * results as the batch hourly query when the stream drains.)
  */
object EventStreams {

  /** events parquet schema as stored (ts read as epoch-nanos long via
    * the nanosAsLong session flag). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsSchema).parquet(dir)
      .withColumnRenamed("ts", "ts_raw_ns")
      .withColumn("ts", expr("timestamp_micros(ts_raw_ns div 1000)"))
  }

  /** Watermarked tumbling-hour counts per event type; in append mode a
    * window emits once its watermark passes — the streaming equivalent
    * of the batch `events_hourly` query. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_obs"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_obs"), col("sum_value"))

  /** Stateful per-user sessionization via flatMapGroupsWithState-style
    * session windows: Spark's built-in session_window gives the same
    * 30-minute-gap semantics as the batch sessionize query. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))
}
