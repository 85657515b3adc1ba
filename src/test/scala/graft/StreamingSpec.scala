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

  test("readEvents starts on an EMPTY directory when the ts type is " +
      "declared via spark.graft.events.tsType, and fails fast without it") {
    // The 'start the stream, seed files later' pattern: no footer to
    // probe, so the stored type must be declared explicitly.
    val dir = Files.createTempDirectory("graft-emptystream").toString
    intercept[IllegalStateException] { EventStreams.readEvents(spark, dir) }
    // declare whichever physical type this round's driver data uses
    Tables.configure(spark)
    val stored = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .schema("ts").dataType
    spark.conf.set("spark.graft.events.tsType",
      if (stored == org.apache.spark.sql.types.LongType) "bigint"
      else "timestamp_ntz")
    try {
      val stream = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir))
      val q = stream.writeStream.format("memory").queryName("late_seed_out")
        .outputMode("complete").start()
      try {
        q.processAllAvailable() // zero batches over the empty dir
        Files.copy(Paths.get(sf("sf0.001"), "events.parquet"),
          Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("late_seed_out")
        .agg(sum("n_obs")).collect()(0).getLong(0)
      assert(streamed == Tables.events(spark, sf("sf0.001")).count())
      intercept[IllegalArgumentException] {
        spark.conf.set("spark.graft.events.tsType", "micros")
        EventStreams.readEvents(spark, dir)
      }
    } finally spark.conf.unset("spark.graft.events.tsType")
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

  test("streaming paragraph dedup matches the batch first-occurrence") {
    val dir = Files.createTempDirectory("graft-pstream").toString
    Files.copy(Paths.get(sf("sf0.001"), "documents.parquet"),
      Paths.get(dir, "documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.streamingParagraphDedup(
      EventStreams.readDocuments(spark, dir), "doc_id", "text")
    val q = stream.toDF("para", "first_ord").writeStream.format("memory")
      .queryName("pdedup_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("pdedup_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch truth: same paragraphs, min (doc_id, para_idx) ordinal
    import org.apache.spark.sql.functions._
    val words = split(col("text"), " ")
    val nPar = ceil(size(words) / lit(20.0)).cast("int")
    val paras = transform(sequence(lit(0), nPar - 1),
      i => array_join(slice(words, i * 20 + 1, lit(20)), " "))
    val batch = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), posexplode(paras).as(Seq("para_idx", "para")))
      .groupBy("para")
      .agg(min(col("doc_id") * 100000 + col("para_idx")).as("first_ord"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    // corpus genuinely contains repeated paragraphs across docs
    val total = batch.size
    val exploded = Tables.documents(spark, sf("sf0.001"))
      .select(posexplode(paras)).count()
    assert(total < exploded, "expected duplicate paragraphs in corpus")
  }

  test("streaming count-min sketch: cells after draining the stream " +
      "equal the batch sketch bit-for-bit, with bounded (<=1024) state") {
    val dir = Files.createTempDirectory("graft-cmsstream").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    // two files → at least two micro-batches under maxFilesPerTrigger=1:
    // the sketch must accumulate across batches, not recompute
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = EventStreams.streamingCmsCells(
      spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir).select("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("cms_out").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = EventStreams.streamingCmsCells(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.nonEmpty && got.size <= 1024,
      s"state must stay within the 4x256 sketch: ${got.size}")
  }

  test("streaming HLL registers: drained stream equals the batch " +
      "HllAggregator bit-for-bit, with bounded (<=5x256) state") {
    val dir = Files.createTempDirectory("graft-hllstream").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    // two files → accumulate across micro-batches, not recompute
    ev.filter(col("event_id") % 2 === 0).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = EventStreams.streamingHllRegisters(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hll_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.nonEmpty && got.size <= 5 * 256,
      s"state must stay within 5x256 registers: ${got.size}")
    // batch truth: the HllAggregator registers per event type
    val batch = ev.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.queries.SketchQueries.hllHash(concat_ws(":", col("user_id"),
          expr("ts_us div 86400000000"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.HllF.hll(col("h")).as("regs"))
      .collect()
      .flatMap { r =>
        val t = r.getString(0)
        r.getSeq[Int](1).zipWithIndex.collect {
          case (rho, b) if rho > 0 => (t, b.toLong) -> rho
        }
      }.toMap
    assert(got == batch)
  }

  test("streaming Arrow export: drained shard sets decode to exactly " +
      "the streamed rows") {
    val src = Files.createTempDirectory("graft-arrowsrc").toString
    val out = Files.createTempDirectory("graft-arrowsink").toString
    val ckpt = Files.createTempDirectory("graft-arrowckpt").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"),
        col("n_chars").cast("long").as("n_chars"))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(src)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = graft.streaming.ArrowSink.start(stream, out, ckpt)
    try { q.processAllAvailable() } finally q.stop()
    val back = graft.sources.ArrowIpc.readShards(spark, s"$out/batch-*")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(back.toSeq == want.toSeq)
    // at least two batch directories (accumulation, not recompute)
    val batches = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch-"))
    assert(batches.length >= 2)
  }

  test("ArrowSink batch write is exactly-once under replay and " +
      "crash-partial recovery") {
    val out = Files.createTempDirectory("graft-arrowonce").toString
    val a = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .limit(10)
    // 1. clean write lands with a marker
    graft.streaming.ArrowSink.writeBatchIdempotent(a, out, 3L)
    val dir = new java.io.File(s"$out/batch-00003")
    assert(new java.io.File(dir, "_COMPLETE").exists())
    val first = graft.sources.ArrowIpc.readShards(spark, dir.toString)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(first.size == 10)
    // 2. replay of a COMPLETED id is a no-op even with different data
    //    (at-least-once foreachBatch re-delivery must not double-land)
    graft.streaming.ArrowSink.writeBatchIdempotent(a.limit(3), out, 3L)
    assert(graft.sources.ArrowIpc.readShards(spark, dir.toString)
      .collect().map(_.getLong(0)).sorted.toSeq == first)
    // 3. a crash mid-write leaves shards but NO marker: recovery wipes
    //    the partial directory and rewrites it whole
    new java.io.File(dir, "_COMPLETE").delete()
    val junk = new java.io.File(dir, "part-99999.arrows")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    graft.streaming.ArrowSink.writeBatchIdempotent(a, out, 3L)
    assert(!junk.exists(), "partial shard must be wiped on recovery")
    assert(new java.io.File(dir, "_COMPLETE").exists())
    assert(graft.sources.ArrowIpc.readShards(spark, dir.toString)
      .collect().map(_.getLong(0)).sorted.toSeq == first)
  }

  test("streaming velocity: per-event trailing-window counts equal " +
      "the batch RANGE frame") {
    val dir = Files.createTempDirectory("graft-velstream").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    // split by time (in-order delivery, per the twin's contract)
    val cut = ev.agg(expr("percentile(ts_us, 0.5)")).head.getDouble(0)
    ev.filter(col("ts_us") <= cut).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") > cut).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = EventStreams.streamingVelocity(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withColumn("ts", expr("cast(ts as timestamp_ltz)")))
    val q = stream.writeStream.format("memory").queryName("vel_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("vel_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-600000000L, -1)
    val want = ev.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_us"))
      .withColumn("n_prev", count(lit(1)).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want && got.nonEmpty)
  }

  test("streaming KMV sketch: drained stream retains the batch " +
      "k-minimum values element-for-element") {
    val dir = Files.createTempDirectory("graft-kmvstream").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    ev.filter(col("event_id") % 2 === 0).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = EventStreams.streamingKmvSketch(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir), k = 64)
    val q = stream.writeStream.format("memory").queryName("kmv_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kmv_out").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // batch truth over the same derived key hash
    val want = ev.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.queries.SketchQueries.hllHash(concat_ws(":", col("user_id"),
          expr("ts_us div 86400000000"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.KmvF.kmvArray(64)(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == want && got.nonEmpty)
    assert(got.values.forall(_.length <= 64))
  }

  test("streaming exact-distinct bitmap: drained state equals the " +
      "batch aggregator container-for-container") {
    val dir = Files.createTempDirectory("graft-bmstream").toString
    val ev = Tables.events(spark, sf("sf0.001"))
    ev.filter(col("event_id") % 2 === 0).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).drop("ts_us").coalesce(1)
      .write.mode("append").parquet(dir)
    val stream = EventStreams.streamingBitmapDistinct(
      spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.writeStream.format("memory").queryName("bm_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def stateMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).map(_.toSeq)).toMap
    val got = stateMap(spark.table("bm_out").collect())
    val keyed = ev.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        (col("user_id") * 65536L +
          pmod(expr("ts_us div 86400000000"), lit(65536L))).as("k"))
    val want = stateMap(keyed.groupBy("event_type")
      .agg(graft.functions.BitmapF.bitmap(col("k")).as("state")).collect())
    assert(got == want && got.nonEmpty)
    // and the state decodes to the exact distinct count
    val exact = keyed.groupBy("event_type")
      .agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (t, state) =>
      val card = state.map(c => (c(1) & 0xFFFFFFFFL)).sum
      assert(card == exact(t), t)
    }
  }

  test("streaming incremental dedup: static-corpus bloom + exact " +
      "verify matches the batch truth") {
    val dir = Files.createTempDirectory("graft-istream").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .withColumn("isnew",
        pmod(col("doc_id") * lit(2654435761L), lit(100L)) >= 75)
    // the NEW snapshot arrives as a stream
    docs.filter(col("isnew")).drop("isnew")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // old corpus: distinct 128-bit paragraph hashes + driver Bloom
    val words = split(col("text"), " ")
    val nPar = ceil(size(words) / lit(20.0)).cast("int")
    val paras = transform(sequence(lit(0), nPar - 1),
      i => array_join(slice(words, i * 20 + 1, lit(20)), " "))
    val oldParas = docs.filter(!col("isnew"))
      .select(explode(paras).as("para"))
      .select(xxhash64(col("para")).as("h1"),
        xxhash64(lit(1L), col("para")).as("h2"))
      .distinct()
    val bloom = graft.pipeline.Dedup.boundedBloom(
      oldParas, "h1", math.max(oldParas.count(), 1L))
    val stream = EventStreams.streamingIncrementalDedup(
      EventStreams.readDocuments(spark, dir), oldParas, bloom,
      "doc_id", "text")
    val q = stream.toDF("para", "first_ord").writeStream.format("memory")
      .queryName("idedup_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("idedup_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch truth: new-batch paragraphs whose text is NOT in the old
    // corpus, first (doc_id, para_idx) ordinal
    val oldTexts = docs.filter(!col("isnew"))
      .select(explode(paras).as("para")).distinct()
    val batch = docs.filter(col("isnew"))
      .select(col("doc_id"), posexplode(paras).as(Seq("para_idx", "para")))
      .join(oldTexts.withColumn("seen", lit(1)), Seq("para"), "left")
      .filter(col("seen").isNull)
      .groupBy("para")
      .agg(min(col("doc_id") * 100000 + col("para_idx")).as("first_ord"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch)
    // the static corpus genuinely absorbed some of the stream
    val allNew = docs.filter(col("isnew"))
      .select(explode(paras).as("para")).distinct().count()
    assert(got.size < allNew,
      "expected some new-batch paragraphs to duplicate the old corpus")
    assert(got.nonEmpty)
  }

  test("streaming incremental NEAR-dup matches the batch pass from " +
      "the same persisted MinHash sidecar") {
    val idxDir = Files.createTempDirectory("graft-ndidx-stream").toString
    spark.conf.set("spark.graft.dedup.indexDir", idxDir)
    val streamDir = Files.createTempDirectory("graft-ndstream").toString
    try {
      val d = sf("sf0.01") // sf0.001 has no cross-split near-dup pairs
      // the batch pass persists band index + shingle sets...
      val batch = graft.queries.PipelineQueries
        .dedupIncrementalMinhash(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(batch.nonEmpty, "fixture lost its cross-split pairs")
      val key = graft.pipeline.DedupIndex.snapshotKey(
        spark, s"$d/documents.parquet", "incr-minhash-v1")
      val sidecar = graft.pipeline.DedupIndex.loadNearDup(spark, key)
      assert(sidecar.isDefined, "batch pass did not persist the sidecar")
      val (oldBands, oldSh) = sidecar.get
      val docs = Tables.documents(spark, d)
        .withColumn("isnew",
          pmod(col("doc_id") * lit(2654435761L), lit(100L)) >= 75)
      docs.filter(col("isnew")).drop("isnew")
        .coalesce(1).write.mode("overwrite").parquet(streamDir)
      val stream = EventStreams.streamingIncrementalNearDup(
        EventStreams.readDocuments(spark, streamDir), oldBands, oldSh,
        "doc_id", "text", threshold = 0.5)
      val q = stream.writeStream
        .format("memory").queryName("ineardup_out")
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("ineardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == batch,
        s"stream/batch diverged: only-stream ${got -- batch}, " +
          s"only-batch ${batch -- got}")
    } finally {
      spark.conf.unset("spark.graft.dedup.indexDir")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(streamDir))
    }
  }

  test("streaming near-dup twin sees appended sidecar segments — the " +
      "snapshot chain composes with the streaming side") {
    // Round-15 chain closure, streaming view: after a batch folds its
    // survivors into the sidecar (appendNearDup), a RE-created stream
    // loads the UNION index and matches arrivals against the appended
    // docs too — no old-corpus scan anywhere.
    import spark.implicits._
    val idxDir = Files.createTempDirectory("graft-ndseg-stream").toString
    spark.conf.set("spark.graft.dedup.indexDir", idxDir)
    val streamDir = Files.createTempDirectory("graft-ndsegstr").toString
    val corpus = Files.createTempDirectory("graft-ndsegcorp").toString
    try {
      def doc(id: Long, seed: Long): (Long, String) =
        (id, (0 until 30).map(k => s"w${seed * 100 + k}").mkString(" "))
      Seq(doc(1, 1), doc(2, 2), doc(3, 3)).toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$corpus/old.parquet")
      val oldDf = spark.read.parquet(s"$corpus/old.parquet")
      graft.pipeline.DedupIndex.loadOrBuildNearDup(spark,
        s"$corpus/old.parquet", "nd-stream-chain", oldDf,
        "doc_id", "text")
      val key = graft.pipeline.DedupIndex.snapshotKey(spark,
        s"$corpus/old.parquet", "nd-stream-chain")
      // a prior batch's survivor folds in as a segment…
      val keptSh = graft.pipeline.Dedup.shingles(
        Seq(doc(12, 12)).toDF("doc_id", "text"), "doc_id", "text")
      graft.pipeline.DedupIndex.appendNearDup(spark, key, "b1",
        graft.pipeline.Dedup.minhashBands(keptSh), keptSh)
      // …and the stream created AFTER the append loads the union
      val (bands2, sh2) =
        graft.pipeline.DedupIndex.loadNearDup(spark, key).get
      Seq(doc(21, 12), doc(22, 2), doc(23, 23))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(streamDir)
      val stream = EventStreams.streamingIncrementalNearDup(
        EventStreams.readDocuments(spark, streamDir), bands2, sh2,
        "doc_id", "text", threshold = 0.5)
      val q = stream.writeStream
        .format("memory").queryName("ndseg_out")
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("ndseg_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 21 dups the APPENDED survivor 12; 22 dups base old doc 2;
      // 23 is fresh — the union index answers both tiers
      assert(got == Set((21L, 12L), (22L, 2L)),
        s"stream missed appended-segment or base matches: $got")
      // round 16: COMPACTION composes too — fold base + segment into
      // one generation, re-create the stream from a fresh load, same
      // arrivals, same matches (now off the single compacted root)
      assert(graft.pipeline.DedupIndex.compactNearDup(spark, key) == 1)
      val (bands3, sh3) =
        graft.pipeline.DedupIndex.loadNearDup(spark, key).get
      val stream2 = EventStreams.streamingIncrementalNearDup(
        EventStreams.readDocuments(spark, streamDir), bands3, sh3,
        "doc_id", "text", threshold = 0.5)
      val q2 = stream2.writeStream
        .format("memory").queryName("ndseg_out2")
        .outputMode("append").start()
      try { q2.processAllAvailable() } finally q2.stop()
      val got2 = spark.table("ndseg_out2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == got, s"post-compaction stream diverged: $got2")
      // round 17: the LEASE prune composes with live readers — inside
      // the lease nothing superseded is deleted, so the PRE-compaction
      // listing (bands2/sh2: base + seg-b1 roots) stays fully
      // readable; a zero-lease prune then reaps the folded segment and
      // a stream re-created from a fresh load still matches
      assert(graft.pipeline.DedupIndex
        .pruneSuperseded(spark, key, leaseMs = 3600000L) == 0)
      assert(bands2.count() > 0 && sh2.count() > 0,
        "lease prune broke the pre-compaction reader's roots")
      assert(graft.pipeline.DedupIndex
        .pruneSuperseded(spark, key, leaseMs = 0L) == 1)
      val (bands5, sh5) =
        graft.pipeline.DedupIndex.loadNearDup(spark, key).get
      val stream3 = EventStreams.streamingIncrementalNearDup(
        EventStreams.readDocuments(spark, streamDir), bands5, sh5,
        "doc_id", "text", threshold = 0.5)
      val q3 = stream3.writeStream
        .format("memory").queryName("ndseg_out3")
        .outputMode("append").start()
      try { q3.processAllAvailable() } finally q3.stop()
      val got3 = spark.table("ndseg_out3").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got3 == got, s"post-prune stream diverged: $got3")
    } finally {
      spark.conf.unset("spark.graft.dedup.indexDir")
      Seq(idxDir, streamDir, corpus).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(p)))
    }
  }

  test("streaming incremental dedup reuses the batch-persisted " +
      "snapshot sidecar — bloom and hash index load, nothing rebuilds") {
    val idxDir = Files.createTempDirectory("graft-didx-stream").toString
    spark.conf.set("spark.graft.dedup.indexDir", idxDir)
    val streamDir = Files.createTempDirectory("graft-istream2").toString
    try {
      val d = sf("sf0.001")
      // the batch pass persists bloom + exact hash index for this
      // corpus snapshot...
      graft.queries.PipelineQueries.dedupIncremental(spark, d).collect()
      val key = graft.pipeline.DedupIndex.snapshotKey(
        spark, s"$d/documents.parquet", "incr-para-v1")
      val sidecar = graft.pipeline.DedupIndex.load(spark, key)
      assert(sidecar.isDefined, "batch pass did not persist the sidecar")
      // ...and the stream starts from the LOADED sidecar: no old-corpus
      // DataFrame is ever constructed here, let alone scanned
      val (bloom, oldIdx) = sidecar.get
      val docs = Tables.documents(spark, d)
        .withColumn("isnew",
          pmod(col("doc_id") * lit(2654435761L), lit(100L)) >= 75)
      docs.filter(col("isnew")).drop("isnew")
        .coalesce(1).write.mode("overwrite").parquet(streamDir)
      val stream = EventStreams.streamingIncrementalDedup(
        EventStreams.readDocuments(spark, streamDir), oldIdx, bloom,
        "doc_id", "text")
      val q = stream.toDF("para", "first_ord").writeStream
        .format("memory").queryName("idedup_sidecar_out")
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("idedup_sidecar_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val words = split(col("text"), " ")
      val nPar = ceil(size(words) / lit(20.0)).cast("int")
      val paras = transform(sequence(lit(0), nPar - 1),
        i => array_join(slice(words, i * 20 + 1, lit(20)), " "))
      val oldTexts = docs.filter(!col("isnew"))
        .select(explode(paras).as("para")).distinct()
      val batch = docs.filter(col("isnew"))
        .select(col("doc_id"), posexplode(paras).as(Seq("para_idx", "para")))
        .join(oldTexts.withColumn("seen", lit(1)), Seq("para"), "left")
        .filter(col("seen").isNull)
        .groupBy("para")
        .agg(min(col("doc_id") * 100000 + col("para_idx")).as("first_ord"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == batch)
      assert(got.nonEmpty)
      // round 16: the stream composes with the EXACT chain — fold one
      // emitted paragraph in as a batch segment (appendExact), re-
      // create the stream from the CHAIN load (per-root blooms OR'd),
      // and exactly that paragraph stops emitting
      import spark.implicits._
      val foldPara = got.keysIterator.min
      val foldHashes = Seq(foldPara).toDF("para")
        .select(xxhash64(col("para")).as("h1"),
          xxhash64(lit(1L), col("para")).as("h2"))
      graft.pipeline.DedupIndex.appendExact(spark, key, "s1",
        foldHashes, 4L)
      val (blooms2, idx2) =
        graft.pipeline.DedupIndex.loadExactChain(spark, key).get
      assert(blooms2.size == 2, s"chain roots: ${blooms2.size}")
      val stream2 = EventStreams.streamingIncrementalDedup(
        EventStreams.readDocuments(spark, streamDir), idx2, blooms2,
        "doc_id", "text")
      val q2 = stream2.toDF("para", "first_ord").writeStream
        .format("memory").queryName("idedup_sidecar_out2")
        .outputMode("append").start()
      try { q2.processAllAvailable() } finally q2.stop()
      val got2 = spark.table("idedup_sidecar_out2").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got2 == got - foldPara,
        s"chain-aware stream diverged: missing=${(got - foldPara).keySet -- got2.keySet} extra=${got2.keySet -- (got - foldPara).keySet}")
    } finally {
      spark.conf.unset("spark.graft.dedup.indexDir")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(idxDir))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(streamDir))
    }
  }

  test("streaming media ingest: files dropped into a watched dir get " +
      "the same features as the batch path, late arrivals included") {
    import spark.implicits._
    import graft.streaming.MediaStreams
    val dir = Files.createTempDirectory("graft-mediastream").toString
    val fixtures = Seq("png_gradient.png", "wav_sine.wav", "avi_clip.avi",
      "mp3_cbr.mp3", "h264_high.h264", "mp4_clip.mp4")
    def drop(name: String): Unit = {
      val in = getClass.getResourceAsStream(s"/graft/fixtures/$name")
      val bytes = try in.readAllBytes() finally in.close()
      Files.write(Paths.get(dir, name), bytes)
      ()
    }
    fixtures.take(3).foreach(drop)
    val stream = MediaStreams.streamingMediaFeatures(
      MediaStreams.readMediaDir(spark, dir))
    val q = stream.toDF().writeStream.format("memory")
      .queryName("media_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      fixtures.drop(3).foreach(drop) // late arrivals, second micro-batch
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("media_out")
      .select(col("id"), col("kind"), col("nBytes"), col("features"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getSeq[Float](3))).toMap
    assert(streamed.size == fixtures.length)
    // batch truth over the same bytes with the same path-hash ids and
    // the same extension-derived kinds
    val idKind = fixtures.map(n => s"file:$dir/$n").toDF("p")
      .select(col("p"), xxhash64(col("p")).as("id"),
        MediaStreams.kindFromPath(col("p")).as("kind"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val items = fixtures.map { name =>
      val (id, kind) = idKind(s"file:$dir/$name")
      graft.pipeline.Multimodal.MediaItem(id, kind,
        Files.readAllBytes(Paths.get(dir, name)), Map("src" -> name))
    }
    val batch = graft.pipeline.Multimodal
      .extractMediaFeatures(spark.createDataset(items))
      .collect().map(f => f.id -> ((f.kind, f.nBytes, f.features.toSeq)))
      .toMap
    assert(streamed == batch)
    // every fixture actually decoded/parsed (no -1 sentinel):
    // png/wav/avi through real decode, mp3/h264/mp4 through the
    // compressed-header fallback inside the SAME dispatcher
    streamed.values.foreach { case (kind, _, feats) =>
      assert(feats.head != -1f, s"$kind fell through to the byte stub")
    }
  }

  test("streaming per-user transitions match the batch Markov counts") {
    val dir = stageEventsDir()
    val stream = EventStreams.streamingTransitions(
      EventStreams.readEvents(spark, dir))
    val q = stream.toDF().writeStream.format("memory")
      .queryName("markov_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("markov_out")
      .groupBy("prev_type", "next_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.queries.CubeQueries.eventsMarkov(spark, sf("sf0.001"))
      .select("prev_type", "next_type", "n_trans").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.values.sum ==
      Tables.events(spark, sf("sf0.001")).count() -
        Tables.events(spark, sf("sf0.001")).select("user_id").distinct()
          .count())
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

  test("streaming rolling trailing-window rate equals the batch range window") {
    import org.apache.spark.sql.expressions.Window
    val steps = 3
    val dir = stageEventsDir()
    val stream = EventStreams.rollingHourlyRate(
      EventStreams.readEvents(spark, dir), steps = steps, minPeriods = 1)
    val q = stream.toDF().writeStream.format("memory")
      .queryName("rolling_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("rolling_out").collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))
    }.toMap
    assert(streamed.nonEmpty)

    // batch twin: hourly counts + a trailing range window per type
    val hourly = Tables.events(spark, sf("sf0.001"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("hour_start"),
        col("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("hour_start").cast("long"))
      .rangeBetween(-(steps - 1) * 3600L, 0)
    val batch = hourly
      .withColumn("n_hours", count(lit(1)).over(w))
      .withColumn("total_events", sum(col("n")).over(w))
      .withColumn("avg_per_hour", col("total_events") / col("n_hours"))
      .collect().map { r =>
        (r.getString(0), r.getTimestamp(1).getTime) ->
          (r.getLong(3), r.getLong(4), r.getDouble(5))
      }.toMap
    // every emitted row (hours the watermark closed) must be EXACTLY
    // the batch row — frame size, totals and the double rate
    streamed.foreach { case (k, v) =>
      assert(batch.contains(k), s"streamed hour $k missing from batch")
      assert(batch(k) == v, s"mismatch at $k: batch=${batch(k)} stream=$v")
    }
    // and the stream closed nearly every hour (all but the tail the
    // final watermark holds open)
    assert(streamed.size >= batch.size - 5 * steps,
      s"only ${streamed.size} of ${batch.size} hours emitted")
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

  test("stream-stream conversion join matches the batch twin exactly") {
    val dir = stageEventsDir()
    val stream = EventStreams.conversionJoin(
      EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("conv_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("conv_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch twin via ts_us arithmetic on the batch reader
    val ev = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "user_id", "event_type", "ts_us")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_ts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + lit(3600000000L))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("p_ts") - col("c_ts")).as("gap_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty, "fixture must contain click→purchase pairs")
    assert(streamed == batch)
  }

  test("streaming A/B conversion counts match the batch twin and stay " +
      "stable under replayed delivery") {
    val dir = stageEventsDir()
    val stream = EventStreams.streamingAbConversions(
      EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("ab_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def counts(): Map[Long, (Long, Long)] = spark.table("ab_out")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // batch twin: distinct users / converted users per parity variant
      val batch = Tables.events(spark, sf("sf0.001"))
        .groupBy(expr("user_id % 2").as("variant"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 150, 1).otherwise(0)).as("conv"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(batch.values.map(_._2).sum > 0,
        "fixture must contain high-value conversions")
      assert(counts() == batch)
      // replayed delivery: the same file again must add ZERO deltas
      // (per-user state dedups users and conversions across batches)
      Files.copy(Paths.get(sf("sf0.001"), "events.parquet"),
        Paths.get(dir, "events_replay.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(counts() == batch)
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join") {
    val dir = stageEventsDir()
    // static dimension: per-user event count from the batch table
    val dim = Tables.events(spark, sf("sf0.001"))
      .groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    val stream = EventStreams.enrich(
      EventStreams.readEvents(spark, dir), dim)
      .groupBy("n_user_events").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("enrich_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf("sf0.001")).join(dim, Seq("user_id"))
      .groupBy("n_user_events").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming CDC apply: state after draining the change stream " +
      "equals the batch merge") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val chDir = Files.createTempDirectory("graft-cdc-in").toString
    val stateDir = Files.createTempDirectory("graft-cdc-st").toString + "/state"
    val ckDir = Files.createTempDirectory("graft-cdc-ck").toString
    // batch 1: seed keys 0..9; batch 2: update evens, delete 1 and 3,
    // insert 100 — arriving as two files
    val b1 = (0L until 10L).map(k => (k, "upsert", k, s"v$k"))
      .toDF("change_id", "op", "key", "payload")
    val b2 = Seq(
      (100L, "upsert", 0L, "v0b"), (101L, "upsert", 2L, "v2b"),
      (102L, "delete", 1L, null), (103L, "delete", 3L, null),
      (104L, "upsert", 100L, "new"),
      // same-key twice in one batch: later change_id must win
      (105L, "upsert", 4L, "v4-mid"), (106L, "upsert", 4L, "v4-final"))
      .toDF("change_id", "op", "key", "payload")
    b1.coalesce(1).write.mode("overwrite").parquet(chDir + "/f1")
    val schema = StructType(Seq(StructField("change_id", LongType),
      StructField("op", StringType), StructField("key", LongType),
      StructField("payload", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(chDir)
    val q = graft.streaming.CdcApply.start(stream, stateDir, ckDir)
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.mode("overwrite").parquet(chDir + "/f2")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(stateDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = ((0L until 10L).map(k => k -> s"v$k").toMap
      ++ Map(0L -> "v0b", 2L -> "v2b", 100L -> "new", 4L -> "v4-final")
      -- Seq(1L, 3L))
    assert(got == want)
  }

  test("CDC applyBatch is replay-idempotent (foreachBatch may re-run " +
      "a batch after restart)") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-cdc-rp").toString + "/st"
    val b1 = (0L until 5L).map(k => (k, "upsert", k, s"v$k"))
      .toDF("change_id", "op", "key", "payload")
    val b2 = Seq((10L, "upsert", 0L, "v0b"), (11L, "delete", 1L, null))
      .toDF("change_id", "op", "key", "payload")
    graft.streaming.CdcApply.applyBatch(b1, stateDir)
    graft.streaming.CdcApply.applyBatch(b2, stateDir)
    val once = spark.read.parquet(stateDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // replay the SAME batch (restart-after-commit-failure scenario)
    graft.streaming.CdcApply.applyBatch(b2, stateDir)
    val twice = spark.read.parquet(stateDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == twice && once == Map(0L -> "v0b", 2L -> "v2",
      3L -> "v3", 4L -> "v4"))
  }

  test("dropDuplicatesWithinWatermark emits each replayed event once") {
    // stage the same file TWICE → every event delivered twice
    val dir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    for (n <- Seq("a", "b")) Files.copy(
      Paths.get(sf("sf0.001"), "events.parquet"),
      Paths.get(dir, s"events_$n.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.dedupWithinWatermark(
      EventStreams.readEvents(spark, dir))
    val q = stream.writeStream.format("memory").queryName("wmdedup_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val out = spark.table("wmdedup_out")
    val nDistinctBatch = Tables.events(spark, sf("sf0.001"))
      .select("event_id").distinct().count()
    assert(out.count() == nDistinctBatch)
    assert(out.select("event_id").distinct().count() == nDistinctBatch)
  }

  test("stateful twins survive null user_id/value/event_type rows " +
      "(a production feed carries them; the tuple decoder must never " +
      "see the null)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nulls").toString
    val hourNs = 3600L * 1000000000L
    // ts stored as epoch-nanos int64 (the bigint branch of readEvents)
    val rows = Seq(
      // user 1: click then purchase (one transition, one conversion)
      (Some(1L), Some(1L), Some(1L * hourNs), Some("click"), Some(10.0)),
      (Some(2L), Some(1L), Some(1L * hourNs + 1), Some("purchase"),
        Some(200.0)),
      // null user: would crash the Long decoder un-filtered
      (Some(3L), None, Some(1L * hourNs + 2), Some("click"), Some(5.0)),
      (Some(4L), None, Some(1L * hourNs + 3), Some("purchase"),
        Some(999.0)),
      // user 2: null value and null event_type rows
      (Some(5L), Some(2L), Some(2L * hourNs), None, Some(300.0)),
      (Some(6L), Some(2L), Some(2L * hourNs + 1), Some("purchase"), None),
      // null event_id (transitions filter; others ignore it)
      (None, Some(2L), Some(2L * hourNs + 2), Some("view"), Some(1.0)),
      // null ts: would NPE/crash the ts_us decode in transitions and
      // the ts.getTime in sessions — must be excluded, not fatal
      (Some(8L), Some(1L), None, Some("view"), Some(2.0)))
    rows.map { case (eid, uid, ts, et, v) => (eid, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val trans = EventStreams.streamingTransitions(
      EventStreams.readEvents(spark, dir))
    val q1 = trans.toDF().writeStream.format("memory")
      .queryName("null_trans").outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    val got = spark.table("null_trans").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // null-user rows and the null-event_id row are excluded; user 2's
    // null event_type rides as a null STRING (reference type — legal)
    assert(got == Set((1L, "click", "purchase"), (2L, null, "purchase")))

    val ab = EventStreams.streamingAbConversions(
      EventStreams.readEvents(spark, dir))
    val q2 = ab.writeStream.format("memory").queryName("null_ab")
      .outputMode("complete").start()
    try q2.processAllAvailable() finally q2.stop()
    val abGot = spark.table("null_ab").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // batch twin semantics: null users outside both variants; user 1
    // (odd) converted at 200>150; user 2's purchase has null value →
    // conv 0 (batch otherwise(0))
    assert(abGot == Map(1L -> (1L, 1L), 0L -> (1L, 0L)))

    val sess = EventStreams.statefulSessions(
      EventStreams.readEvents(spark, dir))
    val q3 = sess.writeStream.format("memory").queryName("null_sess")
      .outputMode("append").start()
    try q3.processAllAvailable() finally q3.stop()
    // no decode crash; closed sessions (if any emitted yet) carry only
    // non-null users
    assert(spark.table("null_sess").filter(col("user_id").isNull)
      .count() == 0)
  }

  test("CdcApply rejects an unknown op loudly instead of inserting " +
      "null-payload ghost rows") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-cdc-op").toString + "/st"
    val bad = Seq((1L, "Upsert", 5L, "v5"))
      .toDF("change_id", "op", "key", "payload")
    val e = intercept[Exception] {
      graft.streaming.CdcApply.applyBatch(bad, stateDir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unknown op")),
      s"expected the unknown-op error, got: ${msgs(e).mkString(" | ")}")
    // nothing was published
    assert(!new java.io.File(stateDir).exists())
  }
}
