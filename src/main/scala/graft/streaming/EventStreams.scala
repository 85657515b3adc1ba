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
final case class SessionState(n: Long, startMs: Long, endMs: Long, sum: Double)
final case class AbUserState(seen: Boolean, converted: Boolean)
final case class AbDelta(variant: Long, dUser: Long, dConv: Long)
final case class UserSession(user_id: Long, n_events: Long,
                             start_ms: Long, end_ms: Long, sum_value: Double)
/** rolling-aggregate state: open hour buckets + recently closed ones */
final case class RollBuckets(pending: Map[Long, Long],
                             closed: List[(Long, Long)])
final case class RollingRate(event_type: String,
                             hour_start: java.sql.Timestamp,
                             n_hours: Long, total_events: Long,
                             avg_per_hour: Double)
/** per-user Markov state: the latest event seen, by (ts_us, event_id) */
final case class LastEvent(tsUs: Long, eventId: Long, eventType: String)
final case class Transition(user_id: Long, prev_type: String,
                            next_type: String)
/** per-user velocity state: event micros within the trailing horizon */
final case class RecentTs(ts: Seq[Long])
final case class VelocityFlag(user_id: Long, ts_us: Long, n_prev: Long)

object EventStreams {

  /** events parquet schema as stored when `ts` is TIMESTAMP(NANOS)
    * (read as epoch-nanos long via the nanosAsLong session flag). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files.
    *
    * A streaming source needs its schema up front, but the driver has
    * shipped `ts` as both TIMESTAMP(NANOS) (→ BIGINT under nanosAsLong)
    * and TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ) across rounds, so the
    * stored type is probed from the footers of any files already in the
    * directory (a batch-schema read — no job). Either way the stream
    * surfaces `ts` as a session-UTC TIMESTAMP at micros precision,
    * matching [[graft.Tables.events]].
    *
    * A stream that must start BEFORE the first file lands cannot be
    * probed; set `spark.graft.events.tsType` to `bigint` (nanos stored
    * as int64) or `timestamp_ntz` (micros) to declare the stored type
    * explicitly — the override wins over probing, and an empty
    * directory without it stays a fail-fast error (an arbitrary default
    * could mis-declare the schema for files that arrive later).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // Same session parity settings as the batch path (UTC + nanosAsLong):
    // the NTZ->LTZ cast below is a wall-clock identity only under UTC.
    graft.Tables.configure(spark)
    val storedTs = spark.conf.getOption("spark.graft.events.tsType") match {
      case Some("bigint")        => LongType
      case Some("timestamp_ntz") => TimestampNTZType
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.events.tsType='$other'; expected 'bigint' or " +
          "'timestamp_ntz'")
      case None =>
        try spark.read.parquet(dir).schema("ts").dataType
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalStateException(
              s"cannot infer events schema from '$dir' (empty or " +
                "unreadable); seed the directory with at least one parquet " +
                "file, or declare the stored ts type via " +
                "spark.graft.events.tsType", e)
        }
    }
    if (storedTs == LongType)
      spark.readStream.schema(eventsSchema).parquet(dir)
        .withColumnRenamed("ts", "ts_raw_ns")
        .withColumn("ts", expr("timestamp_micros(ts_raw_ns div 1000)"))
    else {
      val schema = StructType(eventsSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = storedTs) else f))
      spark.readStream.schema(schema).parquet(dir)
        .withColumn("ts", expr("cast(ts as timestamp_ltz)"))
    }
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

  /** Custom-state sessionization (flatMapGroupsWithState): explicit
    * per-user session state with event-time timeout — the shape for
    * session logic the built-in session_window can't express (e.g.
    * value-dependent gaps). Emits closed sessions. */
  def statefulSessions(events: org.apache.spark.sql.DataFrame,
                       gapMs: Long = 30L * 60 * 1000): org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // null guard (same contract as streamingVelocity): a null user_id
    // or value would crash the primitive tuple decoder at runtime; the
    // batch twin groups null users into one meaningless pseudo-user —
    // excluding them is the honest streaming semantics. null values
    // ride as 0.0: sum-wise identical to the batch null-skipping sum.
    val typed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts",
        "coalesce(value, 0.0d) AS value")
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.n, s.startMs, s.endMs, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(s.copy(n = s.n + 1, endMs = t, sum = s.sum + v))
                case Some(s) =>
                  closed ::= UserSession(userId, s.n, s.startMs, s.endMs, s.sum)
                  cur = Some(SessionState(1, t, t, v))
                case None =>
                  cur = Some(SessionState(1, t, t, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: keep only the FIRST occurrence of each key
    * (the streaming twin of Dedup.exact — an ingestion pipeline drops
    * repeated documents as they arrive). One boolean of state per seen
    * key via mapGroupsWithState; at scale state is hash-partitioned by
    * key across executors and checkpointed, so the seen-set never
    * gathers on one node. Emits (key, first_id) once per key. */
  def streamingDedup(rows: DataFrame, keyCol: String,
                     idCol: String): org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    rows.filter(col(idCol).isNotNull) // null id crashes the Long decoder
      .selectExpr(s"CAST($keyCol AS STRING) AS k", s"$idCol AS id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(key -> it.map(_._2).min)
          }
      }
  }

  /** Streaming documents source (doc_id, text parquet drops). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    spark.readStream.schema(schema).parquet(dir).select("doc_id", "text")
  }

  /** Streaming paragraph-level dedup — the streaming twin of the
    * `dedup_paragraph` batch pass (same fixed 20-word paragraphs):
    * incoming documents explode into paragraphs and the stateful
    * first-occurrence filter emits each distinct paragraph ONCE,
    * tagged with the smallest (doc_id, para_idx) ordinal that carried
    * it. The state key is the 128-bit two-seed xxhash64 of the
    * paragraph (mirroring the batch shuffle key), so the state store
    * holds one boolean per 16-byte hash instead of per 20-word string;
    * the text rides along only to be emitted with the first
    * occurrence. */
  def streamingParagraphDedup(docs: DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.Dataset[(String, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(col(textCol), " ")
    val nPar = ceil(size(words) / lit(20.0)).cast("int")
    val paras = transform(sequence(lit(0), nPar - 1),
      i => array_join(slice(words, i * 20 + 1, lit(20)), " "))
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(paras).as(Seq("para_idx", "para")))
      // ordinal orders (doc_id, para_idx) lexicographically; the
      // 100000-paragraph (2M-word) width is CHECKED, not assumed — an
      // overflowing document would silently collide ordinals across
      // documents and corrupt dedup attribution
      .select(
        concat_ws(":", xxhash64(col("para")),
          xxhash64(lit(1L), col("para"))).as("hk"),
        col("para"),
        when(col("para_idx") >= lit(100000),
          raise_error(concat(lit("paragraph ordinal overflow (>= 100000 "
            + "paragraphs) in doc "), col("doc_id"))).cast("long"))
          .otherwise(col("doc_id") * 100000 + col("para_idx")).as("ord"))
    exploded.as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, String, Long)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = it.minBy(_._3)
            Iterator.single(first._2 -> first._3)
          }
      }
  }

  /** Streaming incremental dedup — the streaming twin of the
    * `dedup_incremental` batch pass: arriving documents explode into
    * the same 20-word paragraphs; a driver-built Bloom filter over the
    * PREVIOUSLY-KEPT corpus's paragraph hashes (build it with
    * [[graft.pipeline.Dedup.boundedBloom]] so the driver-heap budget
    * stays fixed as the kept corpus grows) prefilters at scan
    * speed (codegen [[graft.functions.BloomMightContain]]) —
    * bloom-negative rows are definitely fresh (no false negatives) and
    * skip the static join entirely, while maybe-rows verify exactly
    * against the static old-paragraph hash table (stream-static left
    * join; a null match is a Bloom false positive, i.e. fresh). A
    * stateful 128-bit first-occurrence filter then dedups WITHIN the
    * stream, so each genuinely new paragraph emits exactly once with
    * its smallest (doc_id, para_idx) ordinal. State and join traffic
    * carry 16-byte hashes, never paragraph text. */
  def streamingIncrementalDedup(docs: DataFrame, oldParas: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      idCol: String, textCol: String)
      : org.apache.spark.sql.Dataset[(String, Long)] =
    streamingIncrementalDedup(docs, oldParas, Seq(bloom), idCol, textCol)

  /** Chain-aware variant: `blooms` are the per-root filters of an
    * exact sidecar CHAIN ([[graft.pipeline.DedupIndex.loadExactChain]]
    * — base/compaction + appended batch segments); the probe is their
    * OR (no false negatives, per-root or OR'd) and `oldParas` is the
    * matching union hash index. */
  def streamingIncrementalDedup(docs: DataFrame, oldParas: DataFrame,
      blooms: Seq[org.apache.spark.util.sketch.BloomFilter],
      idCol: String, textCol: String)
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    require(blooms.nonEmpty, "streamingIncrementalDedup: no blooms")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(col(textCol), " ")
    val nPar = ceil(size(words) / lit(20.0)).cast("int")
    val paras = transform(sequence(lit(0), nPar - 1),
      i => array_join(slice(words, i * 20 + 1, lit(20)), " "))
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(paras).as(Seq("para_idx", "para")))
      .select(col("para"),
        xxhash64(col("para")).as("h1"),
        xxhash64(lit(1L), col("para")).as("h2"),
        when(col("para_idx") >= lit(100000),
          raise_error(concat(lit("paragraph ordinal overflow (>= 100000 "
            + "paragraphs) in doc "), col("doc_id"))).cast("long"))
          .otherwise(col("doc_id") * 100000 + col("para_idx")).as("ord"))
    val mightBeOld = blooms
      .map(b => graft.functions.HashF.bloomMightContain(col("h1"), b))
      .reduce(_ || _)
    val definitelyFresh = exploded.filter(!mightBeOld)
    val verifiedFresh = exploded.filter(mightBeOld)
      .join(oldParas.select(col("h1"), col("h2"),
        lit(1).as("seen")), Seq("h1", "h2"), "left")
      .filter(col("seen").isNull).drop("seen")
    definitelyFresh.unionByName(verifiedFresh.select(
        definitelyFresh.columns.map(col).toIndexedSeq: _*))
      .select(concat_ws(":", col("h1"), col("h2")).as("hk"),
        col("para"), col("ord"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, String, Long)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = it.minBy(_._3)
            Iterator.single(first._2 -> first._3)
          }
      }
  }

  /** Streaming incremental NEAR-dup — the streaming twin of the
    * `dedup_incremental_minhash` batch pass, driven entirely by the
    * batch-persisted [[graft.pipeline.DedupIndex]] sidecar: arriving
    * docs compute their distinct word-bigram shingle set in one
    * codegen kernel per row ([[graft.functions.ShingleHashes]]), derive
    * the SAME 16-hash/4-band MinHash signature with per-row array
    * expressions (array_min over the affine-transformed set — value-
    * identical to the batch min() aggregate over exploded rows, since
    * both reduce the same distinct shingle set), band-equality-join the
    * STATIC sidecar band index for candidates, and verify exact
    * Jaccard per candidate against the sidecar's per-old-doc shingle
    * SETS (a static aggregation, done once) — all stateless per-row
    * algebra except the candidate-pair dedup (one pair can collide in
    * several bands), the single stateful op. Stream state and joins
    * carry 8-byte hashes only; the old corpus is never scanned and the
    * new text never leaves its scan projection. */
  def streamingIncrementalNearDup(docs: DataFrame, oldBands: DataFrame,
      oldShingles: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 16, bands: Int = 4)
      : DataFrame = {
    import graft.pipeline.TextHash
    val rows = numHashes / bands
    val withSh = docs.select(col(idCol).cast("long").as("new_id"),
      graft.functions.HashF.shingleHashes(col(textCol)).as("shn"))
    val sigCols = (0 until numHashes).map { k =>
      val (a, b) = TextHash.coeffs(k)
      array_min(transform(col("shn"),
        s => (s * lit(a) + lit(b)) % lit(TextHash.P))).as(s"mh$k")
    }
    val sigs = withSh.select(
      (col("new_id") +: col("shn") +: sigCols): _*)
    val bandKey = (b: Int) =>
      (0 until rows).foldLeft(lit(0L)) { (acc, r) =>
        acc * 131L + col(s"mh${b * rows + r}")
      }
    val banded = sigs.select(col("new_id"), col("shn"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("new_id"), col("shn"), col("bk.band"), col("bk.key"))
    val oldSets = oldShingles.groupBy(col("id").as("old_id"))
      .agg(collect_list(col("s")).as("sho"))
    banded
      .join(oldBands.select(col("id").as("old_id"), col("band"),
        col("key")), Seq("band", "key"))
      .dropDuplicates("new_id", "old_id")
      .join(oldSets, Seq("old_id"))
      .withColumn("common",
        size(array_intersect(col("shn"), col("sho"))).cast("long"))
      .withColumn("jaccard", round(col("common") /
        (size(col("shn")) + size(col("sho")) - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("common"), col("jaccard"))
  }

  /** Streaming trailing-window rolling aggregate (the streaming twin
    * of the cube_rolling_3d per-pixel trailing window): per event
    * type, each closed hour emits the trailing `steps`-hour event rate
    * — count-sum and mean over the hours PRESENT in the window
    * (xarray min_periods semantics: emit once `minPeriods` observed
    * hours are in frame).
    *
    * A chained aggregation can't follow flatMapGroupsWithState and
    * can't precede it either, so one stateful operator does both
    * jobs: open hour buckets accumulate counts in state; when the
    * watermark passes an hour's end the bucket closes, joins the
    * trailing frame, emits, and is pruned once no future frame can
    * reach it. Buckets close in event-time order because the
    * watermark is monotone — exactly the ordering the batch range
    * window sees. Event-time timeouts flush hours that become
    * closable on batches with no new rows for the key. */
  def rollingHourlyRate(events: DataFrame, steps: Int = 3,
                        minPeriods: Int = 1): org.apache.spark.sql.Dataset[RollingRate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val HourMs = 3600000L
    val typed = events
      .filter(col("ts").isNotNull) // a null ts would NPE at ts.getTime
      .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
      .withWatermark("ts", "1 hour")
      .as[(String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[RollBuckets, RollingRate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[RollBuckets]) =>
          var st = state.getOption.getOrElse(RollBuckets(Map.empty, Nil))
          it.foreach { case (_, ts) =>
            val h = Math.floorDiv(ts.getTime, HourMs) * HourMs
            st = st.copy(pending =
              st.pending.updated(h, st.pending.getOrElse(h, 0L) + 1))
          }
          val wm = state.getCurrentWatermarkMs()
          val closable = st.pending.keys.filter(_ + HourMs <= wm).toSeq.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[RollingRate]
          closable.foreach { h =>
            st = RollBuckets(st.pending - h, (h, st.pending(h)) :: st.closed)
            // ascending-start frame fold = the batch range-window order,
            // so the emitted double is bit-identical to the batch query
            val frame = st.closed
              .filter(b => b._1 > h - steps * HourMs && b._1 <= h)
              .sortBy(_._1)
            if (frame.length >= minPeriods) {
              val total = frame.map(_._2).sum
              out += RollingRate(key, new java.sql.Timestamp(h),
                frame.length.toLong, total, total.toDouble / frame.length)
            }
          }
          closable.lastOption.foreach { last =>
            st = st.copy(closed =
              st.closed.filter(_._1 > last - (steps - 1) * HourMs))
          }
          // closed history no future frame can reach is dead: any hour
          // closing after this point closes at > wm, so its frame floor
          // sits above wm - steps hours. Without this (and the timeout
          // below when nothing is pending) a key that stops producing
          // would hold its RollBuckets row for the query lifetime —
          // unbounded state growth on high-cardinality keys.
          st = st.copy(closed = st.closed.filter(_._1 > wm - steps * HourMs))
          if (st.pending.isEmpty && st.closed.isEmpty) state.remove()
          else {
            state.update(st)
            // wake when the earliest open hour becomes closable, or —
            // with nothing pending — when the closed history ages out
            val wake = st.pending.keys.minOption.map(_ + HourMs)
              .getOrElse(st.closed.map(_._1).max + steps * HourMs)
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          out.iterator
      }
  }

  /** Streaming count-min sketch maintenance — the streaming twin of
    * the `sketch_cms_heavy` batch build, and the sketch's REAL
    * production shape: the 4×256-cell token-frequency sketch updates
    * incrementally as documents arrive, so heavy-hitter estimates are
    * queryable mid-ingest without ever re-scanning the corpus. A plain
    * streaming aggregation keyed by (row, cell): the state store holds
    * AT MOST 1024 counters no matter how many tokens stream through —
    * bounded state by construction, no watermark needed (cells never
    * expire; the sketch is a running total). Cell arithmetic is
    * identical to the batch side (codegen poly_hash base hash through
    * the TextHash.coeffs affine family), so the drained stream's cells
    * equal the batch sketch bit-for-bit (StreamingSpec). */
  def streamingCmsCells(docs: DataFrame): DataFrame = {
    val ks = 50 to 53
    def cellCols(h: org.apache.spark.sql.Column) = ks.map { k =>
      val (a, b) = graft.pipeline.TextHash.coeffs(k)
      ((lit(a) * h + lit(b)) % lit(graft.pipeline.TextHash.P)) % lit(256)
    }
    docs
      .select(explode(split(col("text"), " ")).as("t"))
      .select(graft.functions.HashF.polyHash(col("t")).as("h"))
      .select(posexplode(array(cellCols(col("h")): _*)).as(Seq("r", "cell")))
      .groupBy("r", "cell")
      .agg(count(lit(1)).as("c"))
  }

  /** Streaming HyperLogLog register maintenance — the streaming twin
    * of the `sketch_hll_distinct` batch sketch, and HLL's production
    * shape: live DAU/uniques estimates mid-ingest without re-scanning
    * history. A plain streaming aggregation keyed by
    * (event_type, bucket) with a MAX: the state store holds at most
    * 5×256 single-byte registers no matter how many events stream
    * through — bounded by construction, no watermark (registers never
    * expire; monotone max is replay-idempotent, so at-least-once
    * delivery cannot corrupt the sketch). Key hashing is
    * [[graft.queries.SketchQueries.hllHash]], identical to the batch
    * side, so the drained stream's registers equal the batch
    * HllAggregator's bit-for-bit (StreamingSpec). */
  def streamingHllRegisters(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.queries.SketchQueries.hllHash(concat_ws(":", col("user_id"),
          expr("unix_micros(ts) div 86400000000"))).as("h"))
      .select(col("event_type"), (col("h") % 256).as("bucket"),
        graft.functions.HllF.hllRho(col("h")).as("rho"))
      .groupBy("event_type", "bucket")
      .agg(max(col("rho")).as("rho"))

  /** Streaming EXACT distinct maintenance — the streaming twin of the
    * `bitmap_distinct` batch rollup: per-event-type RoaringLite
    * bitmap state kept live as events arrive, so exact (not
    * estimated) distinct user-day counts are queryable mid-ingest.
    * One streaming aggregation with [[graft.functions.BitmapAggregator]]
    * as its UDAF: state is the compressed container set — 16 bits per
    * sparse key, 1 bit per dense key, and OR-merge is idempotent, so
    * at-least-once replay cannot inflate the count (the property raw
    * `COUNT(DISTINCT)` loses the moment it leaves batch). No
    * watermark: the bitmap is a running total. The drained stream's
    * state equals the batch aggregator's container-for-container
    * (StreamingSpec). */
  def streamingBitmapDistinct(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        (col("user_id") * 65536L +
          pmod(expr("unix_micros(ts) div 86400000000"), lit(65536L))).as("k"))
      .groupBy("event_type")
      .agg(graft.functions.BitmapF.bitmap(col("k")).as("state"))

  /** Streaming KMV (theta) sketch maintenance — the streaming twin of
    * the `sketch_kmv_distinct` / `sketch_set_overlap` batch sketches:
    * per-event-type k-minimum-values state kept live as events arrive,
    * so distinct-count and set-overlap estimates are queryable
    * mid-ingest. One streaming aggregation with the KmvArrayAggregator
    * as its UDAF: state is the k smallest distinct hashes per group —
    * bounded at k longs regardless of stream length, min-merge is
    * idempotent so replays cannot corrupt it, no watermark (the sketch
    * is a running total). Key hashing matches the batch side
    * ([[graft.queries.SketchQueries.hllHash]]), so the drained
    * stream's retained-hash arrays equal the batch sketch
    * element-for-element (StreamingSpec). */
  def streamingKmvSketch(events: DataFrame, k: Int = 128): DataFrame =
    events.filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.queries.SketchQueries.hllHash(concat_ws(":", col("user_id"),
          expr("unix_micros(ts) div 86400000000"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.KmvF.kmvArray(k)(col("h")).as("sketch"))

  /** Streaming twin of the batch events_markov transition extraction:
    * per-user first-order transitions (prev → next event type) emitted
    * as events arrive, with ONE tiny state row per user — the last
    * event type plus its (ts_us, event_id) ordinal. Within a
    * micro-batch rows are sorted by the same (ts_us, event_id) key the
    * batch lag window uses, so a drained in-order stream emits exactly
    * the batch transition multiset (StreamingSpec); a production
    * deployment layering this over late data would buffer behind a
    * watermark first (the statefulSessions pattern). State is
    * hash-partitioned by user across executors and checkpointed —
    * nothing gathers on one node. Downstream transition COUNTS are one
    * ordinary streaming aggregation over the emitted rows. */
  def streamingTransitions(events: DataFrame)
      : org.apache.spark.sql.Dataset[Transition] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // null user_id/event_id would crash the primitive decoder; the
    // batch twin's null-user partition produces pseudo-user
    // transitions — excluded here (streamingVelocity contract)
    val typed = events
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_id", "event_type")
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[LastEvent]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var prev = state.getOption
          val out = sorted.flatMap { case (_, tsUs, eid, et) =>
            val t = prev.map(p => Transition(uid, p.eventType, et))
            prev = Some(LastEvent(tsUs, eid, et))
            t
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming velocity counting — the streaming twin of the batch
    * events_velocity_flags RANGE window: per event, how many of the
    * SAME user's events landed in the trailing 10 minutes, as events
    * arrive. State per user is ONLY the timestamps inside the horizon
    * (evicted as it slides — bounded by horizon × peak rate, not by
    * stream length). In-order delivery assumed per the
    * streamingTransitions contract (rows sorted by (ts_us, event_id)
    * within each micro-batch; production would watermark-buffer late
    * data first). Drained stream ≡ the batch window, per event
    * (StreamingSpec). */
  def streamingVelocity(events: DataFrame, horizonUs: Long = 600000000L)
      : org.apache.spark.sql.Dataset[VelocityFlag] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us",
        "event_id")
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[RecentTs, VelocityFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[RecentTs]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var buf = state.getOption.map(_.ts.toVector).getOrElse(Vector.empty)
          val out = sorted.map { case (_, tsUs, _) =>
            buf = buf.dropWhile(_ < tsUs - horizonUs)
            // batch RANGE frame is [-horizon, -1]: strictly-before ts
            val nPrev = buf.count(t => t < tsUs)
            buf = buf :+ tsUs
            VelocityFlag(uid, tsUs, nPrev)
          }
          state.update(RecentTs(buf))
          out.iterator
      }
  }

  /** Stateful per-user sessionization via session windows: Spark's
    * built-in session_window gives the same 30-minute-gap semantics as
    * the batch sessionize query. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream conversion join: every (click, purchase) pair by the
    * same user with the purchase inside `[click_ts, click_ts+horizon)`.
    * Both sides carry a watermark, so the join's buffered state is
    * BOUNDED — a click older than the horizon past the watermark can
    * never match a future purchase and is evicted; without the time
    * condition the state would grow with the stream forever. Inner
    * joins emit matches immediately (the watermark bounds state, not
    * output latency). Works as a self-join of one source stream split
    * by event_type — Spark plans the two filters as two scans of the
    * same file source. The batch twin is the identical expression over
    * the batch table; StreamingSpec pins stream ≡ batch. */
  def conversionJoin(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("purchase_user"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    clicks.join(purchases,
      col("user_id") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension DataFrame (a batch parquet read) on user_id. The static
    * side is re-planned per micro-batch — Spark broadcasts it when
    * small, so enrichment adds no stream-side shuffle and no state
    * store at all (unlike a stream-stream join); this is THE pattern
    * for attaching reference data (user profiles, model scores,
    * allow-lists) to a live stream. */
  def enrich(events: DataFrame, dim: DataFrame,
             key: String = "user_id"): DataFrame =
    events.join(dim, Seq(key))

  /** At-least-once → effectively-once id dedup with bounded state:
    * `dropDuplicatesWithinWatermark` keeps each event_id's first
    * arrival and holds ids only until the watermark passes their event
    * time + delay, so replayed/duplicated deliveries inside the window
    * are dropped while state stays proportional to the window, not the
    * stream. (Plain `dropDuplicates` on a stream buffers every key
    * forever — unusable at 100 TB/day.) */
  def dedupWithinWatermark(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming A/B conversion counts — the sequential-testing twin of
    * [[graft.queries.StatQueries.abTestZ]]: per-user (seen, converted)
    * dedup state emits +1 deltas exactly once per user and per first
    * conversion, and a downstream per-variant aggregate accumulates
    * (n, c) so the experimentation dashboard can recompute the
    * two-proportion z after EVERY micro-batch instead of waiting for a
    * batch job. State is two booleans per user, hash-partitioned by
    * user_id across executors and checkpointed — the same bounded-state
    * contract as streamingDedup. The delta trick is what makes the
    * downstream aggregate correct across micro-batches: the stateful
    * stage emits changes, never totals, so SUM over the append stream
    * equals the batch distinct-user counts at any point in time. */
  def streamingAbConversions(events: DataFrame,
                             minValue: Double = 150.0): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // filter + when/otherwise mirror the batch abTestZ exactly: null
    // users fall outside both variants' sums there (variant NULL
    // matches neither when()), and a null value/event_type counts as
    // conv=0 via otherwise(0) — a bare cast("int") would carry the
    // null into the primitive decoder and crash
    val typed = events.filter(col("user_id").isNotNull)
      .select(col("user_id"),
        when(col("event_type") === "purchase" && col("value") > minValue,
          1).otherwise(0).as("conv"))
      .as[(Long, Int)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[AbUserState, AbDelta](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Int)],
         state: GroupState[AbUserState]) =>
          val prev = state.getOption.getOrElse(AbUserState(false, false))
          val anyConv = rows.exists(_._2 == 1)
          val dUser = if (prev.seen) 0L else 1L
          val dConv = if (!prev.converted && anyConv) 1L else 0L
          state.update(AbUserState(seen = true,
            converted = prev.converted || anyConv))
          if (dUser == 0 && dConv == 0) Iterator.empty
          else Iterator.single(AbDelta(user % 2, dUser, dConv))
      }
      .groupBy(col("variant"))
      .agg(sum(col("dUser")).as("n"), sum(col("dConv")).as("c"))
  }
}
