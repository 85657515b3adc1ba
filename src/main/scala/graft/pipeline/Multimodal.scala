package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque BINARY columns with a typed metadata struct;
  * decode / feature-extraction runs as a partition-local batch loop
  * (`mapPartitions` over a typed Dataset — the Scala equivalent of the
  * Python-side `mapInPandas` batch shape).
  *
  * ==== STUB BOUNDARY ====
  * The actual media codecs (JPEG/PNG/audio decoders) are NOT available
  * in this container, so [[decodeStub]] / [[resizeStub]] /
  * [[frameSampleStub]] are deterministic fakes over the raw bytes,
  * clearly marked. Everything around them — schema, batching,
  * partitioning, feature vector shape — is the real distributed
  * plumbing and is tested.
  */
object Multimodal {

  /** one media payload: opaque bytes + typed metadata */
  final case class MediaItem(id: Long, kind: String, content: Array[Byte],
                             meta: Map[String, String])

  final case class MediaFeatures(id: Long, kind: String, nBytes: Int,
                                 features: Array[Float])

  /** Attach media schema to any (id, binary) pair: the payload column
    * stays opaque; metadata is computed without decoding. */
  def asMedia(df: DataFrame, idCol: String, binCol: String,
              kind: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("content"))
      .withColumn("kind", lit(kind))
      .withColumn("meta", map(
        lit("n_bytes"), octet_length(col("content")).cast("string")))
      .as[MediaItem]
  }

  /** STUB: deterministic fake "decode + feature extraction" — an 8-dim
    * byte-histogram moment vector. A real deployment swaps this single
    * function for a codec call; the distributed shape is unchanged. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val feats = new Array[Float](8)
    if (content.isEmpty) return feats
    var i = 0
    while (i < content.length) {
      val b = content(i) & 0xff
      feats(b % 8) += 1f
      i += 1
    }
    var j = 0
    while (j < 8) { feats(j) = feats(j) / content.length; j += 1 }
    feats
  }

  /** STUB: "resize" = deterministic byte subsampling to `n` bytes. */
  def resizeStub(content: Array[Byte], n: Int): Array[Byte] =
    if (content.length <= n) content
    else Array.tabulate(n)(i => content((i.toLong * content.length / n).toInt))

  /** STUB: "video frame sampling" = k evenly spaced byte windows. */
  def frameSampleStub(content: Array[Byte], frames: Int,
                      frameBytes: Int): Seq[Array[Byte]] =
    (0 until frames).map { f =>
      val off = ((content.length.toLong * f) / frames).toInt
      content.slice(off, math.min(off + frameBytes, content.length))
    }

  /** Batched partition-local feature extraction: items are processed in
    * fixed-size batches (the mapInPandas batch shape) so a real decoder
    * can amortize per-batch model/codec setup. No shuffle: feature
    * extraction is embarrassingly parallel over existing partitions. */
  def extractFeatures(items: Dataset[MediaItem],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec/model here (stubbed)
        batch.iterator.map { m =>
          MediaFeatures(m.id, m.kind, m.content.length, decodeStub(m.content))
        }
      }
    }
  }
}
