package graft.sources

import java.util.zip.CRC32C

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord shard writer/reader — the standard training-data
  * interchange format (TensorFlow `tf.data.TFRecordDataset`), written
  * and read in pure JVM so exported corpora feed any training stack
  * without a TensorFlow dependency on the Spark side.
  *
  * Wire format per record (tensorflow/core/lib/io/record_writer.h —
  * public spec):
  *   uint64 length (LE) | uint32 masked_crc32c(length bytes) (LE)
  *   | payload bytes    | uint32 masked_crc32c(payload) (LE)
  * with masked_crc = rotr15(crc32c(x)) + 0xa282ead8 — JDK ≥ 9 ships
  * CRC32C, so no native or external code.
  *
  * Scale shape: one shard file per Spark partition, written inside
  * `mapPartitions` through the Hadoop FileSystem (works on any scheme
  * the cluster mounts — local, HDFS, object stores via the blob seam).
  * Callers pick the partitioning; for deterministic shard membership
  * hash-partition by a content hash (see TfRecordSpec), never
  * round-robin `repartition(n)` (order-dependent).
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  /** TF's masked CRC32C of `bytes`, as an unsigned 32-bit value. */
  def maskedCrc(bytes: Array[Byte]): Long = {
    val c = new CRC32C
    c.update(bytes, 0, bytes.length)
    val crc = c.getValue
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    (rot + MaskDelta) & 0xFFFFFFFFL
  }

  /** One serialized record: length, length-crc, payload, payload-crc.
    * LE words via the shared [[Le]] codec (maskedCrc is an unsigned
    * 32-bit value — the truncating toInt keeps its low 32 bits, which
    * is exactly the wire word). */
  def encode(payload: Array[Byte]): Array[Byte] = {
    val len = Le.bytes64(payload.length.toLong)
    len ++ Le.bytes32(maskedCrc(len).toInt) ++ payload ++
      Le.bytes32(maskedCrc(payload).toInt)
  }

  /** Write each partition of `df`'s single binary column as one
    * `part-NNNNN.tfrecord` under `dir`. Returns the shard manifest
    * (file, n_records, n_bytes) — an ACTION (the write runs here). */
  def writeShards(df: DataFrame, payloadCol: String, dir: String): DataFrame = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = df.select(col(payloadCol).cast("binary")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val path = new Path(dir, f"part-$pid%05d.tfrecord")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        var n = 0L
        var bytes = 0L
        it.foreach { r =>
          val rec = encode(r.getAs[Array[Byte]](0))
          out.write(rec)
          n += 1
          bytes += rec.length
        }
        out.close()
        Iterator(Row(path.getName, n, bytes))
      }
    // materialize NOW (the write is the point), and return the tiny
    // manifest as a local DataFrame so no later action can re-run the
    // write lineage
    val manifest = rows.collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifest, 1),
      StructType(Seq(
        StructField("file", StringType), StructField("n_records", LongType),
        StructField("n_bytes", LongType))))
  }

  /** Read every `*.tfrecord` under `dir` back as (file, record_idx,
    * payload), verifying both CRCs per record — a corrupt length or
    * payload fails loudly, never yields garbage. Distributed: shards
    * are listed driver-side (file metadata only) and parsed inside
    * tasks, one task per shard. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = ShardIo.listShards(spark, dir)(_.endsWith(".tfrecord"))
    val rows = ShardIo.perShardRows(spark, files)(parseStream)
    spark.createDataFrame(rows, StructType(Seq(
      StructField("file", StringType), StructField("record_idx", LongType),
      StructField("payload", BinaryType))))
  }

  /** Strict one-shard parse with both CRCs verified per record.
    * Closes the stream (the [[ShardIo.perShardRows]] ownership
    * contract). */
  def parseStream(in0: java.io.InputStream, shard: String): Seq[Row] = {
    val in = in0 match {
      case d: java.io.DataInputStream => d
      case other => new java.io.DataInputStream(other)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      var idx = 0L
      var done = false
      while (!done) {
        val lenB = new Array[Byte](8)
        val first = in.read(lenB, 0, 8)
        if (first < 0) done = true
        else {
          var off = first
          while (off < 8) {
            val k = in.read(lenB, off, 8 - off)
            require(k > 0, s"$shard: truncated length at record $idx")
            off += k
          }
          val lenCrc = new Array[Byte](4)
          in.readFully(lenCrc)
          require((Le.read32(lenCrc) & 0xffffffffL) == maskedCrc(lenB),
            s"$shard: length CRC mismatch at record $idx")
          val len = Le.read64(lenB)
          require(len >= 0 && len <= Int.MaxValue,
            s"$shard: unreasonable record length $len at record $idx")
          val payload = new Array[Byte](len.toInt)
          in.readFully(payload)
          val payCrc = new Array[Byte](4)
          in.readFully(payCrc)
          require((Le.read32(payCrc) & 0xffffffffL) == maskedCrc(payload),
            s"$shard: payload CRC mismatch at record $idx")
          out += Row(shard, idx, payload)
          idx += 1
        }
      }
    } finally in.close()
    out.toSeq
  }
}
