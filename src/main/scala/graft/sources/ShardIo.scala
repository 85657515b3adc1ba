package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}

/** Shared scaffolding for the per-file shard readers (tar / tfrecord /
  * warc / arrows): one driver-side listing (metadata only, never
  * payload bytes), then ONE task per shard file — the natural parallel
  * unit for frame formats without internal split points, and the shape
  * all four readers re-implemented privately before this existed.
  */
object ShardIo {

  /** Shard files directly under `dir` whose NAME passes `keep`, sorted
    * for deterministic task order. */
  def listShards(spark: SparkSession, dir: String)
                (keep: String => Boolean): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(base).map(_.getPath)
      .filter(p => keep(p.getName)).map(_.toString).sorted.toIndexedSeq
  }

  /** One task per shard: open the file and hand the stream to `parse`.
    *
    * STREAM OWNERSHIP stays with `parse`: a strict parser closes in its
    * own finally; a lazy one (an Iterator still draining when this
    * flatMap returns, like Warc's) registers a task-completion listener
    * instead. The helper cannot close centrally without breaking the
    * lazy case.
    */
  def perShardRows(spark: SparkSession, files: Seq[String])
                  (parse: (java.io.InputStream, String) => IterableOnce[Row])
      : RDD[Row] = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length))
      .flatMap { f =>
        val p = new Path(f)
        parse(p.getFileSystem(conf.value).open(p), p.getName)
      }
  }
}

/** Little-endian codec primitives shared by the frame formats
  * (tfrecord length/CRC words, gzip trailers, Arrow IPC headers) —
  * each reader had a private re-implementation. Reads are exact-width;
  * callers wanting unsigned semantics widen (`read32(b) & 0xffffffffL`).
  */
object Le {
  def bytes32(v: Int): Array[Byte] = {
    val a = new Array[Byte](4)
    var i = 0
    while (i < 4) { a(i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
    a
  }

  def bytes64(v: Long): Array[Byte] = {
    val a = new Array[Byte](8)
    var i = 0
    while (i < 8) { a(i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
    a
  }

  def read32(b: Array[Byte], off: Int = 0): Int = {
    var v = 0; var i = 0
    while (i < 4) { v |= (b(off + i) & 0xFF) << (8 * i); i += 1 }
    v
  }

  def read64(b: Array[Byte], off: Int = 0): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (b(off + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }
}
