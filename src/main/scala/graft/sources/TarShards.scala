package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shard writer/reader: each training sample is a
  * group of members sharing a key (`<key>.txt`, `<key>.json`,
  * `<key>.jpg`, …) inside plain POSIX ustar shards — the loader-side
  * convention of the WebDataset library, readable by `tar` itself and
  * by every WebDataset/torchdata pipeline. Pure-JVM ustar encode /
  * decode (public POSIX.1-1988 layout), no external tooling.
  *
  * Scale shape mirrors [[TfRecord]]: one shard per Spark partition,
  * streamed through the Hadoop FileSystem inside `mapPartitions`;
  * callers choose the partitioning (hash by key for deterministic
  * membership). Member payloads never land on the driver.
  */
object TarShards {

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes("US-ASCII")
  }

  /** One ustar header block for a regular file. */
  def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100,
      s"member name too long for ustar name field: $name")
    val h = new Array[Byte](Block)
    def put(s: Array[Byte], off: Int): Unit =
      System.arraycopy(s, 0, h, off, s.length)
    put(name.getBytes("UTF-8"), 0)
    put(octal(420 /* 0644 */, 8), 100)
    put(octal(0, 8), 108)
    put(octal(0, 8), 116)
    put(octal(size, 12), 124)
    put(octal(0, 12), 136)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                                    // regular file
    // POSIX magic "ustar\0" + version "00"
    put(Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0'), 257)
    val sum = h.map(_ & 0xFF).sum
    put((f"$sum%06o" + "\u0000 ").getBytes("US-ASCII"), 148)
    h
  }

  /** Write (key, members) rows as WebDataset tar shards: one
    * `shard-NNNNN.tar` per partition, members emitted as
    * `<key>.<ext>` in sorted ext order (loaders expect a sample's
    * members adjacent). Returns the materialized shard manifest. */
  def writeShards(df: DataFrame, keyCol: String, membersCol: String,
                  dir: String): DataFrame = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = df
      .select(col(keyCol).cast("string"),
        col(membersCol).cast("map<string,binary>"))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val path = new Path(dir, f"shard-$pid%05d.tar")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        var nSamples = 0L
        var nMembers = 0L
        it.foreach { r =>
          val key = r.getString(0)
          val members = r.getMap[String, Array[Byte]](1)
          members.toSeq.sortBy(_._1).foreach { case (ext, payload) =>
            out.write(header(s"$key.$ext", payload.length.toLong))
            out.write(payload)
            val tail = payload.length % Block
            if (tail != 0) out.write(new Array[Byte](Block - tail))
            nMembers += 1
          }
          nSamples += 1
        }
        out.write(new Array[Byte](2 * Block)) // end-of-archive
        out.close()
        Iterator(Row(path.getName, nSamples, nMembers))
      }
    val manifest = rows.collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifest, 1),
      StructType(Seq(
        StructField("file", StringType), StructField("n_samples", LongType),
        StructField("n_members", LongType))))
  }

  /** Read every `*.tar` under `dir` back as (file, name, payload),
    * one task per shard ([[ShardIo]] scaffolding). Accepts any ustar
    * archive with regular-file members (including GNU tar output). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = ShardIo.listShards(spark, dir)(_.endsWith(".tar"))
    val rows = ShardIo.perShardRows(spark, files)(parseStream)
    spark.createDataFrame(rows, StructType(Seq(
      StructField("file", StringType), StructField("name", StringType),
      StructField("payload", BinaryType))))
  }

  /** Strict one-shard parse: (shard, member name, payload) rows.
    * Closes the stream (the [[ShardIo.perShardRows]] ownership
    * contract). */
  def parseStream(in0: java.io.InputStream, shard: String): Seq[Row] = {
    val in = in0 match {
      case d: java.io.DataInputStream => d
      case other => new java.io.DataInputStream(other)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      var done = false
      while (!done) {
        val h = new Array[Byte](Block)
        in.readFully(h)
        if (h.forall(_ == 0)) done = true // end-of-archive block
        else {
          val name = new String(h, 0, 100, "UTF-8").takeWhile(_ != 0)
          val sizeStr = new String(h, 124, 12, "US-ASCII")
            .takeWhile(c => c != 0 && c != ' ')
          val size = java.lang.Long.parseLong(sizeStr, 8)
          val stored = new String(h, 148, 8, "US-ASCII")
            .filter(c => c >= '0' && c <= '7')
          java.util.Arrays.fill(h, 148, 156, ' '.toByte)
          val sum = h.map(_ & 0xFF).sum
          require(java.lang.Long.parseLong(stored, 8) == sum,
            s"$shard: tar header checksum mismatch for '$name'")
          val payload = new Array[Byte](size.toInt)
          in.readFully(payload)
          val tail = size % Block
          if (tail != 0) in.skipBytes((Block - tail).toInt)
          if (h(156) == '0' || h(156) == 0) // regular file members
            out += Row(shard, name, payload)
        }
      }
    } finally in.close()
    out.toSeq
  }
}
