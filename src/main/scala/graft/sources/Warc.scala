package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException,
  InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) reader/writer in pure JVM — the Common Crawl
  * interchange format, i.e. the on-disk shape of the largest public
  * LLM pretraining corpora. A pipeline that can't ingest WARC can't
  * start from the web; this reader turns a directory of `.warc` /
  * `.warc.gz` shards into rows with the header fields a curation
  * pipeline filters on (type, URI, date, content-type, HTTP status)
  * plus the raw payload bytes.
  *
  * Format per record (warc-specifications, ISO 28500 §4):
  * {{{
  *   WARC/1.0<CRLF>
  *   Header-Name: value<CRLF> ...      (continuation lines fold)
  *   <CRLF>
  *   <Content-Length bytes of block>
  *   <CRLF><CRLF>
  * }}}
  * For `WARC-Type: response` records the block is an HTTP/1.1
  * message; the reader splits it into status / response headers /
  * body, because the body — not the HTTP envelope — is what
  * downstream text extraction wants.
  *
  * Compression: Common Crawl gzips EACH RECORD as its own gzip
  * member. `GZIPInputStream` transparently concatenates members, so
  * one sequential stream per file reads both conventions (whole-file
  * gzip and per-member gzip). The parallel unit is the FILE — exactly
  * how CC is meant to be consumed (90 k shard files per crawl, one
  * task each); no intra-file split is attempted because gzip members
  * are not seekable without an external index.
  *
  * The writer emits per-member-gzipped `resource` records (one
  * warcinfo header record first, as the spec prescribes), so exported
  * corpora are readable by any WARC tooling and by this reader —
  * round-tripped in WarcSpec.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_idx", LongType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType)))

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Read one CRLF-terminated header line as ISO-8859-1 (the header
    * charset the spec mandates); None at clean EOF before any byte. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(128)
    var prev = -1
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && !(prev == '\r' && b == '\n')) {
      buf.write(b)
      prev = b
      b = in.read()
    }
    val arr = buf.toByteArray
    val n = if (arr.nonEmpty && arr.last == '\r') arr.length - 1 else arr.length
    Some(new String(arr, 0, n, "ISO-8859-1"))
  }

  /** Parse a header block (terminated by an empty line) with
    * continuation-line folding. Names are case-insensitive per spec —
    * keys are lower-cased. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var line = readLine(in).getOrElse(
      throw new EOFException("EOF inside header block"))
    while (line.nonEmpty) {
      if ((line.startsWith(" ") || line.startsWith("\t")) && last != null) {
        out(last) = out(last) + " " + line.trim
      } else {
        val i = line.indexOf(':')
        require(i > 0, s"malformed header line: $line")
        last = line.substring(0, i).trim.toLowerCase
        out(last) = line.substring(i + 1).trim
      }
      line = readLine(in).getOrElse(
        throw new EOFException("EOF inside header block"))
    }
    out.toMap
  }

  /** Parse every record of one (possibly gzipped) WARC stream. The
    * stream closes itself when fully drained; when running inside a
    * Spark task it ALSO closes on task completion, so a limit/take
    * that abandons the iterator mid-file cannot leak the file handle
    * (or the gzip inflater's native window). */
  def parseStream(in0: InputStream, fileName: String): Iterator[Row] = {
    val in = new DataInputStream(
      if (fileName.endsWith(".gz")) new GZIPInputStream(in0) else in0)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    var idx = 0L
    new Iterator[Row] {
      private var nextRow: Row = advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = {
        val r = nextRow; nextRow = advance(); r
      }
      private def advance(): Row = {
        // skip blank separator lines, find the version line
        var ver = readLine(in)
        while (ver.exists(_.isEmpty)) ver = readLine(in)
        ver match {
          case None => in.close(); null
          case Some(v) =>
            require(v.startsWith("WARC/"),
              s"$fileName: expected WARC version line, got '$v'")
            val h = readHeaders(in)
            val len = h.getOrElse("content-length",
              sys.error(s"$fileName: record without Content-Length")).toLong
            require(len >= 0 && len <= Int.MaxValue,
              s"$fileName: unreasonable Content-Length $len")
            val block = new Array[Byte](len.toInt)
            in.readFully(block)
            val wtype = h.getOrElse("warc-type", null)
            // http response: split envelope from body
            val (status, httpCt, payload) =
              if (wtype == "response" &&
                  h.get("content-type").exists(_.startsWith("application/http")))
                splitHttp(block)
              else (null: Integer, null: String, block)
            val r = Row(fileName, idx, wtype,
              h.getOrElse("warc-record-id", null),
              h.getOrElse("warc-target-uri", null),
              h.getOrElse("warc-date", null),
              h.getOrElse("content-type", null),
              len, status, httpCt, payload)
            idx += 1
            r
        }
      }
    }
  }

  /** Split an HTTP/1.1 message block into (status, content-type,
    * body). Malformed envelopes degrade to a null status with the
    * whole block as payload — a curation pipeline counts those, it
    * doesn't crash on them. */
  private def splitHttp(block: Array[Byte])
      : (Integer, String, Array[Byte]) = {
    // find the \r\n\r\n envelope terminator
    var i = 0
    var end = -1
    while (end < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') end = i
      i += 1
    }
    if (end < 0) return (null, null, block)
    val head = new String(block, 0, end, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status: Integer = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ").lift(1))
      .flatMap(s => scala.util.Try(Integer.valueOf(s.trim)).toOption)
      .orNull
    val ct = lines.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim)
      .orNull
    (status, ct, java.util.Arrays.copyOfRange(block, end + 4, block.length))
  }

  /** Read every `*.warc` / `*.warc.gz` under `dir` — one task per
    * shard file, shard list driver-side (metadata only). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = ShardIo.listShards(spark, dir)(n =>
      n.endsWith(".warc") || n.endsWith(".warc.gz"))
    // parseStream is LAZY (iterator) — it closes via a task-completion
    // listener, per the ShardIo ownership contract
    val rows = ShardIo.perShardRows(spark, files)(parseStream)
    spark.createDataFrame(rows, schema)
  }

  private def record(headers: Seq[(String, String)],
                     block: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(block.length + 256)
    out.write("WARC/1.0\r\n".getBytes("US-ASCII"))
    (headers :+ ("Content-Length" -> block.length.toString)).foreach {
      case (k, v) =>
        out.write(s"$k: $v\r\n".getBytes("ISO-8859-1"))
    }
    out.write(Crlf)
    out.write(block)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** deterministic record id from the shard/record position (the spec
    * wants urn:uuid; determinism matters more here than uuid-ness,
    * and any opaque unique URI is legal per §5.2) */
  private def recId(pid: Int, idx: Long): String =
    f"<urn:graft:$pid%05d-$idx%08d>"

  /** Write each partition of (uri, payload) rows as one
    * per-member-gzipped `part-NNNNN.warc.gz` under `dir`, leading
    * with a warcinfo record. Returns the shard manifest, collected —
    * the write lineage is severed exactly like TfRecord.writeShards.
    * `date` is caller-supplied (ISO-8601) so output is reproducible. */
  def writeShards(df: DataFrame, uriCol: String, payloadCol: String,
                  dir: String, date: String): DataFrame = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rows = df.select(org.apache.spark.sql.functions.col(uriCol),
        org.apache.spark.sql.functions.col(payloadCol).cast("binary")).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val path = new Path(dir, f"part-$pid%05d.warc.gz")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        // ONE zlib Deflater per partition, reset between members — a
        // fresh GZIPOutputStream per record leaks a native deflater
        // window until finalization (real memory pressure at
        // Common-Crawl record counts). end() runs on task completion
        // even if the write aborts. Framing replicates
        // java.util.zip.GZIPOutputStream byte for byte: 10-byte
        // header, raw deflate stream, CRC32 + ISIZE little-endian.
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => deflater.end()))
        val gzHeader = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
          0, 0, 0, 0, 0, 0, 0)
        def member(bytes: Array[Byte]): Int = {
          out.write(gzHeader)
          val dos = new java.util.zip.DeflaterOutputStream(
            out, deflater, 8192, false)
          dos.write(bytes); dos.finish()
          val crc = new java.util.zip.CRC32()
          crc.update(bytes)
          // gzip trailer: CRC32 + ISIZE, both LE (shared Le codec)
          out.write(Le.bytes32(crc.getValue.toInt))
          out.write(Le.bytes32(bytes.length))
          deflater.reset()
          bytes.length
        }
        val info = "software: graft\r\nformat: WARC File Format 1.0\r\n"
          .getBytes("US-ASCII")
        member(record(Seq(
          "WARC-Type" -> "warcinfo",
          "WARC-Record-ID" -> recId(pid, -1),
          "WARC-Date" -> date,
          "Content-Type" -> "application/warc-fields"), info))
        var n = 0L
        var bytes = 0L
        it.foreach { r =>
          val payload = r.getAs[Array[Byte]](1)
          bytes += member(record(Seq(
            "WARC-Type" -> "resource",
            "WARC-Record-ID" -> recId(pid, n),
            "WARC-Date" -> date,
            "WARC-Target-URI" -> r.getString(0),
            "Content-Type" -> "application/octet-stream"), payload))
          n += 1
        }
        out.close()
        Iterator(Row(path.getName, n, bytes))
      }
    val manifest = rows.collect().toIndexedSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(manifest, 1),
      StructType(Seq(
        StructField("file", StringType), StructField("n_records", LongType),
        StructField("n_record_bytes", LongType))))
  }
}
