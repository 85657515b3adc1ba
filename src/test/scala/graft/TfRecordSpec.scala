package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TfRecord

class TfRecordSpec extends SparkSpec {

  test("masked CRC32C matches the published TFRecord test vector") {
    // crc32c("") = 0 → masked = rotr15(0) + 0xa282ead8 = 0xa282ead8
    assert(TfRecord.maskedCrc(Array.emptyByteArray) == 0xa282ead8L)
    // crc32c of 32 zero bytes is a standard RFC 3720 vector: 0x8a9136aa
    val zeros = new Array[Byte](32)
    val c = new java.util.zip.CRC32C
    c.update(zeros, 0, 32)
    assert(c.getValue == 0x8a9136aaL)
  }

  test("documents round-trip through TFRecord shards byte-exactly") {
    val dir = Files.createTempDirectory("graft-tfr").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      // deterministic shard membership: hash-partition by content hash,
      // never round-robin repartition(n) (order-dependent)
      .repartition(4, graft.functions.HashF.polyHash(col("text")))
    val manifest = TfRecord.writeShards(docs, "payload", dir)
    val m = manifest.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(m.map(_._2).sum == docs.count())
    assert(m.length == 4)
    // read back: every payload survives byte-exactly (multiset compare)
    val back = TfRecord.read(spark, dir)
      .select(sha2(col("payload"), 256).as("h"))
      .groupBy("h").count()
    val orig = docs.select(sha2(col("payload"), 256).as("h"))
      .groupBy("h").count()
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("a flipped byte is detected as CRC corruption, not silent data") {
    val dir = Files.createTempDirectory("graft-tfr-bad").toString
    import spark.implicits._
    val df = Seq("hello world", "tfrecord integrity").toDF("t")
      .select(encode(col("t"), "utf-8").as("payload")).coalesce(1)
    TfRecord.writeShards(df, "payload", dir)
    val f = Paths.get(dir, "part-00000.tfrecord")
    val bytes = Files.readAllBytes(f)
    bytes(14) = (bytes(14) ^ 0x01).toByte // inside the first payload
    Files.write(f, bytes)
    // remove Hadoop's local-FS .crc sidecar so the RECORD-level CRC is
    // what fires (object stores have no sidecar — the record CRC is
    // the only integrity layer there)
    Files.deleteIfExists(Paths.get(dir, ".part-00000.tfrecord.crc"))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecord.read(spark, dir).count()
    }
    assert(e.getMessage.contains("CRC mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("CRC mismatch")))
  }
}
