package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TarShards

class TarShardsSpec extends SparkSpec {

  private def stage(dir: String) = {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
      .select(col("doc_id").cast("string").as("key"),
        map(
          lit("txt"), encode(col("text"), "utf-8"),
          lit("json"), encode(concat(lit("{\"lang\":\""), col("lang"),
            lit("\",\"source\":\""), col("source"), lit("\"}")), "utf-8"))
          .as("members"))
      .repartition(2, col("key"))
    (docs, TarShards.writeShards(docs, "key", "members", dir))
  }

  test("WebDataset tar shards round-trip through our reader") {
    val dir = Files.createTempDirectory("graft-wds").toString
    val (docs, manifest) = stage(dir)
    val m = manifest.collect()
    assert(m.map(_.getLong(1)).sum == 50L)  // samples
    assert(m.map(_.getLong(2)).sum == 100L) // members (txt + json each)
    val back = TarShards.read(spark, dir)
    assert(back.count() == 100L)
    // payloads byte-exact: compare the txt members against the source
    val txts = back.filter(col("name").endsWith(".txt"))
      .select(regexp_replace(col("name"), "\\.txt$", "").as("key"),
        sha2(col("payload"), 256).as("h"))
    val want = docs.select(col("key"),
      sha2(element_at(col("members"), "txt"), 256).as("h"))
    assert(txts.exceptAll(want).isEmpty && want.exceptAll(txts).isEmpty)
  }

  test("corrupt tar shards fail loudly: header flip and truncation") {
    val dir = Files.createTempDirectory("graft-wds3").toString
    stage(dir)
    val f = Paths.get(dir, "shard-00000.tar")
    val bytes = Files.readAllBytes(f)
    // 1) flip a byte inside the first header's name field
    val flipped = bytes.clone()
    flipped(3) = (flipped(3) ^ 0x01).toByte
    val d1 = Files.createTempDirectory("graft-wds3a").toString
    Files.write(Paths.get(d1, "bad.tar"), flipped)
    val e1 = intercept[org.apache.spark.SparkException] {
      TarShards.read(spark, d1).count()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage)
      .getOrElse("")).contains("checksum mismatch"))
    // 2) truncate mid-member: EOF instead of silent partial data
    val d2 = Files.createTempDirectory("graft-wds3b").toString
    Files.write(Paths.get(d2, "trunc.tar"),
      java.util.Arrays.copyOf(bytes, 700))
    intercept[org.apache.spark.SparkException] {
      TarShards.read(spark, d2).count()
    }
  }

  test("GNU tar reads our shards; we read GNU tar's output (interop)") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft-wds2").toString
    stage(dir)
    // 1) system tar lists and extracts our shard without complaint
    val listing = Seq("tar", "-tf", s"$dir/shard-00000.tar").!!
    assert(listing.linesIterator.forall(l =>
      l.endsWith(".txt") || l.endsWith(".json")))
    val xdir = Files.createTempDirectory("graft-wds2x").toString
    assert(Seq("tar", "-xf", s"$dir/shard-00000.tar", "-C", xdir).! == 0)
    val extracted = new java.io.File(xdir).list().toSeq
    assert(extracted.nonEmpty &&
      extracted.size == listing.linesIterator.size)
    // 2) an archive GNU tar creates from those files parses back
    val gdir = Files.createTempDirectory("graft-wds2g").toString
    assert(Seq("bash", "-c",
      s"cd $xdir && tar --format=ustar -cf $gdir/gnu.tar *").! == 0)
    val back = TarShards.read(spark, gdir).collect()
    assert(back.length == extracted.size)
    back.foreach { r =>
      val onDisk = Files.readAllBytes(Paths.get(xdir, r.getString(1)))
      assert(java.util.Arrays.equals(onDisk, r.getAs[Array[Byte]]("payload")),
        s"member ${r.getString(1)} differs from GNU tar extraction")
    }
  }
}
