package graft

import org.apache.spark.sql.functions._

import graft.cube.{Cube, CubeGrid}
import graft.sources.ZarrStore

class ZarrSpec extends SparkSpec {

  test("zarr DSv2 round-trip matches the source cube (S1/S2)") {
    val grid = CubeGrid(32, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 7)
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toString
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", chunkT = 1, chunkY = 8,
      chunkX = 16, codec = "zlib")

    val back = ZarrStore.openCube(spark, s"$dir/c.zarr")
    assert(back.variables == Seq("v0", "v1"))
    assert(back.grid == grid)
    assert(back.df.count() == 32L * 16 * 3)

    def key(r: org.apache.spark.sql.Row): (Long, Int, Int) =
      (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2))
    val expected = cube.df
      .select(col("time"), col("y_idx"), col("x_idx"), col("lat"),
        col("lon"), col("v0"), col("v1"))
      .collect().map(r => key(r) -> r).toMap
    val got = back.df
      .select("time", "y_idx", "x_idx", "lat", "lon", "v0", "v1")
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(key(r))
      for (i <- 3 until 7)
        assert(java.lang.Double.compare(r.getDouble(i), e.getDouble(i)) == 0,
          s"cell ${key(r)} field $i: ${r.getDouble(i)} vs ${e.getDouble(i)}")
    }
  }

  test("zarr scan: chunk-aligned partitions, index and time pruning") {
    val grid = CubeGrid(32, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 4, Seq("v0"),
      nanEvery = 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toString
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", chunkT = 2, chunkY = 8,
      chunkX = 16, codec = "null")
    val df = ZarrStore.openCube(spark, s"$dir/c.zarr").df

    // full scan: (4/2) t-chunks × (16/8) y-chunks × (32/16) x-chunks
    assert(df.rdd.getNumPartitions == 2 * 2 * 2)
    // spatial window prunes whole chunks at plan time
    val window = df.filter(col("y_idx") < 8 && col("x_idx") >= 16)
    assert(window.rdd.getNumPartitions == 2 * 1 * 1)
    assert(window.count() == 8L * 16 * 4)
    // time range prunes t-chunks via the time axis
    val t1 = java.sql.Timestamp.valueOf("2017-01-04 00:00:00")
    val late = df.filter(col("time") >= t1)
    assert(late.rdd.getNumPartitions == 1 * 2 * 2)
    assert(late.count() == 32L * 16)
    // column pruning reaches the scan schema
    val pruned = df.select("time", "v0")
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema") || pruned.contains("time"))
  }

  test("zarr absent COORDINATE chunk fails loudly (no epoch-0 times)") {
    val grid = CubeGrid(8, 4, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toString
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", codec = "null")
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/c.zarr/time/0")))
    val e = intercept[IllegalStateException] {
      ZarrStore.read1dLongs(s"$dir/c.zarr", "time")
    }
    assert(e.getMessage.contains("absent"))
  }

  test("zarr missing chunks read as fill value (NaN)") {
    val grid = CubeGrid(8, 4, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 1, Seq("v0"),
      nanEvery = 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft-zarr").toString
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", chunkT = 1, chunkY = 4,
      chunkX = 4, codec = "null")
    val before = ZarrStore.openCube(spark, s"$dir/c.zarr").df
      .filter(col("v0").isNaN).count()
    // delete one chunk object: zarr semantics = all-fill
    val victim = java.nio.file.Paths.get(s"$dir/c.zarr/v0/0.0.1")
    assert(java.nio.file.Files.deleteIfExists(victim))
    val df = ZarrStore.openCube(spark, s"$dir/c.zarr").df
    val nanCells = df.filter(col("v0").isNaN).count()
    // the deleted 4×4 chunk (x 4..7, y 0..3) held no synthetic NaNs
    assert(nanCells == before + 4L * 4)
    assert(df.count() == 8L * 4)
  }

  test("blosc codec: lz4 + shuffle round-trips, memcpy fallback, errors") {
    import graft.sources.Blosc
    val rnd = new scala.util.Random(42)
    // shuffle/unshuffle identity incl. a tail that is not a multiple
    for (ts <- Seq(2, 4, 8); n <- Seq(0, 5, 128, 1027)) {
      val data = Array.fill(n)(rnd.nextInt().toByte)
      assert(Blosc.unshuffle(Blosc.shuffle(data, ts), ts).toSeq == data.toSeq,
        s"shuffle identity ts=$ts n=$n")
    }
    // lz4 block round-trip: compressible, incompressible, tiny
    for (data <- Seq(
        Array.fill(4096)(7.toByte),
        Array.tabulate(10000)(i => (i / 100).toByte),
        Array.fill(512)(rnd.nextInt().toByte),
        Array.fill(3)(1.toByte),
        Array.emptyByteArray)) {
      val comp = Blosc.lz4Compress(data)
      val out = new Array[Byte](data.length)
      assert(Blosc.lz4Decompress(comp, 0, comp.length, out, 0, data.length),
        s"lz4 decode failed for n=${data.length}")
      assert(out.toSeq == data.toSeq)
    }
    // full frames: doubles (typesize 8), multi-block, odd sizes
    for (n <- Seq(0, 16, 800, 64 * 1024 + 24, 200 * 1024 + 3)) {
      val data = Array.tabulate(n)(i => (i % 251).toByte)
      val frame = Blosc.encodeLz4(data, typesize = 8, blocksizeHint = 32 * 1024)
      assert(Blosc.decode(frame).toSeq == data.toSeq, s"frame n=$n")
    }
    // incompressible input falls back to a valid memcpy frame
    val noise = Array.fill(4096)(rnd.nextInt().toByte)
    val raw = Blosc.encodeLz4(noise, typesize = 8)
    assert(raw.length == 16 + noise.length && (raw(2) & 0x2) != 0)
    assert(Blosc.decode(raw).toSeq == noise.toSeq)
    // unsupported shapes fail loudly, not wrongly
    val blosclz = Blosc.encodeLz4(Array.fill(256)(1.toByte), 8).clone()
    blosclz(2) = (blosclz(2) & 0x1F).toByte // codec id 0 = blosclz
    assert(intercept[IllegalArgumentException](Blosc.decode(blosclz))
      .getMessage.contains("blosclz"))
    val bitshuf = Blosc.encodeLz4(Array.fill(256)(1.toByte), 8).clone()
    bitshuf(2) = (bitshuf(2) | 0x4).toByte
    assert(intercept[IllegalArgumentException](Blosc.decode(bitshuf))
      .getMessage.contains("bit-shuffle"))
  }

  test("blosc-lz4 zarr store reads bit-identical to the zlib store") {
    val grid = CubeGrid(32, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 7)
    val dir = java.nio.file.Files.createTempDirectory("graft-blosc").toString
    ZarrStore.writeZarr(cube, s"$dir/z.zarr", chunkT = 1, chunkY = 8,
      chunkX = 16, codec = "zlib")
    ZarrStore.writeZarr(cube, s"$dir/b.zarr", chunkT = 1, chunkY = 8,
      chunkX = 16, codec = "blosc")
    // the chunk objects really are blosc frames (header magic: version 2)
    val chunk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/b.zarr/v0/0.0.0"))
    assert(chunk(0) == 2 && ((chunk(2) >> 5) & 0x7) == 1) // lz4 codec id
    val cols = Seq("time", "y_idx", "x_idx", "lat", "lon", "v0", "v1")
    def rows(p: String): Seq[String] =
      ZarrStore.openCube(spark, p).df.select(cols.head, cols.tail: _*)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/b.zarr") == rows(s"$dir/z.zarr"))
    assert(rows(s"$dir/b.zarr").length == 32 * 16 * 3)
  }

  test("zarr v3 store reads identical to v2 (S2 v3)") {
    val grid = CubeGrid(16, 8, -2.0, 30.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-z3").toString
    ZarrStore.writeZarr(cube, s"$dir/v2.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8)
    ZarrStore.writeZarrV3(cube, s"$dir/v3.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8)
    // v3 layout on disk: zarr.json documents + nested c/ chunk keys
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(s"$dir/v3.zarr/v0/zarr.json")))
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(s"$dir/v3.zarr/v0/c/0/0/0")))
    val meta = ZarrStore.readArrayMeta(s"$dir/v3.zarr", "v0")
    assert(meta.chunks == Seq(1, 8, 8) && meta.comp == "gzip" &&
      meta.chunkKey(Seq(1, 0, 1)) == "c/1/0/1")

    def rows(p: String): Seq[String] =
      ZarrStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "lat", "lon", "v0", "v1")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/v3.zarr") == rows(s"$dir/v2.zarr"))
    assert(rows(s"$dir/v3.zarr").length == 16 * 8 * 3)

    // external stores have no graft grid attribute: the grid derives
    // from the lat/lon axes instead
    val root = java.nio.file.Paths.get(s"$dir/v3.zarr/zarr.json")
    java.nio.file.Files.writeString(root,
      """{"zarr_format": 3, "node_type": "group", "attributes": {}}""")
    ZarrStore.invalidateMeta(s"$dir/v3.zarr")
    val derived = ZarrStore.openCube(spark, s"$dir/v3.zarr")
    assert(derived.grid == grid)
    assert(derived.df.count() == 16L * 8 * 3)
  }

  test("zarr v3 sharding_indexed: ranged reads, missing-chunk fill") {
    val grid = CubeGrid(32, 16, 0.0, 20.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"),
      nanEvery = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-shard").toString
    ZarrStore.writeZarrV3(cube, s"$dir/plain.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8)
    ZarrStore.writeZarrV3(cube, s"$dir/shard.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8, shardChunks = Seq(1, 2, 2))
    // 2×2×4 = 16 inner chunks collapse into 2×1×2 = 4 shard objects
    def filesUnder(p: String): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
      finally s.close()
    }
    assert(filesUnder(s"$dir/shard.zarr/v0/c").length == 4)
    assert(filesUnder(s"$dir/plain.zarr/v0/c").length == 16)
    val meta = ZarrStore.readArrayMeta(s"$dir/shard.zarr", "v0")
    assert(meta.sharded && meta.chunks == Seq(1, 8, 8) &&
      meta.shardShape == Seq(1, 16, 16) && meta.shardIndexCrc)

    def rows(p: String): Seq[String] =
      ZarrStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/shard.zarr") == rows(s"$dir/plain.zarr"))
    // the scan still plans one partition per INNER chunk
    assert(ZarrStore.openCube(spark, s"$dir/shard.zarr")
      .df.rdd.getNumPartitions == 16)
    // a deleted shard object reads as fill, not an error
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/shard.zarr/v0/c/1/0/1")))
    val withHole = ZarrStore.readChunk(s"$dir/shard.zarr", "v0", meta,
      Seq(1, 0, 2))
    assert(withHole.forall(_.isNaN))
  }

  test("zstd decodes in zarr v2, v3 and blosc frames; snappy in blosc") {
    val grid = CubeGrid(16, 8, 0.0, 0.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"),
      nanEvery = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    ZarrStore.writeZarr(cube, s"$dir/ref.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8, codec = "zlib")
    ZarrStore.writeZarr(cube, s"$dir/v2z.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8, codec = "zstd")
    ZarrStore.writeZarrV3(cube, s"$dir/v3z.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8, codec = "zstd")
    def rows(p: String): Seq[String] =
      ZarrStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/v2z.zarr") == rows(s"$dir/ref.zarr"))
    assert(rows(s"$dir/v3z.zarr") == rows(s"$dir/ref.zarr"))

    // blosc frames with zstd / snappy inner codecs (one block, 1 split)
    def bloscFrame(codecId: Int, plain: Array[Byte],
                   comp: Array[Byte]): Array[Byte] = {
      val total = 16 + 4 + 4 + comp.length
      val b = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(2.toByte).put(1.toByte) // versions
      b.put((codecId << 5).toByte) // flags: no shuffle
      b.put(8.toByte) // typesize
      b.putInt(plain.length).putInt(plain.length).putInt(total)
      b.putInt(20) // block 0 start
      b.putInt(comp.length)
      b.put(comp)
      b.array()
    }
    val plain = Array.tabulate[Byte](512)(i => (i * 7 % 100).toByte)
    val viaZstd = bloscFrame(4, plain,
      com.github.luben.zstd.Zstd.compress(plain, 3))
    assert(graft.sources.Blosc.decode(viaZstd).toSeq == plain.toSeq)
    val viaSnappy = bloscFrame(2, plain,
      org.xerial.snappy.Snappy.compress(plain))
    assert(graft.sources.Blosc.decode(viaSnappy).toSeq == plain.toSeq)
  }

  test("consolidated .zmetadata: one metadata fetch serves the store") {
    val grid = CubeGrid(16, 8, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0", "v1"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zmeta").toString
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", chunkT = 1, chunkY = 8,
      chunkX = 8)
    val store = s"$dir/c.zarr"
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(store, ".zmetadata")))

    def metaCost(body: => Unit): Long = {
      ZarrStore.invalidateMeta(store)
      val before = ZarrStore.metaFileReads.get()
      body
      ZarrStore.metaFileReads.get() - before
    }
    def openAll(): Unit = {
      ZarrStore.variableNames(store)
      ZarrStore.readArrayMeta(store, "v0")
      ZarrStore.readArrayMeta(store, "v1")
      ZarrStore.readArrayMeta(store, "time")
    }
    // consolidated: exactly one store access (the .zmetadata read)
    assert(metaCost(openAll()) == 1L)
    // same data either way, and without .zmetadata every array pays
    val vars = ZarrStore.variableNames(store)
    val meta = ZarrStore.readArrayMeta(store, "v0")
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(store, ".zmetadata")))
    val plain = metaCost(openAll())
    assert(plain > 1L, s"expected >1 metadata reads, got $plain")
    assert(ZarrStore.variableNames(store) == vars)
    // NaN fill values defeat case-class equality; compare via toString
    assert(ZarrStore.readArrayMeta(store, "v0").toString == meta.toString)
    // cube still round-trips with the consolidated view gone
    ZarrStore.invalidateMeta(store)
    assert(ZarrStore.openCube(spark, store).df.count() == 16L * 8 * 2)
  }
}
