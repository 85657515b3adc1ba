package graft

import org.apache.spark.sql.functions._

import graft.cube.{Cube, CubeGrid, CubeIngest}
import graft.sources.{Hdf5, NetcdfStore}

class Hdf5Spec extends SparkSpec {

  private def writeFixture(dir: String): (CubeGrid, graft.cube.CubeFrame) = {
    val grid = CubeGrid(16, 8, 10.0, -4.0, 0.5, latAscending = false)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/c.nc", chunkY = 8, chunkX = 8)
    (grid, cube)
  }

  test("nc4/hdf5 DSv2 round-trip matches the source cube (S1 NC4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val (grid, cube) = writeFixture(dir)
    assert(Hdf5.isHdf5(s"$dir/c.nc"))

    val back = CubeIngest.open(spark, s"$dir/c.nc")
    assert(back.variables == Seq("v0", "v1"))
    assert(back.grid == grid)
    assert(back.df.count() == 16L * 8 * 3)

    def key(r: org.apache.spark.sql.Row): (Long, Int, Int) =
      (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2))
    val expected = cube.df.select(col("time"), col("y_idx"), col("x_idx"),
        col("lat"), col("lon"), col("v0"), col("v1"))
      .collect().map(r => key(r) -> r).toMap
    val got = back.df.select("time", "y_idx", "x_idx", "lat", "lon",
      "v0", "v1").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(key(r))
      for (i <- 3 until 7)
        assert(java.lang.Double.compare(r.getDouble(i), e.getDouble(i)) == 0,
          s"cell ${key(r)} field $i")
    }
  }

  test("nc4 reads bit-identical to the classic path for the same cube") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val grid = CubeGrid(12, 6, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("sst"),
      nanEvery = 7)
    Hdf5.writeHdf5(cube, s"$dir/c4.nc", chunkY = 4, chunkX = 8)
    NetcdfStore.writeNetcdf(cube, s"$dir/c3.nc")
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "lat", "lon", "sst")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/c4.nc") == rows(s"$dir/c3.nc"))
    assert(rows(s"$dir/c4.nc").length == 12 * 6 * 2)
  }

  test("nc4 scan: partitions follow the stored chunk grid and prune") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val grid = CubeGrid(16, 8, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 4, Seq("v0"),
      nanEvery = 1000)
    Hdf5.writeHdf5(cube, s"$dir/c.nc", chunkY = 8, chunkX = 8)
    val df = NetcdfStore.openCube(spark, s"$dir/c.nc").df
    // chunks (1, 8, 8) over (4, 8, 16) → 4 × 1 × 2 = 8 partitions
    assert(df.rdd.getNumPartitions == 8)
    val t1 = java.sql.Timestamp.valueOf("2017-01-03 00:00:00")
    val late = df.filter(col("time") >= t1 && col("x_idx") < lit(8))
    assert(late.rdd.getNumPartitions == 2) // 2 times × 1 x-chunk
    assert(late.count() == 8L * 8 * 2)
  }

  test("hdf5 metadata: chunked shuffle+deflate layout is what we wrote") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    writeFixture(dir)
    val f = Hdf5.open(s"$dir/c.nc")
    assert(f.datasets.keySet == Set("lat", "lon", "time", "v0", "v1"))
    val v0 = f.datasets("v0")
    assert(v0.shape == Seq(3, 8, 16))
    assert(v0.chunkDims == Seq(1, 8, 8))
    assert(v0.filters.map(_.id) == Seq(2, 1)) // shuffle then deflate
    assert(v0.dtype.size == 8 && v0.dtype.littleEndian)
    val lat = f.datasets("lat")
    assert(lat.layoutClass == 1 && lat.shape == Seq(8))
    // coordinate axes decode through the generic 1-D reader
    assert(Hdf5.read1d(s"$dir/c.nc", lat).length == 8)
  }

  test("chunk B-tree splits into levels past 64 entries per node") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val grid = CubeGrid(64, 64, 0.0, 0.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 5, Seq("v0"),
      nanEvery = 9)
    // 5 × 8 × 8 = 320 chunks → 5 leaf nodes + 1 internal root
    Hdf5.writeHdf5(cube, s"$dir/big.nc", chunkY = 8, chunkX = 8)
    val back = NetcdfStore.openCube(spark, s"$dir/big.nc")
    assert(back.df.rdd.getNumPartitions == 320)
    assert(back.df.count() == 64L * 64 * 5)
    // spot-check values across the whole index range
    val exp = cube.df.select(col("time"), col("y_idx"), col("x_idx"),
        col("v0")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)) ->
        r.getDouble(3)).toMap
    val got = back.df.filter(col("y_idx") % 13 === 0 && col("x_idx") % 17 === 0)
      .select(col("time"), col("y_idx"), col("x_idx"), col("v0")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2))
      assert(java.lang.Double.compare(r.getDouble(3), exp(k)) == 0, s"cell $k")
    }
  }

  test("the tile server serves an NC4-backed dataset end to end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    writeFixture(dir)
    val yaml = s"""
Datasets:
  - Identifier: nc4
    Title: NC4 cube
    Path: "$dir/c.nc"
"""
    val ctx = new graft.server.ServiceContext(spark)
    ctx.loadConfig(graft.model.ServiceConfig.fromString(yaml), dir)
    val srv = new graft.server.GraftServer(ctx).start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(p: String) = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(srv.address + p)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      val tile = get("/datasets/nc4/vars/v0/tiles/0/0/0.png")
      assert(tile.statusCode() == 200)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(tile.body()))
      assert(img != null && img.getWidth > 0)
      // the served tile (direct chunk-window fast path — NC4 cubes are
      // store-backed) is byte-identical to the Spark render path
      val d = ctx.dataset("nc4").get
      val lv = d.levelSeq.head
      assert(lv.storePath.isDefined, "NC4 level 0 must be store-backed")
      // unstyled default palette = jet (the reference's
      // DEFAULT_CMAP_CBAR, aligned in round 17)
      val m = graft.render.Render.ColorMapping(0.0, 1.0,
        graft.render.ColorMaps.paletteOrDefault("jet"))
      val viaSpark = graft.render.Render.renderTile(lv, "v0",
        d.latestTime, 0, 0, 256, 256, m, flipY = lv.grid.latAscending)
      val z = d.tileGrid.numLevels - 1 // finest advertised zoom = level 0
      val fine = get(s"/datasets/nc4/vars/v0/tiles/$z/0/0.png")
      assert(fine.body().sameElements(viaSpark))
      val cat = get("/datasets")
      assert(new String(tile.headers().firstValue("Content-Type")
        .orElse("")) == "image/png")
      assert(new String(cat.body()).contains("\"nc4\""))
    } finally srv.stop()
  }

  test("layout-v4 chunk indexes read row-identical to the B-tree-v1 path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5v4").toString
    // 5 times × 4 y-chunks × 2 x-chunks = 40 chunks: enough to push the
    // fixed array into pages (page bits 2 → 10 pages), the extensible
    // array past its index block into real EASB super blocks, and the
    // v2 B-tree past one leaf (capacity 12) into a BTIN root
    val grid = CubeGrid(16, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 5, Seq("v0", "v1"),
      nanEvery = 7)
    Hdf5.writeHdf5(cube, s"$dir/ref.nc", chunkY = 4, chunkX = 8)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "lat", "lon", "v0", "v1")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/ref.nc")
    assert(expected.length == 16 * 16 * 5)
    for (idx <- Seq("single", "implicit", "fixedarray", "fixedarray-paged",
        "extarray", "btree2")) {
      val p = s"$dir/$idx.nc"
      Hdf5.writeHdf5(cube, p, chunkY = 4, chunkX = 8, indexType = idx)
      val kind = Hdf5.open(p).datasets("v0").index.kind
      val wantKind = Map("single" -> 1, "implicit" -> 2, "fixedarray" -> 3,
        "fixedarray-paged" -> 3, "extarray" -> 4, "btree2" -> 5)(idx)
      assert(kind == wantKind, s"$idx parsed as index kind $kind")
      assert(rows(p) == expected, s"index type $idx")
    }
  }

  test("dense (fractal-heap) group links enumerate and read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5dense").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    // 12 variables force many links through the heap + name B-tree
    val vars = (0 until 12).map(i => f"var$i%02d")
    val cube = Cube.synthetic(spark, grid, numTimes = 2, vars, nanEvery = 6)
    Hdf5.writeHdf5(cube, s"$dir/dense.nc", chunkY = 4, chunkX = 8,
      denseGroup = true)
    Hdf5.writeHdf5(cube, s"$dir/compact.nc", chunkY = 4, chunkX = 8)
    val f = Hdf5.open(s"$dir/dense.nc")
    assert(f.datasets.keySet == (vars ++ Seq("lat", "lon", "time")).toSet)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select(("time" +: "y_idx" +: "x_idx" +: vars).map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/dense.nc") == rows(s"$dir/compact.nc"))
    assert(rows(s"$dir/dense.nc").length == 8 * 4 * 2)
  }

  test("dense groups combine with a layout-v4 index (libver-latest shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5ll").toString
    val grid = CubeGrid(8, 8, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0"),
      nanEvery = 4)
    Hdf5.writeHdf5(cube, s"$dir/latest.nc", chunkY = 4, chunkX = 4,
      indexType = "fixedarray", denseGroup = true)
    Hdf5.writeHdf5(cube, s"$dir/classic.nc", chunkY = 4, chunkX = 4)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/latest.nc") == rows(s"$dir/classic.nc"))
  }

  test("CF mask-and-scale: attributes parse and apply on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5cf").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/plain.nc", chunkY = 4, chunkX = 8)
    Hdf5.writeHdf5(cube, s"$dir/cf.nc", chunkY = 4, chunkX = 8,
      cfAttrs = Some((2.0, 1.0)))
    val ds = Hdf5.open(s"$dir/cf.nc").datasets("v0")
    assert(ds.attrs.get("scale_factor").contains(Seq(2.0)))
    assert(ds.attrs.get("add_offset").contains(Seq(1.0)))
    def vals(p: String): Map[(Long, Int, Int), Double] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0").collect().map(r =>
          (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)) ->
            r.getDouble(3)).toMap
    val plain = vals(s"$dir/plain.nc")
    val cf = vals(s"$dir/cf.nc")
    assert(cf.size == plain.size && cf.nonEmpty)
    cf.foreach { case (k, v) =>
      val expected = plain(k) * 2.0 + 1.0 // same IEEE ops as the reader
      assert(java.lang.Double.compare(v, expected) == 0, s"cell $k")
    }
    // NaN holes stay NaN through the scale
    assert(cf.values.count(_.isNaN) == plain.values.count(_.isNaN))
    assert(cf.values.exists(_.isNaN))
  }

  test("NetCDF-3 packed int16 (CF attrs) reads mask-and-scaled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nc3cf").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"),
      nanEvery = 5)
    val (scale, offv) = (0.01, 10.0)
    NetcdfStore.writeNetcdf(cube, s"$dir/packed.nc", Some((scale, offv)))
    val hdr = NetcdfStore.readHeader(s"$dir/packed.nc")
    val v0 = hdr.variable("v0")
    assert(v0.ncType == 3) // NC_SHORT on disk
    assert(v0.attrs.get("scale_factor").contains(Seq(scale)))
    assert(v0.attrs.get("_FillValue").contains(Seq(-32768.0)))
    val back = NetcdfStore.openCube(spark, s"$dir/packed.nc").df
      .select("time", "y_idx", "x_idx", "v0").collect().map(r =>
        (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)) ->
          (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    val orig = cube.df.select("time", "y_idx", "x_idx", "v0").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(back.size == orig.size)
    back.foreach { case (k, v) =>
      val o = orig(k)
      if (o.isNaN) assert(v.isNaN, s"NaN hole lost at $k")
      else {
        // exact quantize-dequantize round trip, same ops as the writer
        val q = math.max(-32767L, math.min(32767L,
          math.round((o - offv) / scale)))
        val expected = q.toDouble * scale + offv
        assert(java.lang.Double.compare(v, expected) == 0,
          s"cell $k: got $v want $expected (orig $o)")
      }
    }
  }

  test("CF time units decode: 'days since' axes read as real timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5tu").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/plain.nc", chunkY = 4, chunkX = 8)
    Hdf5.writeHdf5(cube, s"$dir/days.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("days since 2017-01-01"))
    Hdf5.writeHdf5(cube, s"$dir/hours.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("hours since 2016-12-31 12:00:00"))
    // the stored raw axis really is in the declared interval
    val f = Hdf5.open(s"$dir/days.nc")
    assert(f.datasets("time").textAttrs.get("units")
      .contains("days since 2017-01-01"))
    assert(Hdf5.read1d(s"$dir/days.nc", f.datasets("time")).toSeq
      == Seq(0.0, 1.0, 2.0))
    // ...and both CF files read row-identical to the native epoch-us one
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/plain.nc")
    assert(rows(s"$dir/days.nc") == expected)
    assert(rows(s"$dir/hours.nc") == expected)
  }

  test("CF calendar fixtures: 360_day and julian axes decode (NC4)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5cal").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/plain.nc", chunkY = 4, chunkX = 8)
    Hdf5.writeHdf5(cube, s"$dir/c360.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("days since 2017-01-01"),
      timeCalendar = Some("360_day"))
    Hdf5.writeHdf5(cube, s"$dir/cjul.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("days since 2017-01-01"),
      timeCalendar = Some("julian"))
    val f = Hdf5.open(s"$dir/c360.nc")
    assert(f.datasets("time").textAttrs.get("calendar").contains("360_day"))
    // pinned raw counts: real 2017-01-01 is epoch-day 17167; the
    // 360_day base 2017-01-01 is calendar-day (2017-1970)*360 = 16920,
    // so the synthetic axis (2017-01-01 + i real days as calendar-
    // native us) stores as 247+i
    assert(Hdf5.read1d(s"$dir/c360.nc", f.datasets("time")).toSeq
      == Seq(247.0, 248.0, 249.0))
    // julian base 2017-01-01 = calendar-day 17167 (no century non-leap
    // between 1970 and 2017, so julian and Gregorian counts agree here)
    val fj = Hdf5.open(s"$dir/cjul.nc")
    assert(Hdf5.read1d(s"$dir/cjul.nc", fj.datasets("time")).toSeq
      == Seq(0.0, 1.0, 2.0))
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/plain.nc")
    assert(rows(s"$dir/c360.nc") == expected)
    assert(rows(s"$dir/cjul.nc") == expected)
    // the calendar rides along on the opened cube for label formatting
    assert(NetcdfStore.openCube(spark, s"$dir/c360.nc")
      .timeCalendar.contains("360_day"))
  }

  test("extensible-array paged data blocks (bitmap + per-page checksums)") {
    // the paged tier starts at super-block 5 (element 124 past the
    // index block with minElmts 4/pageBits 4): 200 chunks force real
    // EASB page bitmaps and per-page element runs — the deepest
    // extensible-array shape, unreachable by the unpaged fixtures
    val dir = java.nio.file.Files.createTempDirectory("graft-h5eap").toString
    val grid = CubeGrid(16, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 25, Seq("v0"),
      nanEvery = 7)
    Hdf5.writeHdf5(cube, s"$dir/ref.nc", chunkY = 4, chunkX = 8)
    Hdf5.writeHdf5(cube, s"$dir/eap.nc", chunkY = 4, chunkX = 8,
      indexType = "extarray-paged")
    assert(Hdf5.open(s"$dir/eap.nc").datasets("v0").index.kind == 4)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/ref.nc")
    assert(expected.length == 16 * 16 * 25)
    assert(rows(s"$dir/eap.nc") == expected)
  }

  test("extensible-array deep tier: paged super blocks via shrunken " +
      "block bounds") {
    // minElmts 64 / 2^8-element pages: the paged tier starts at
    // super-block 5 (element 1984 past the index block — 4 data blocks
    // of 512 elements, 2 pages each), so 2000 chunks reach the shape a
    // default-geometry file only shows past 5·10^5 chunks; tiers 2-4
    // stay unpaged, so ONE file carries both EASB forms
    val dir = java.nio.file.Files.createTempDirectory("graft-h5deep").toString
    val grid = CubeGrid(16, 16, 0.0, 40.0, 0.25, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 125, Seq("v0"),
      nanEvery = 7)
    Hdf5.writeHdf5(cube, s"$dir/ref.nc", chunkY = 4, chunkX = 4)
    Hdf5.writeHdf5(cube, s"$dir/deep.nc", chunkY = 4, chunkX = 4,
      indexType = "extarray-deep")
    assert(Hdf5.open(s"$dir/deep.nc").datasets("v0").index.kind == 4)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/ref.nc")
    assert(expected.length == 16 * 16 * 125)
    assert(rows(s"$dir/deep.nc") == expected)
  }

  test("registered filters (zstd 32015, blosc 32001, lz4 32004) decode") {
    // real-world NC4 increasingly uses registry plugins instead of
    // deflate; the codecs are shared with the zarr tier
    val dir = java.nio.file.Files.createTempDirectory("graft-h5rf").toString
    val grid = CubeGrid(16, 8, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/ref.nc", chunkY = 4, chunkX = 8)
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0", "v1")
        .collect().map(_.toString).sorted.toSeq
    val expected = rows(s"$dir/ref.nc")
    for ((comp, wantIds) <- Seq("zstd" -> Seq(2, 32015),
        "blosc" -> Seq(32001), "lz4" -> Seq(2, 32004))) {
      val p = s"$dir/$comp.nc"
      Hdf5.writeHdf5(cube, p, chunkY = 4, chunkX = 8, compression = comp)
      assert(Hdf5.open(p).datasets("v0").filters.map(_.id) == wantIds,
        s"$comp filter pipeline")
      assert(rows(p) == expected, s"compression $comp")
    }
    // registered filters compose with the v4 chunk indexes too
    Hdf5.writeHdf5(cube, s"$dir/z2.nc", chunkY = 4, chunkX = 8,
      compression = "zstd", indexType = "btree2")
    assert(rows(s"$dir/z2.nc") == expected)
  }

  test("vlen-string attributes resolve through the global heap") {
    // h5py/h5netcdf write str attrs as vlen (class 9) by default — a
    // reader that only handles fixed strings silently drops `units`
    // and serves raw interval counts as epoch-us garbage dates
    val dir = java.nio.file.Files.createTempDirectory("graft-h5vl").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0"),
      nanEvery = 5)
    Hdf5.writeHdf5(cube, s"$dir/plain.nc", chunkY = 4, chunkX = 8)
    Hdf5.writeHdf5(cube, s"$dir/vlen.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("days since 2017-01-01"),
      timeCalendar = Some("360_day"), vlenTimeAttrs = true)
    val f = Hdf5.open(s"$dir/vlen.nc")
    // both attrs decode through the global heap indirection
    assert(f.datasets("time").textAttrs.get("units")
      .contains("days since 2017-01-01"))
    assert(f.datasets("time").textAttrs.get("calendar").contains("360_day"))
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/vlen.nc") == rows(s"$dir/plain.nc"))
  }

  test("undecodable CF-significant attribute fails loudly") {
    // craft an attribute message named `units` with datatype class 7
    // (reference — no CF meaning, undecodable): parseAttr must throw,
    // not return None and silently skip CF time decoding
    val dir = java.nio.file.Files.createTempDirectory("graft-h5bad").toString
    val grid = CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("v0"))
    Hdf5.writeHdf5(cube, s"$dir/f.nc", chunkY = 4, chunkX = 8,
      timeUnits = Some("days since 2017-01-01"))
    // corrupt the units attr's datatype class in place: find the attr
    // message body (v1: 01 00 | nameSize=6 | dtSize | dsSize | "units")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/f.nc"))
    val pat = "units".getBytes :+ 0.toByte
    val at = bytes.indexOfSlice(pat)
    assert(at > 0, "units attr not found in fixture")
    // name is padded to 8 ("units\0" + 2 pad); datatype version/class
    // byte follows — rewrite class 3 (string) to class 7 (reference)
    val dtOff = at + 8
    assert((bytes(dtOff) & 0x0F) == 3, "expected string-class attr dtype")
    bytes(dtOff) = ((bytes(dtOff) & 0xF0) | 0x07).toByte
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/f.nc"), bytes)
    val e = intercept[Exception](Hdf5.open(s"$dir/f.nc"))
    assert(e.getMessage != null && e.getMessage.contains("units"),
      s"got: $e")
  }

  test("jenkins lookup3: published reference vectors") {
    // from lookup3.c driver5/driver2 (public domain, Bob Jenkins)
    assert(Hdf5.lookup3(Array.emptyByteArray, 0) == 0xdeadbeef)
    assert(Hdf5.lookup3(Array.emptyByteArray, 0xdeadbeef) == 0xbd5b7dde)
    assert(Hdf5.lookup3("Four score and seven years ago".getBytes, 0)
      == 0x17770551)
    assert(Hdf5.lookup3("Four score and seven years ago".getBytes, 1)
      == 0xcd628161)
  }

  test("non-hdf5 and classic files are not misdetected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val grid = CubeGrid(4, 2, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 1, Seq("a"))
    NetcdfStore.writeNetcdf(cube, s"$dir/classic.nc")
    assert(!Hdf5.isHdf5(s"$dir/classic.nc"))
    // classic still routes to the classic reader after dispatch unification
    assert(CubeIngest.open(spark, s"$dir/classic.nc").df.count() == 8L)
  }

  test("StoreCache.invalidate drops the parsed-header cache: an " +
      "externally rewritten HDF5 file serves its NEW values") {
    // Round-17 review find: Hdf5's fileCache/baseCache/chunkCache
    // survived the shared invalidation seam — only writeHdf5 cleared
    // them, so a file rewritten by anything else kept serving stale
    // chunk addresses through StoreCache.invalidate. This simulates
    // the external rewriter (built elsewhere, copied in).
    val dir = java.nio.file.Files.createTempDirectory("graft-h5inv").toString
    val grid = CubeGrid(8, 4, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 1, Seq("v0"))
    val path = s"$dir/c.nc"
    Hdf5.writeHdf5(cube, path, chunkY = 4, chunkX = 8)
    def vals(): Map[(Int, Int), Double] =
      NetcdfStore.openCube(spark, path).df
        .select("y_idx", "x_idx", "v0").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val before = vals() // warms Hdf5.fileCache/baseCache/chunkCache
    // external rewrite: same path, shifted values, different chunking
    // (writeHdf5 invalidates only the path IT writes — the copy is
    // the uninstrumented publisher this seam must survive)
    val shifted = cube.copy(df = cube.df.withColumn("v0",
      col("v0") + lit(1000.0)))
    Hdf5.writeHdf5(shifted, s"$dir/rebuilt.nc", chunkY = 2, chunkX = 4)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/rebuilt.nc"),
      java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    graft.sources.StoreCache.invalidate(path)
    val after = vals()
    assert(after.size == before.size)
    assert(after.forall { case (k, a) =>
      val b = before(k)
      (a.isNaN && b.isNaN) || math.abs(a - (b + 1000.0)) < 1e-9
    }, "invalidate left the stale parsed header/chunk index cached")
  }
}
