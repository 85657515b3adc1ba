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
      chunkX = 16, zlib = true)

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
      chunkX = 16, zlib = false)
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
    ZarrStore.writeZarr(cube, s"$dir/c.zarr", zlib = false)
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
      chunkX = 4, zlib = false)
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
}
