package graft

import org.apache.spark.sql.functions._

import graft.cube.{Cube, CubeGrid, CubeIngest}
import graft.sources.NetcdfStore

class NetcdfSpec extends SparkSpec {

  test("netcdf-3 DSv2 round-trip matches the source cube (S1 live)") {
    val grid = CubeGrid(16, 8, 10.0, -4.0, 0.5, latAscending = false)
    val cube = Cube.synthetic(spark, grid, numTimes = 3, Seq("v0", "v1"),
      nanEvery = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-nc").toString
    NetcdfStore.writeNetcdf(cube, s"$dir/c.nc")

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

  test("netcdf scan: one partition per time slice, time pruning works") {
    val grid = CubeGrid(8, 4, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 4, Seq("v0"),
      nanEvery = 1000)
    val dir = java.nio.file.Files.createTempDirectory("graft-nc").toString
    NetcdfStore.writeNetcdf(cube, s"$dir/c.nc")
    val df = NetcdfStore.openCube(spark, s"$dir/c.nc").df
    // classic layout = contiguous (time, lat, lon) → chunk per slice
    assert(df.rdd.getNumPartitions == 4)
    val t1 = java.sql.Timestamp.valueOf("2017-01-03 00:00:00")
    val late = df.filter(col("time") >= t1)
    assert(late.rdd.getNumPartitions == 2)
    assert(late.count() == 8L * 4 * 2)
  }

  test("netcdf header round-trips dims, vars and offsets") {
    val grid = CubeGrid(4, 2, 0.0, 0.0, 1.0, latAscending = true)
    val cube = Cube.synthetic(spark, grid, numTimes = 2, Seq("sst"))
    val dir = java.nio.file.Files.createTempDirectory("graft-nc").toString
    NetcdfStore.writeNetcdf(cube, s"$dir/c.nc")
    val h = NetcdfStore.readHeader(s"$dir/c.nc")
    assert(h.dims.map(d => d.name -> d.length) ==
      Seq("time" -> 2, "lat" -> 2, "lon" -> 4))
    assert(h.vars.map(_.name) == Seq("time", "lat", "lon", "sst"))
    assert(NetcdfStore.variableNames(h) == Seq("sst"))
    // coordinate arrays decode
    assert(NetcdfStore.read1d(s"$dir/c.nc", h, "lon").toSeq ==
      Seq(0.5, 1.5, 2.5, 3.5))
    assert(NetcdfStore.read1d(s"$dir/c.nc", h, "lat").toSeq == Seq(0.5, 1.5))
  }

  test("CF units parse: intervals, base-timestamp shapes, calendars") {
    import graft.sources.CfTime
    val day = 86400000000L
    assert(CfTime.parseUnits("days since 1970-01-01", None)
      .contains((0L, 86400e6)))
    assert(CfTime.parseUnits("seconds since 1970-01-02", None)
      .contains((day, 1e6)))
    assert(CfTime.parseUnits("hours since 1970-01-01 06:00:00", None)
      .contains((6L * 3600000000L, 3600e6)))
    assert(CfTime.parseUnits("Days since 1970-01-01T00:00:00Z", None)
      .contains((0L, 86400e6))) // case-insensitive, T/Z forms
    assert(CfTime.parseUnits("milliseconds since 1970-01-01", None)
      .contains((0L, 1e3)))
    assert(CfTime.parseUnits("kelvin", None).isEmpty) // not a time unit
    intercept[IllegalArgumentException](
      CfTime.parseUnits("fortnights since 1970-01-01", None))
    assert(CfTime.parseUnits("days since 1970-01-01",
      Some("proleptic_gregorian")).isDefined)
    intercept[IllegalArgumentException](
      CfTime.parseUnits("days since 1970-01-01", Some("360_day")))
  }

  test("CF time units: classic 'seconds since' axis reads as timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nc3tu").toString
    val grid = graft.cube.CubeGrid(8, 4, 0.0, 40.0, 0.5, latAscending = true)
    val cube = graft.cube.Cube.synthetic(spark, grid, numTimes = 3,
      Seq("v0"), nanEvery = 5)
    NetcdfStore.writeNetcdf(cube, s"$dir/plain.nc")
    NetcdfStore.writeNetcdf(cube, s"$dir/cf.nc",
      timeUnits = Some("seconds since 2017-01-01T00:00:00Z"))
    val h = NetcdfStore.readHeader(s"$dir/cf.nc")
    assert(h.variable("time").textAttrs.get("units")
      .contains("seconds since 2017-01-01T00:00:00Z"))
    assert(NetcdfStore.read1d(s"$dir/cf.nc", h, "time").toSeq
      == Seq(0.0, 86400.0, 172800.0))
    def rows(p: String): Seq[String] =
      NetcdfStore.openCube(spark, p).df
        .select("time", "y_idx", "x_idx", "v0")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$dir/cf.nc") == rows(s"$dir/plain.nc"))
  }
}
