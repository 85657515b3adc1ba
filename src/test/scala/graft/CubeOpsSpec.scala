package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.cube.{Cube, CubeFrame, CubeGrid}
import graft.geo.Geo.{Polygon, Pt}
import graft.operators.{Pyramid, Resample, TimeSeries}

class CubeOpsSpec extends SparkSpec {

  /** tiny 8x4 cube, 2 time steps, deterministic values v = t*1000 +
    * y*10 + x; NaN at (y=0,x=0). */
  private def tinyCube(): CubeFrame = {
    import spark.implicits._
    val grid = CubeGrid(width = 8, height = 4, lonMin = 0.0, latMin = 50.0,
      res = 1.0, latAscending = true)
    val rows = for {
      t <- 0 until 2; y <- 0 until 4; x <- 0 until 8
    } yield (Timestamp.valueOf(s"2017-01-0${t + 1} 00:00:00"), y, x,
      grid.latOfY(y), grid.lonOfX(x),
      if (y == 0 && x == 0) Double.NaN else t * 1000.0 + y * 10 + x)
    val df = rows.toDF("time", "y_idx", "x_idx", "lat", "lon", "v")
    CubeFrame(df, grid, Seq("v"))
  }

  test("point time series: nearest cell, iso dates, NaN→null") {
    val cube = tinyCube()
    val out = TimeSeries.point(cube, "v", lon = 2.4, lat = 51.7).collect()
    // nearest cell: x=2 (center 2.5), y=1 (center 51.5) → v = t*1000+12
    assert(out.length == 2)
    assert(out(0).getAs[String]("date") == "2017-01-01T00:00:00Z")
    assert(out(0).getAs[Long]("total_count") == 1L)
    assert(out(0).getAs[Long]("valid_count") == 1L)
    assert(out(0).getAs[Double]("average") == 12.0)
    assert(out(1).getAs[Double]("average") == 1012.0)
  }

  test("point outside bounds → empty (time_series.py:126-128)") {
    assert(TimeSeries.point(tinyCube(), "v", lon = 99.0, lat = 0.0).isEmpty)
  }

  test("point on NaN cell → validCount 0, average null") {
    val cube = tinyCube()
    val out = TimeSeries.point(cube, "v", lon = 0.5, lat = 50.5)
      .collect() // cell (y=0,x=0) is NaN at both times
    assert(out.forall(_.getAs[Long]("valid_count") == 0L))
    assert(out.forall(_.isNullAt(out(0).fieldIndex("average"))))
  }

  test("zonal time series: Q2 semantics (bbox mean, mask count)") {
    val cube = tinyCube()
    // triangle over left-bottom area; bbox = [0.2,3.8]x[50.2,53.8]
    val tri = Polygon(IndexedSeq(
      Pt(0.2, 50.2), Pt(3.8, 50.2), Pt(0.2, 53.8)))
    val out = TimeSeries.zonal(cube, "v", tri).collect()
    assert(out.length == 2)
    val r0 = out(0)
    val totalCount = r0.getAs[Long]("total_count")
    assert(totalCount > 0 && totalCount <= 20)
    // reference window arithmetic (time_series.py:166-176): x2 =
    // clamp(ceil(3.8)+1, 0, 7) = 5 → x 0..4; y (top-based) =
    // [floor(54-53.8), clamp(ceil(54-50.2)+1, 0, 3)) = [0, 3) → the top
    // 3 rows = ascending y_idx 1..3. NaN cell (y_idx 0, x 0) excluded.
    // Q2: average over the whole bbox window, not the mask.
    val windowVals = for {
      y <- 1 until 4; x <- 0 until 5
    } yield y * 10.0 + x
    val expectedAvg = windowVals.sum / windowVals.size
    assert(math.abs(r0.getAs[Double]("average") - expectedAvg) < 1e-9)
    // exact-mask variant differs (it drops out-of-mask cells)
    val exact = TimeSeries.zonal(cube, "v", tri, exactMaskMean = true)
      .collect()(0).getAs[Double]("average")
    assert(exact != r0.getAs[Double]("average"))
  }

  test("zonal with Point geometry degenerates to point path") {
    val out = TimeSeries.zonal(tinyCube(), "v", graft.geo.Geo.Point(Pt(2.4, 51.7)))
    assert(out.collect()(0).getAs[Long]("total_count") == 1L)
  }

  test("zonalMany unions per-geometry plans with index") {
    val tri1 = Polygon(IndexedSeq(Pt(0.2, 50.2), Pt(3.8, 50.2), Pt(0.2, 53.8)))
    val tri2 = Polygon(IndexedSeq(Pt(4.2, 50.2), Pt(7.8, 50.2), Pt(4.2, 53.8)))
    val out = TimeSeries.zonalMany(tinyCube(), "v", Seq(tri1, tri2))
    assert(out.select("geometry_index").distinct().count() == 2)
  }

  test("weekly resample labels match pandas 1W (golden: test_time_series.py:138)") {
    import spark.implicits._
    val times = Seq("2017-01-16", "2017-01-25", "2017-01-26", "2017-01-28",
      "2017-01-30").map(d => Timestamp.valueOf(s"$d 10:00:00"))
    val df = times.toDF("time")
    val labels = df.select(date_format(
        Resample.weekLabelSun(col("time")), "yyyy-MM-dd").as("wk"))
      .collect().map(_.getString(0))
    assert(labels.toSeq == Seq("2017-01-22", "2017-01-29", "2017-01-29",
      "2017-01-29", "2017-02-05"))
  }

  test("weeklyMean groups per cell with Sunday-anchored bins") {
    // 2017-01-01 is a Sunday → own right-labeled bin; 01-02 (Monday)
    // bins to 01-08: two separate weekly rows per cell
    val weekly = Resample.weeklyMean(tinyCube())
    val rows = weekly.df.filter(col("y_idx") === 1 && col("x_idx") === 2)
      .orderBy("time").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("v") == 12.0)
    assert(rows(1).getAs[Double]("v") == 1012.0)
    assert(rows(0).getAs[java.sql.Timestamp]("time").toString
      .startsWith("2017-01-01"))
    assert(rows(1).getAs[java.sql.Timestamp]("time").toString
      .startsWith("2017-01-08"))
  }

  test("rollingMean: trailing n-step window per pixel, NaN propagates") {
    // xarray default min_periods = n: the first n-1 steps are NaN
    val rolled = Resample.rollingMean(tinyCube(), 2)
    val rows = rolled.df.filter(col("y_idx") === 1 && col("x_idx") === 2)
      .orderBy("time").collect()
    // t0 window = {12.0} (partial → NaN); t1 window = {12.0, 1012.0}
    assert(rows.head.getAs[Double]("v").isNaN)
    assert(rows.map(_.getAs[Double]("v")).last == 512.0)
    // explicit min_periods=1 gives partial-window means
    val partial = Resample.rollingMean(tinyCube(), 2, minPeriods = 1)
    assert(partial.df.filter(col("y_idx") === 1 && col("x_idx") === 2)
      .orderBy("time").collect().map(_.getAs[Double]("v")).toSeq ==
      Seq(12.0, 512.0))
    // NaN cell stays NaN through every window containing it
    val nanRows = rolled.df.filter(col("y_idx") === 0 && col("x_idx") === 0)
      .collect()
    assert(nanRows.forall(r => r.getAs[Double]("v").isNaN))
    // registered as a computed-dataset transform
    val ctx = new graft.server.ServiceContext(spark)
    val viaTransform = ctx.transforms("rolling_mean")(
      Seq(tinyCube()), Map("steps" -> "2", "min_periods" -> "1"))
    assert(viaTransform.df.filter(col("y_idx") === 1 && col("x_idx") === 2)
      .orderBy("time").collect().map(_.getAs[Double]("v")).toSeq ==
      Seq(12.0, 512.0))
  }

  test("pyramid: (n+1)/2 sizing and mean downsample") {
    val cube = tinyCube()
    val l1 = Pyramid.downsample(cube, Pyramid.Mean)
    assert(l1.grid.width == 4 && l1.grid.height == 2)
    // block (y 2..3, x 0..1) at t0 → mean(20,21,30,31) = 25.5
    val v = l1.df.filter(col("y_idx") === 1 && col("x_idx") === 0 &&
        col("time") === lit(Timestamp.valueOf("2017-01-01 00:00:00")))
      .collect()(0).getAs[Double]("v")
    assert(v == 25.5)
    assert(Pyramid.numLevels(2000, 1000, 250, 250) == 4)
  }

  test("pyramid First = strided decimation (no shuffle)") {
    val cube = tinyCube()
    val l1 = Pyramid.downsample(cube, Pyramid.First)
    val v = l1.df.filter(col("y_idx") === 1 && col("x_idx") === 1 &&
        col("time") === lit(Timestamp.valueOf("2017-01-01 00:00:00")))
      .collect()(0).getAs[Double]("v")
    assert(v == 22.0) // source cell (y=2, x=2)
    // plan has no exchange
    val plan = l1.df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("masking helpers (F5/F6)") {
    import spark.implicits._
    val df = Seq(1.0, 5.0, Double.NaN, -9999.0, 100.0).toDF("v")
    val masked = df.select(Cube.maskInvalid(col("v"),
      fillValue = Some(-9999.0), validMin = Some(0.0),
      validMax = Some(50.0)).as("m")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(masked.toSeq == Seq(Some(1.0), Some(5.0), None, None, None))
    val clipped = df.select(Cube.clip(col("v"), 0.0, 10.0).as("c"))
      .collect().map(_.getDouble(0))
    assert(clipped(1) == 5.0 && clipped(4) == 10.0)
  }
}
