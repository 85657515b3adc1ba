package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.cube.{Cube, CubeFrame}
import graft.geo.Geo
import graft.geo.Geo.{BBox, Geometry, Point, Pt}

/** The flagship analytics operators: point and zonal time series
  * (reference: xcube_server/controllers/time_series.py — traced in
  * SURVEY §3.2). One DataFrame query per request:
  *
  *   scan(cube) → filter(bbox ∧ time∈[s,e]) → join(broadcast mask)
  *     → groupBy(time) → agg(avg, count) → orderBy(time)
  *
  * The rasterized geometry mask is tiny (bbox-window-sized), computed on
  * the driver and broadcast — the cube itself is never collected, so the
  * same plan runs at 100 TB with the bbox/time filters pushed into the
  * parquet scan.
  */
object TimeSeries {

  /** Typed row shape for fixed result schemas (SURVEY §1.4: Dataset[T]
    * where the shape is static — time-series points are). */
  final case class TsPoint(date: String, total_count: Long,
                           valid_count: Long, average: Option[Double])

  def pointTyped(cube: CubeFrame, variable: String, lon: Double, lat: Double,
                 start: Option[Timestamp] = None,
                 end: Option[Timestamp] = None)
      : org.apache.spark.sql.Dataset[TsPoint] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[TsPoint]
    point(cube, variable, lon, lat, start, end).as[TsPoint]
  }

  /** Output schema matches the reference JSON rows
    * (time_series.py:133-145): date ISO-8601, totalCount, validCount,
    * average (null when the whole slice is NaN). */
  private def finish(df: DataFrame): DataFrame =
    df.select(col("date"), col("total_count"), col("valid_count"),
      col("average")).orderBy("date")

  private def emptyResult(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("date", StringType), StructField("total_count", LongType),
        StructField("valid_count", LongType), StructField("average", DoubleType))))
  }

  /** Point time series (time_series.py:122-145): nearest-cell lookup
    * resolved on the driver from grid arithmetic (P3), then an equality
    * filter that prunes partitions/row-groups. totalCount == 1. */
  def point(cube: CubeFrame, variable: String, lon: Double, lat: Double,
            start: Option[Timestamp] = None, end: Option[Timestamp] = None): DataFrame = {
    val spark = cube.df.sparkSession
    // bounds pre-check (time_series.py:126-128): outside bbox → []
    if (!cube.grid.bbox.contains(Pt(lon, lat))) return emptyResult(spark)
    val x = cube.grid.nearestX(lon)
    val y = cube.grid.nearestY(lat)
    val v = Cube.nanToNull(col(variable))
    val base = cube.df
      .filter(col("x_idx") === x && col("y_idx") === y)
    finish(timeFiltered(base, start, end)
      .groupBy(col("time"))
      .agg(count(lit(1)).as("total_count"),
        count(v).as("valid_count"),
        avg(v).as("average"))
      .withColumn("date", Q.iso(col("time"))))
  }

  /** Zonal time series for a geometry (time_series.py:148-205).
    *
    * Faithful to the reference quirk (SURVEY Q2): `average` is the mean
    * over the full rectangular bbox window, while `valid_count` counts
    * finite cells inside the rasterized mask. Set `exactMaskMean=true`
    * for the arguably-correct mask-restricted mean.
    */
  def zonal(cube: CubeFrame, variable: String, geometry: Geometry,
            start: Option[Timestamp] = None, end: Option[Timestamp] = None,
            exactMaskMean: Boolean = false): DataFrame = {
    geometry match {
      case Point(p) => return point(cube, variable, p.x, p.y, start, end)
      case _ =>
    }
    val spark = cube.df.sparkSession
    val g = cube.grid
    // geometry ∩ dataset bounds pre-filter (time_series.py:158-164)
    val gb = geometry.bbox
    val inter = g.bbox.intersection(gb).getOrElse(return emptyResult(spark))

    // geo → index window, floor/ceil + clamp (time_series.py:166-176).
    // y1/y2 are TOP-BASED row indices (row 0 at latMax, as in the
    // reference); lat-ascending cubes store y_idx bottom-up, so the
    // filter/mask indices convert through topToIdx below.
    def clamp(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
    val res = (g.latMax - g.latMin) / g.height
    val x1 = clamp(math.floor((inter.xMin - g.lonMin) / res).toInt, 0, g.width - 1)
    val x2 = clamp(math.ceil((inter.xMax - g.lonMin) / res).toInt + 1, 0, g.width - 1)
    val y1 = clamp(math.floor((g.latMax - inter.yMax) / res).toInt, 0, g.height - 1)
    val y2 = clamp(math.ceil((g.latMax - inter.yMin) / res).toInt + 1, 0, g.height - 1)
    val subW = x2 - x1
    val subH = y2 - y1
    if (subW <= 0 || subH <= 0) return emptyResult(spark)
    def topToIdx(yTop: Int): Int =
      if (g.latAscending) g.height - 1 - yTop else yTop
    val (yIdxLo, yIdxHi) =
      if (g.latAscending) (g.height - y2, g.height - y1) else (y1, y2)

    // driver-side rasterized mask over the window (utils.py:73-83),
    // broadcast as an include-list (SURVEY J3)
    val subLonMin = g.lonMin + x1 * res
    val subLatMin = g.latMax - y2 * res
    val mask = Geo.geometryMask(subW, subH, geometry, subLonMin, subLatMin, res)
    val totalCount = mask.map(_.count(identity)).sum.toLong
    import spark.implicits._
    val maskCells = (for {
      my <- 0 until subH; mx <- 0 until subW if mask(my)(mx)
    } yield (topToIdx(y1 + my), x1 + mx)).toDF("y_idx", "x_idx")

    val v = Cube.nanToNull(col(variable))
    val windowRows = timeFiltered(
      cube.df.filter(col("x_idx") >= x1 && col("x_idx") < x2 &&
        col("y_idx") >= yIdxLo && col("y_idx") < yIdxHi), start, end)
      .join(broadcast(maskCells.withColumn("in_mask", lit(true))),
        Seq("y_idx", "x_idx"), "left")

    val avgCol =
      if (exactMaskMean) avg(when(col("in_mask"), v))
      else avg(v) // reference Q2: bbox-window mean (time_series.py:191-193)
    finish(windowRows
      .groupBy(col("time"))
      .agg(count(when(col("in_mask"), v)).as("valid_count"),
        avgCol.as("average"))
      .withColumn("total_count", lit(totalCount))
      // reference: average==NaN ⇒ validCount=0, average=None
      .withColumn("valid_count",
        when(col("average").isNull, 0L).otherwise(col("valid_count")))
      .withColumn("date", Q.iso(col("time"))))
  }

  /** Per-geometry bbox window + rasterized mask, resolved on the driver
    * (shared by [[zonal]]'s plan shape and [[zonalMany]]'s mask table).
    * Returns None when the geometry misses the cube bounds. Each cell is
    * (y_idx, x_idx, in_mask); the Long is the mask cell count
    * (reference totalCount). A Point resolves to its nearest cell. */
  private def windowCells(cube: CubeFrame, geometry: Geometry)
      : Option[(IndexedSeq[(Int, Int, Boolean)], Long)] = {
    val g = cube.grid
    geometry match {
      case Point(p) =>
        if (!g.bbox.contains(p)) return None
        return Some((IndexedSeq((g.nearestY(p.y), g.nearestX(p.x), true)), 1L))
      case _ =>
    }
    val inter = g.bbox.intersection(geometry.bbox).getOrElse(return None)
    def clamp(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
    val res = (g.latMax - g.latMin) / g.height
    val x1 = clamp(math.floor((inter.xMin - g.lonMin) / res).toInt, 0, g.width - 1)
    val x2 = clamp(math.ceil((inter.xMax - g.lonMin) / res).toInt + 1, 0, g.width - 1)
    val y1 = clamp(math.floor((g.latMax - inter.yMax) / res).toInt, 0, g.height - 1)
    val y2 = clamp(math.ceil((g.latMax - inter.yMin) / res).toInt + 1, 0, g.height - 1)
    val subW = x2 - x1
    val subH = y2 - y1
    if (subW <= 0 || subH <= 0) return None
    def topToIdx(yTop: Int): Int =
      if (g.latAscending) g.height - 1 - yTop else yTop
    val subLonMin = g.lonMin + x1 * res
    val subLatMin = g.latMax - y2 * res
    val mask = Geo.geometryMask(subW, subH, geometry, subLonMin, subLatMin, res)
    val cells = for { my <- 0 until subH; mx <- 0 until subW }
      yield (topToIdx(y1 + my), x1 + mx, mask(my)(mx))
    Some((cells.toIndexedSeq, mask.map(_.count(identity)).sum.toLong))
  }

  /** Multi-geometry fan-out (time_series.py:208-219) as ONE cube scan:
    * every geometry's bbox window is rasterized on the driver into a
    * shared broadcast (geometry_index, y_idx, x_idx, in_mask, total)
    * table; the cube is scanned once (pre-filtered to the union bbox so
    * pruning still reaches parquet), inner-joined to the broadcast, and
    * grouped by (geometry_index, time). Per-geometry semantics are
    * identical to [[zonal]] — window cells appear exactly once per
    * geometry, so avg(v) is the reference bbox-window mean and
    * count(in_mask ∧ valid) the mask valid count.
    *
    * This is the 100×-safe shape: a 1,000-feature FeatureCollection is
    * one scan + one broadcast join, not a 1,000-branch union plan. */
  def zonalMany(cube: CubeFrame, variable: String, geometries: Seq[Geometry],
                start: Option[Timestamp] = None, end: Option[Timestamp] = None,
                exactMaskMean: Boolean = false): DataFrame = {
    val spark = cube.df.sparkSession
    import spark.implicits._
    val windows = geometries.zipWithIndex.flatMap { case (geom, i) =>
      windowCells(cube, geom).map { case (cells, total) => (i, cells, total) }
    }
    if (windows.isEmpty)
      return emptyResult(spark).withColumn("geometry_index", lit(0))
        .filter(lit(false))
    val cellRows = windows.flatMap { case (i, cells, total) =>
      cells.map { case (y, x, m) => (i, y, x, m, total) }
    }.toDF("geometry_index", "y_idx", "x_idx", "in_mask", "__total")
    // union-bbox pre-filter keeps parquet row-group pruning effective
    val allCells = windows.flatMap(_._2)
    val (xLo, xHi) = (allCells.map(_._2).min, allCells.map(_._2).max)
    val (yLo, yHi) = (allCells.map(_._1).min, allCells.map(_._1).max)
    val v = Cube.nanToNull(col(variable))
    val avgCol = if (exactMaskMean) avg(when(col("in_mask"), v)) else avg(v)
    timeFiltered(
      cube.df.filter(col("x_idx") >= xLo && col("x_idx") <= xHi &&
        col("y_idx") >= yLo && col("y_idx") <= yHi), start, end)
      .join(broadcast(cellRows), Seq("y_idx", "x_idx"))
      .groupBy(col("geometry_index"), col("time"))
      .agg(count(when(col("in_mask"), v)).as("valid_count"),
        avgCol.as("average"),
        max(col("__total")).as("total_count"))
      .withColumn("valid_count",
        when(col("average").isNull, 0L).otherwise(col("valid_count")))
      .withColumn("date", Q.iso(col("time")))
      .select(col("date"), col("total_count"), col("valid_count"),
        col("average"), col("geometry_index"))
      .orderBy("geometry_index", "date")
  }

  private def timeFiltered(df: DataFrame, start: Option[Timestamp],
                           end: Option[Timestamp]): DataFrame = {
    val afterStart = start.map(s => df.filter(col("time") >= lit(s))).getOrElse(df)
    end.map(e => afterStart.filter(col("time") <= lit(e))).getOrElse(afterStart)
  }
}
