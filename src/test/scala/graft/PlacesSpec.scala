package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cube.{Cube, CubeGrid}
import graft.operators.Places

class PlacesSpec extends SparkSpec {

  test("GeoJSON FeatureCollection ingest (S7): ids, geometry, properties") {
    val geojson = """{
      "type": "FeatureCollection",
      "features": [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1.5, 51.1]},
         "properties": {"name": "A", "kind": "buoy"}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [4.2, 52.0]},
         "properties": {"name": "B", "kind": "station"}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [9.9, 40.0]},
         "properties": {"name": "C", "kind": "buoy"}}
      ]}"""
    val f = Files.createTempFile("places", ".geojson")
    Files.writeString(f, geojson)
    val df = Places.loadGeoJson(spark, f.toString)
    assert(df.count() == 3)
    // sequential file-order ids (reference context.py:377-399)
    assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val a = df.filter(col("x") === 1.5).collect()(0)
    assert(a.getAs[Double]("y") == 51.1)
    assert(a.getAs[String]("properties_json").contains("\"buoy\""))
    // spatial filter over the ingested features (J1 path)
    val hits = Places.pointsWithinWkt(df, "x", "y",
      "POLYGON((0 50, 5 50, 5 53, 0 53, 0 50))").collect()
    assert(hits.length == 2)
  }

  test("feature × dataset-bounds join (J2), incl. antimeridian split") {
    import spark.implicits._
    val features = Seq(
      (1L, "POINT (179.5 2.0)"), (2L, "POINT (-179.5 2.0)"),
      (3L, "POINT (0.0 2.0)")).toDF("fid", "wkt")
    val hits = Places.featuresIntersectingBox(features, "wkt",
      lonMin = 170.0, latMin = 0.0, lonMax = -170.0, latMax = 5.0)
      .select("fid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
  }

  test("null-geometry features are excluded, not an NPE mid-task") {
    import spark.implicits._
    val features = Seq((1L, "POINT (0.5 0.5)"), (2L, null))
      .toDF("fid", "wkt")
    val hits = Places.featuresIntersectingBox(features, "wkt",
      lonMin = 0.0, latMin = 0.0, lonMax = 1.0, latMax = 1.0)
      .select("fid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L))
    val gj = Seq((1L, """{"type":"Point","coordinates":[0.5,0.5]}"""),
      (2L, null)).toDF("fid", "gj")
    val hits2 = Places.featuresIntersectingGeometry(gj, "gj",
      graft.geo.Geo.parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .select("fid").collect().map(_.getLong(0)).toSet
    assert(hits2 == Set(1L))
  }

  test("exact intersects excludes bbox-overlap-only features (J1 full)") {
    import spark.implicits._
    // diamond polygon: bbox is [0,0]..[10,10] but the geometry misses
    // the query box at the corner — bbox-approx would return it
    val features = Seq(
      (1L, "POLYGON ((5 0, 10 5, 5 10, 0 5, 5 0))"),   // diamond
      (2L, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),     // really inside
      (3L, "LINESTRING (0 3, 3 0)"),                   // bbox overlaps, line misses
      (4L, "POINT (0.5 0.5)")).toDF("id", "wkt")
    val hits = Places.featuresIntersectingBox(features, "wkt",
      lonMin = 0.0, latMin = 0.0, lonMax = 1.0, latMax = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits == Set(2L, 4L))
  }

  test("multi-input cube equi-join (J4): align two cubes on (time,y,x)") {
    val grid = CubeGrid(4, 4, 0.0, 0.0, 1.0, latAscending = true)
    val c1 = Cube.synthetic(spark, grid, 2, Seq("a"), nanEvery = 1000)
    val c2 = Cube.synthetic(spark, grid, 2, Seq("b"), nanEvery = 1000)
    val joined = c1.df.join(c2.df.select("time", "y_idx", "x_idx", "b"),
      Seq("time", "y_idx", "x_idx"))
    assert(joined.count() == 4L * 4 * 2)
    assert(joined.columns.contains("a") && joined.columns.contains("b"))
  }

  test("cache size parse (F16)") {
    import graft.model.ServiceConfig.parseSize
    assert(parseSize("512M") == 512L * 1024 * 1024)
    assert(parseSize("2G") == 2L * 1024 * 1024 * 1024)
    assert(parseSize("1024") == 1024L)
    assert(parseSize("1.5K") == 1536L)
  }
}
