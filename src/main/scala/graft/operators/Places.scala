package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geo.Geo
import graft.geo.Geo.Pt

/** Feature / place queries (reference J1/J2:
  * xcube_server/controllers/places.py:74-94 — linear scan keeping
  * features whose geometry intersects the query geometry).
  *
  * Spark shape: the query geometry is a broadcast-side literal; a cheap
  * bbox range predicate goes FIRST so Catalyst pushes it into the
  * parquet scan (min/max row-group pruning on the point columns), and
  * the exact geometry test runs only on the survivors.
  */
object Places {

  /** Load a GeoJSON FeatureCollection as a feature DataFrame
    * (reference S7: fiona-read + sequential ids at
    * xcube_server/context.py:350-399). Geometry and properties ride as
    * JSON strings (schema-free, like the reference's dict features);
    * point coordinates are additionally surfaced as x/y columns for
    * pushdown-friendly spatial predicates. */
  def loadGeoJson(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f"))
      .select(
        monotonically_increasing_id().as("fid"),
        col("f.geometry.type").as("geom_type"),
        to_json(col("f.geometry")).as("geometry_json"),
        to_json(col("f.properties")).as("properties_json"))
      .withColumn("x", when(col("geom_type") === "Point",
        get_json_object(col("geometry_json"), "$.coordinates[0]")
          .cast("double")))
      .withColumn("y", when(col("geom_type") === "Point",
        get_json_object(col("geometry_json"), "$.coordinates[1]")
          .cast("double")))

  /** Keep rows whose (x, y) point lies inside the WKT geometry. */
  def pointsWithinWkt(points: DataFrame, xCol: String, yCol: String,
                      wkt: String): DataFrame = {
    val geom = Geo.parseWkt(wkt)
    val bb = geom.bbox
    val inGeom = udf((x: Double, y: Double) => geom.contains(Pt(x, y)))
    points
      .filter(col(xCol) >= bb.xMin && col(xCol) <= bb.xMax &&
        col(yCol) >= bb.yMin && col(yCol) <= bb.yMax)
      .filter(inGeom(col(xCol), col(yCol)))
  }

  /** Keep rows whose own WKT geometry intersects the query geometry's
    * bbox-split box (reference find_dataset_places, places.py:19-29:
    * query geometry = dataset bounds, possibly antimeridian-split). */
  def featuresIntersectingBox(features: DataFrame, wktCol: String,
                              lonMin: Double, latMin: Double,
                              lonMax: Double, latMax: Double): DataFrame = {
    val box = Geo.boxSplitGeometry(lonMin, latMin, lonMax, latMax)
    val hits = udf((wkt: String) => {
      val g = Geo.parseWkt(wkt)
      box match {
        case mp: Geo.MultiPolygon =>
          mp.polys.exists(p => Geo.intersectsRect(g, p.bbox)) // box-shaped
        case p: Geo.Polygon => Geo.intersectsRect(g, p.bbox)
        case other => Geo.intersectsRect(g, other.bbox)
      }
    })
    features.filter(hits(col(wktCol)))
  }
}
