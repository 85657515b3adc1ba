package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.geo.Geo._

class GeoSpec extends AnyFunSuite {

  test("geometry mask matches reference golden (test_utils.py:97-119)") {
    // triangle ((0,0),(16,0),(16,8)) rasterized all_touched on 16x8
    val tri = Polygon(IndexedSeq(Pt(0, 0), Pt(16, 0), Pt(16, 8), Pt(0, 0)))
    val mask = Geo.geometryMask(16, 8, tri, lonMin = 0, latMin = 0, res = 1.0)
    val expected = Array(
      "0000000000000011",
      "0000000000001111",
      "0000000000111111",
      "0000000011111111",
      "0000001111111111",
      "0000111111111111",
      "0011111111111111",
      "1111111111111111")
    val got = mask.map(_.map(b => if (b) '1' else '0').mkString)
    assert(got.toSeq == expected.toSeq)
  }

  test("ray casting: interior, exterior, holes") {
    val square = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10)))
    assert(square.contains(Pt(5, 5)))
    assert(!square.contains(Pt(15, 5)))
    val withHole = Polygon(
      IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10)),
      Seq(IndexedSeq(Pt(4, 4), Pt(6, 4), Pt(6, 6), Pt(4, 6))))
    assert(!withHole.contains(Pt(5, 5)))
    assert(withHole.contains(Pt(2, 2)))
  }

  test("WKT round-trips through parse") {
    val p = Geo.parseWkt("POINT (3.5 -2)")
    assert(p == Point(Pt(3.5, -2)))
    val poly = Geo.parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
      .asInstanceOf[Polygon]
    assert(poly.shell.length == 5 && poly.contains(Pt(2, 2)))
    val mp = Geo.parseWkt(
      "MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
      .asInstanceOf[MultiPolygon]
    assert(mp.polys.length == 2)
    assert(mp.contains(Pt(6, 6)) && !mp.contains(Pt(3, 3)))
    val withHole = Geo.parseWkt(
      "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
      .asInstanceOf[Polygon]
    assert(withHole.holes.length == 1 && !withHole.contains(Pt(5, 5)))
  }

  test("antimeridian bbox split (utils.py:56-70)") {
    val normal = Geo.boxSplitGeometry(-10, 0, 10, 5)
    assert(normal.isInstanceOf[Polygon])
    val split = Geo.boxSplitGeometry(170, 0, -170, 5)
    val mp = split.asInstanceOf[MultiPolygon]
    assert(mp.polys.length == 2)
    assert(mp.contains(Pt(175, 2)) && mp.contains(Pt(-175, 2)))
    assert(!mp.contains(Pt(0, 2)))
  }

  test("bbox intersection and containment") {
    val a = BBox(0, 0, 10, 10)
    assert(a.intersection(BBox(5, 5, 15, 15)).contains(BBox(5, 5, 10, 10)))
    assert(a.intersection(BBox(20, 20, 30, 30)).isEmpty)
    assert(a.contains(Pt(0, 0)) && !a.contains(Pt(-1, 0)))
  }

  test("rasterized mask is a superset of center-in-polygon over random triangles") {
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      def pt() = Pt(rnd.nextDouble() * 10, rnd.nextDouble() * 8)
      val tri = Polygon(IndexedSeq(pt(), pt(), pt()))
      val mask = Geo.geometryMask(10, 8, tri, lonMin = 0, latMin = 0, res = 1.0)
      for (y <- 0 until 8; x <- 0 until 10) {
        val center = Pt(x + 0.5, 8 - y - 0.5) // row 0 at top
        if (tri.contains(center))
          assert(mask(y)(x), s"center-inside cell ($y,$x) unmasked for $tri")
      }
    }
  }

  test("rect intersection covers edge/corner/containment cases") {
    val tri = Polygon(IndexedSeq(Pt(0, 0), Pt(4, 0), Pt(0, 4)))
    assert(Geo.intersectsRect(tri, BBox(1, 1, 2, 2)))     // inside
    assert(Geo.intersectsRect(tri, BBox(-1, -1, 0.5, 0.5))) // overlaps corner
    assert(!Geo.intersectsRect(tri, BBox(3.5, 3.5, 5, 5))) // outside hypotenuse
    assert(Geo.intersectsRect(tri, BBox(-1, -1, 10, 10)))  // rect contains tri
  }

  // --- Multi*/GeometryCollection surface (utils.py:100-121
  // PRIMITIVE_GEOMETRY_TYPES + GEOMETRY_COLLECTION_TYPE) ---

  test("GeoJSON parses MultiPoint / MultiLineString / GeometryCollection") {
    val mp = Geo.parseGeoJson(
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
      .asInstanceOf[MultiPoint]
    assert(mp.points == Seq(Pt(1, 2), Pt(3, 4)))
    val mls = Geo.parseGeoJson(
      """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3,3]]]}""")
      .asInstanceOf[MultiLineString]
    assert(mls.lines.length == 2 && mls.lines(1) == IndexedSeq(Pt(2, 2), Pt(3, 3)))
    val gc = Geo.parseGeoJson(
      """{"type":"GeometryCollection","geometries":[
           {"type":"Point","coordinates":[5,5]},
           {"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]},
           {"type":"GeometryCollection","geometries":[
             {"type":"LineString","coordinates":[[8,8],[9,9]]}]}]}""")
      .asInstanceOf[GeometryCollection]
    assert(gc.members.length == 3)
    assert(Geo.primitives(gc).length == 3) // nested collection flattens
    assert(gc.bbox == BBox(0, 0, 9, 9))
  }

  test("WKT parses MULTIPOINT (both forms) / MULTILINESTRING / GEOMETRYCOLLECTION") {
    val mp1 = Geo.parseWkt("MULTIPOINT (1 2, 3 4)").asInstanceOf[MultiPoint]
    val mp2 = Geo.parseWkt("MULTIPOINT ((1 2), (3 4))").asInstanceOf[MultiPoint]
    assert(mp1 == mp2 && mp1.points == Seq(Pt(1, 2), Pt(3, 4)))
    val mls = Geo.parseWkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))")
      .asInstanceOf[MultiLineString]
    assert(mls.lines.map(_.length) == Seq(2, 3))
    val gc = Geo.parseWkt(
      "GEOMETRYCOLLECTION (POINT (5 5), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), " +
        "LINESTRING (8 8, 9 9))").asInstanceOf[GeometryCollection]
    assert(gc.members.length == 3)
    assert(gc.members(0) == Point(Pt(5, 5)))
    assert(gc.members(1).asInstanceOf[Polygon].shell.length == 5)
  }

  test("intersects over composite type pairs (shapely semantics: any member)") {
    val square = Polygon(IndexedSeq(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10)))
    val mpIn = MultiPoint(Seq(Pt(50, 50), Pt(5, 5)))
    val mpOut = MultiPoint(Seq(Pt(50, 50), Pt(60, 60)))
    assert(Geo.intersects(mpIn, square) && Geo.intersects(square, mpIn))
    assert(!Geo.intersects(mpOut, square))
    val mlsCross = MultiLineString(Seq(
      IndexedSeq(Pt(-5, -5), Pt(-1, -1)), IndexedSeq(Pt(-1, 5), Pt(5, 5))))
    assert(Geo.intersects(mlsCross, square) && Geo.intersects(square, mlsCross))
    assert(!Geo.intersects(
      MultiLineString(Seq(IndexedSeq(Pt(-5, -5), Pt(-1, -1)))), square))
    val gc = GeometryCollection(Seq(
      Point(Pt(50, 50)), LineString(IndexedSeq(Pt(3, 3), Pt(4, 4)))))
    assert(Geo.intersects(gc, square) && Geo.intersects(square, gc))
    assert(!Geo.intersects(GeometryCollection(Seq(Point(Pt(50, 50)))), square))
    // composite × composite: gc's Point(50,50) coincides with mpIn's
    assert(Geo.intersects(gc, mpIn))
    assert(!Geo.intersects(gc, MultiPoint(Seq(Pt(60, 60), Pt(70, 70)))))
    assert(Geo.intersects(gc,
      GeometryCollection(Seq(Point(Pt(50, 50))))))
    // boundary touch counts (shapely intersects)
    assert(Geo.intersects(MultiPoint(Seq(Pt(0, 0))), square))
  }

  test("geometryMask of a collection = union of member masks") {
    val a = Polygon(IndexedSeq(Pt(0, 0), Pt(2, 0), Pt(2, 2), Pt(0, 2)))
    val b = Polygon(IndexedSeq(Pt(5, 5), Pt(7, 5), Pt(7, 7), Pt(5, 7)))
    val gc = GeometryCollection(Seq(a, b))
    val mA = Geo.geometryMask(8, 8, a, 0, 0, 1.0)
    val mB = Geo.geometryMask(8, 8, b, 0, 0, 1.0)
    val mGc = Geo.geometryMask(8, 8, gc, 0, 0, 1.0)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(mGc(y)(x) == (mA(y)(x) || mB(y)(x)), s"cell ($y,$x)")
  }

  test("empty/degenerate geometries are rejected at PARSE time as " +
      "client errors (review r17)") {
    // Empty coordinate arrays are valid GeoJSON and `POINT EMPTY` is
    // valid WKT, but neither has a bbox — failing later inside a
    // predicate (UnsupportedOperationException / StringIndexOOB, both
    // mapped to HTTP 500, possibly from inside a Spark UDF) hid a
    // client error. parseGeoJson/parseWkt now throw
    // IllegalArgumentException (the server's 400 class) up front.
    for (bad <- Seq(
        """{"type":"LineString","coordinates":[]}""",
        """{"type":"Polygon","coordinates":[]}""",
        """{"type":"MultiPolygon","coordinates":[]}""",
        """{"type":"Point","coordinates":[]}""",
        """{"type":"GeometryCollection","geometries":[]}"""))
      intercept[IllegalArgumentException](Geo.parseGeoJson(bad))
    for (bad <- Seq("POINT EMPTY", "POLYGON EMPTY", "not wkt at all"))
      intercept[IllegalArgumentException](Geo.parseWkt(bad))
    // non-empty forms still parse
    assert(Geo.parseWkt("POINT (1 2)") == Point(Pt(1, 2)))
  }
}
