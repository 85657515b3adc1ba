package graft.geo

/** Minimal pure-Scala planar geometry for the engine's spatial operators
  * (reference: shapely/rasterio usage in xcube_server/utils.py:56-168,
  * controllers/places.py:46-49). No external geometry library: Spark's
  * jar set does not ship JTS, and the reference surface only needs
  * point/line/polygon intersects + rasterization + WKT parsing, which is
  * small enough to own.
  */
object Geo {

  final case class Pt(x: Double, y: Double)

  /** (west, south, east, north) */
  final case class BBox(xMin: Double, yMin: Double, xMax: Double, yMax: Double) {
    def intersects(o: BBox): Boolean =
      xMin <= o.xMax && o.xMin <= xMax && yMin <= o.yMax && o.yMin <= yMax
    def intersection(o: BBox): Option[BBox] = {
      val b = BBox(math.max(xMin, o.xMin), math.max(yMin, o.yMin),
        math.min(xMax, o.xMax), math.min(yMax, o.yMax))
      if (b.xMin <= b.xMax && b.yMin <= b.yMax) Some(b) else None
    }
    def contains(p: Pt): Boolean =
      p.x >= xMin && p.x <= xMax && p.y >= yMin && p.y <= yMax
  }

  sealed trait Geometry {
    /** cached per instance (lazy val in every case class): bbox sits on
      * the Places/zonal predicate hot paths, where a per-call recompute
      * walked every coordinate again for each row tested */
    def bbox: BBox
    /** even-odd containment; boundary points count as inside for
      * horizontal-ray crossing in the usual half-open convention */
    def contains(p: Pt): Boolean
  }

  final case class Point(p: Pt) extends Geometry {
    lazy val bbox: BBox = BBox(p.x, p.y, p.x, p.y)
    def contains(q: Pt): Boolean = q == p
  }

  final case class LineString(pts: IndexedSeq[Pt]) extends Geometry {
    lazy val bbox: BBox = Geo.bboxOf(pts)
    def contains(q: Pt): Boolean = false
  }

  /** shell + holes, neither necessarily closed (first==last optional) */
  final case class Polygon(shell: IndexedSeq[Pt],
                           holes: Seq[IndexedSeq[Pt]] = Nil) extends Geometry {
    lazy val bbox: BBox = Geo.bboxOf(shell)
    def contains(p: Pt): Boolean =
      rayCast(shell, p) && !holes.exists(h => rayCast(h, p))
  }

  final case class MultiPolygon(polys: Seq[Polygon]) extends Geometry {
    lazy val bbox: BBox = Geo.bboxUnion(polys.map(_.bbox))
    def contains(p: Pt): Boolean = polys.exists(_.contains(p))
  }

  /** RFC 7946 §3.1.3 / shapely MultiPoint (utils.py:100-121 lists it in
    * PRIMITIVE_GEOMETRY_TYPES — accepted everywhere a geometry is). */
  final case class MultiPoint(points: Seq[Pt]) extends Geometry {
    lazy val bbox: BBox = Geo.bboxOf(points)
    def contains(q: Pt): Boolean = points.contains(q)
  }

  /** RFC 7946 §3.1.5 / shapely MultiLineString. */
  final case class MultiLineString(lines: Seq[IndexedSeq[Pt]]) extends Geometry {
    lazy val bbox: BBox = Geo.bboxUnion(lines.map(Geo.bboxOf))
    def contains(q: Pt): Boolean = false
  }

  /** RFC 7946 §3.1.8 / shapely GeometryCollection (utils.py
    * GEOMETRY_COLLECTION_TYPE): heterogeneous members; every spatial
    * predicate is the union (∃ member) of the members' answers, matching
    * shapely's collection semantics. */
  final case class GeometryCollection(members: Seq[Geometry]) extends Geometry {
    lazy val bbox: BBox = Geo.bboxUnion(members.map(_.bbox))
    def contains(p: Pt): Boolean = members.exists(_.contains(p))
  }

  def bboxUnion(bs: Iterable[BBox]): BBox = bs.reduce((a, b) =>
    BBox(math.min(a.xMin, b.xMin), math.min(a.yMin, b.yMin),
      math.max(a.xMax, b.xMax), math.max(a.yMax, b.yMax)))

  /** Composite geometries decomposed to primitive members (identity on
    * Point/LineString/Polygon). Lets every pairwise predicate reduce to
    * the primitive × primitive core. */
  def primitives(g: Geometry): Seq[Geometry] = g match {
    case MultiPolygon(ps) => ps
    case MultiPoint(ps) => ps.map(Point)
    case MultiLineString(ls) => ls.map(LineString)
    case GeometryCollection(ms) => ms.flatMap(primitives)
    case prim => Seq(prim)
  }

  def bboxOf(pts: Iterable[Pt]): BBox = {
    // reject empty point sets LOUDLY as a client error: valid GeoJSON
    // permits empty coordinate arrays, and `.min` on an empty
    // collection would throw UnsupportedOperationException — which the
    // server maps to a 500 instead of the 400 a bad body deserves
    require(pts.nonEmpty, "empty geometry (no coordinates)")
    // single fold (bbox sits on predicate hot paths): one pass, no
    // intermediate collections
    var xMin = Double.PositiveInfinity; var yMin = Double.PositiveInfinity
    var xMax = Double.NegativeInfinity; var yMax = Double.NegativeInfinity
    pts.foreach { p =>
      if (p.x < xMin) xMin = p.x
      if (p.y < yMin) yMin = p.y
      if (p.x > xMax) xMax = p.x
      if (p.y > yMax) yMax = p.y
    }
    BBox(xMin, yMin, xMax, yMax)
  }

  /** Even-odd ray casting (horizontal ray to +inf). Half-open edge rule
    * gives consistent results for points off the boundary. */
  def rayCast(ring: IndexedSeq[Pt], p: Pt): Boolean = {
    val n = ring.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val a = ring(i); val b = ring(j)
      if ((a.y > p.y) != (b.y > p.y)) {
        val xCross = (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x
        if (p.x < xCross) inside = !inside
      }
      j = i; i += 1
    }
    inside
  }

  /** Segment intersection (incl. collinear overlap / endpoint touch). */
  def segmentsIntersect(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Boolean = {
    def orient(a: Pt, b: Pt, c: Pt): Double =
      (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x)
    def onSeg(a: Pt, b: Pt, c: Pt): Boolean =
      math.min(a.x, b.x) <= c.x && c.x <= math.max(a.x, b.x) &&
        math.min(a.y, b.y) <= c.y && c.y <= math.max(a.y, b.y)
    val d1 = orient(q1, q2, p1); val d2 = orient(q1, q2, p2)
    val d3 = orient(p1, p2, q1); val d4 = orient(p1, p2, q2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else (d1 == 0 && onSeg(q1, q2, p1)) || (d2 == 0 && onSeg(q1, q2, p2)) ||
      (d3 == 0 && onSeg(p1, p2, q1)) || (d4 == 0 && onSeg(p1, p2, q2))
  }

  /** Does the segment a→b overlap the rectangle with positive length?
    * Liang-Barsky clip; a degenerate touch (passing exactly through a
    * corner) yields a zero-length interval and does NOT count — this
    * matches rasterio's all_touched behavior on the reference goldens
    * (test_utils.py:111-119: corner-grazing cells stay unmasked). */
  def segmentOverlapsRect(a: Pt, b: Pt, r: BBox): Boolean = {
    val dx = b.x - a.x
    val dy = b.y - a.y
    var t0 = 0.0
    var t1 = 1.0
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0
      else {
        val t = q / p
        if (p < 0) { if (t > t1) return false; if (t > t0) t0 = t }
        else { if (t < t0) return false; if (t < t1) t1 = t }
        true
      }
    }
    clip(-dx, a.x - r.xMin) && clip(dx, r.xMax - a.x) &&
      clip(-dy, a.y - r.yMin) && clip(dy, r.yMax - a.y) && t1 > t0
  }

  /** Does `geom` intersect the axis-aligned rectangle (with positive
    * measure along edges)? Used by the all_touched rasterizer. */
  def intersectsRect(geom: Geometry, r: BBox): Boolean = geom match {
    case Point(p) => r.contains(p)
    case LineString(pts) =>
      ringEdges(pts, closed = false).exists {
        case (a, b) => segmentOverlapsRect(a, b, r) }
    case poly @ Polygon(shell, holes) =>
      if (!poly.bbox.intersects(r)) false
      else {
        def strictlyInside(p: Pt): Boolean =
          p.x > r.xMin && p.x < r.xMax && p.y > r.yMin && p.y < r.yMax
        val rings = shell +: holes
        rings.exists(_.exists(strictlyInside)) ||
          rings.exists(ring => ringEdges(ring, closed = true).exists {
            case (a, b) => segmentOverlapsRect(a, b, r) }) ||
          poly.contains(Pt((r.xMin + r.xMax) / 2, (r.yMin + r.yMax) / 2))
      }
    case MultiPolygon(ps) => ps.exists(intersectsRect(_, r))
    case MultiPoint(ps) => ps.exists(r.contains)
    case MultiLineString(ls) => ls.exists(l => intersectsRect(LineString(l), r))
    case GeometryCollection(ms) => ms.exists(intersectsRect(_, r))
  }

  /** Is p on segment a→b (collinear within a small tolerance and inside
    * the segment's bbox)? Tolerance is absolute on the cross product —
    * adequate for lon/lat-magnitude coordinates. */
  def onSegment(a: Pt, b: Pt, p: Pt): Boolean = {
    val cross = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    math.abs(cross) <= 1e-9 &&
      math.min(a.x, b.x) - 1e-12 <= p.x && p.x <= math.max(a.x, b.x) + 1e-12 &&
      math.min(a.y, b.y) - 1e-12 <= p.y && p.y <= math.max(a.y, b.y) + 1e-12
  }

  /** Point inside the polygon or on any of its ring boundaries
    * (shapely `intersects` counts boundaries). */
  def pointInOrOn(poly: Polygon, p: Pt): Boolean =
    poly.contains(p) || (poly.shell +: poly.holes).exists(ring =>
      ringEdges(ring, closed = true).exists { case (a, b) => onSegment(a, b, p) })

  private def allRingEdges(poly: Polygon): Seq[(Pt, Pt)] =
    (poly.shell +: poly.holes).flatMap(ringEdges(_, closed = true))

  /** Exact geometry × geometry intersection predicate for every type
    * pair (reference J1 full semantics: shapely
    * `geometry.intersects(query_geometry)` at places.py:88-91 — touching
    * boundaries count). Decision procedure per pair:
    * vertex-containment both ways (covers full containment) plus
    * pairwise edge intersection over all rings (covers partial overlap
    * and boundary touch); a bbox rejection test runs first. */
  def intersects(a: Geometry, b: Geometry): Boolean = {
    if (!a.bbox.intersects(b.bbox)) return false
    (a, b) match {
      // composites (Multi*/Collection) = ∃ primitive member intersecting
      // (shapely collection semantics); decompose the left side first,
      // then the right, so only primitive pairs reach the core below.
      case (c @ (_: MultiPolygon | _: MultiPoint | _: MultiLineString |
                 _: GeometryCollection), g) =>
        primitives(c).exists(intersects(_, g))
      case (g, c @ (_: MultiPolygon | _: MultiPoint | _: MultiLineString |
                    _: GeometryCollection)) =>
        primitives(c).exists(intersects(g, _))
      case (Point(p), Point(q)) => p == q
      case (Point(p), LineString(pts)) =>
        ringEdges(pts, closed = false).exists { case (u, v) => onSegment(u, v, p) }
      case (ls: LineString, pt: Point) => intersects(pt, ls)
      case (Point(p), poly: Polygon) => pointInOrOn(poly, p)
      case (poly: Polygon, pt: Point) => intersects(pt, poly)
      case (LineString(p1), LineString(p2)) =>
        val e2 = ringEdges(p2, closed = false)
        ringEdges(p1, closed = false).exists { case (u1, v1) =>
          e2.exists { case (u2, v2) => segmentsIntersect(u1, v1, u2, v2) } }
      case (ls: LineString, poly: Polygon) =>
        ls.pts.exists(pointInOrOn(poly, _)) || {
          val pe = allRingEdges(poly)
          ringEdges(ls.pts, closed = false).exists { case (u1, v1) =>
            pe.exists { case (u2, v2) => segmentsIntersect(u1, v1, u2, v2) } }
        }
      case (poly: Polygon, ls: LineString) => intersects(ls, poly)
      case (pa: Polygon, pb: Polygon) =>
        pa.shell.exists(pointInOrOn(pb, _)) ||
          pb.shell.exists(pointInOrOn(pa, _)) || {
            val eb = allRingEdges(pb)
            allRingEdges(pa).exists { case (u1, v1) =>
              eb.exists { case (u2, v2) => segmentsIntersect(u1, v1, u2, v2) } }
          }
    }
  }

  /** Parse a GeoJSON geometry object (the `geometry` member of a
    * feature, RFC 7946 §3.1) into [[Geometry]]. Jackson is already on
    * Spark's classpath. */
  def parseGeoJson(json: String): Geometry = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def pt(n: com.fasterxml.jackson.databind.JsonNode): Pt =
      Pt(n.get(0).asDouble(), n.get(1).asDouble())
    def pts(n: com.fasterxml.jackson.databind.JsonNode): IndexedSeq[Pt] =
      (0 until n.size()).map(i => pt(n.get(i)))
    def poly(n: com.fasterxml.jackson.databind.JsonNode): Polygon = {
      require(n.size() > 0, "empty Polygon coordinates")
      Polygon(pts(n.get(0)), (1 until n.size()).map(i => pts(n.get(i))))
    }
    node.get("type").asText() match {
      case "GeometryCollection" =>
        // RFC 7946 §3.1.8: members under "geometries", not "coordinates"
        val gs = node.get("geometries")
        require(gs != null && gs.size() > 0,
          "empty GeometryCollection") // EMPTY is valid GeoJSON but has
        // no bbox — reject at PARSE time as a client error, not deep
        // inside a predicate (possibly a Spark UDF → 500)
        GeometryCollection((0 until gs.size()).map(i =>
          parseGeoJson(gs.get(i).toString)))
      case ty =>
        val coords = node.get("coordinates")
        require(coords != null &&
          (if (ty == "Point") coords.size() >= 2 else coords.size() > 0),
          s"empty $ty coordinates")
        ty match {
          case "Point" => Point(pt(coords))
          case "LineString" => LineString(pts(coords))
          case "Polygon" => poly(coords)
          case "MultiPoint" => MultiPoint(pts(coords))
          case "MultiLineString" =>
            MultiLineString((0 until coords.size()).map(i => pts(coords.get(i))))
          case "MultiPolygon" =>
            MultiPolygon((0 until coords.size()).map(i => poly(coords.get(i))))
          case other =>
            throw new IllegalArgumentException(s"unsupported geometry type $other")
        }
    }
  }

  private def ringEdges(pts: IndexedSeq[Pt], closed: Boolean): Seq[(Pt, Pt)] = {
    val base = pts.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
    if (closed && pts.nonEmpty && pts.head != pts.last)
      base :+ ((pts.last, pts.head))
    else base
  }

  /** Rasterize a geometry onto a grid, reference semantics
    * (xcube_server/utils.py:73-83: rasterio.features.geometry_mask with
    * all_touched=True, invert=True): mask(y,x) = true iff the geometry
    * touches any part of cell (y,x). Row 0 is the TOP row — the affine
    * places lat_min + res*height at the top edge, y increasing downward.
    *
    * Returned as `mask(y)(x)`, height rows by width cols. The per-query
    * mask is computed on the driver for the (small) bbox window and
    * broadcast as an include-list for the zonal semi-join (SURVEY J3).
    */
  def geometryMask(width: Int, height: Int, geom: Geometry,
                   lonMin: Double, latMin: Double, res: Double): Array[Array[Boolean]] = {
    val latMax = latMin + res * height
    val mask = Array.tabulate(height) { y =>
      val yTop = latMax - res * y
      val yBot = yTop - res
      Array.tabulate(width) { x =>
        val x0 = lonMin + res * x
        intersectsRect(geom, BBox(x0, yBot, x0 + res, yTop))
      }
    }
    // GDAL assigns each ring VERTEX to its floor pixel even when the
    // touch has zero measure (endpoint of a boundary segment on a cell
    // corner) — reproduces the 401×401=160801 box golden
    // (test_time_series.py:63-73) without re-adding the transversal
    // corner-grazing cells the triangle golden excludes.
    vertices(geom).foreach { p =>
      val cx = math.floor((p.x - lonMin) / res).toInt
      val cy = math.floor((latMax - p.y) / res).toInt
      if (cx >= 0 && cx < width && cy >= 0 && cy < height) mask(cy)(cx) = true
    }
    mask
  }

  private def vertices(geom: Geometry): Seq[Pt] = geom match {
    case Point(p) => Seq(p)
    case LineString(pts) => pts
    case Polygon(shell, holes) => shell ++ holes.flatten
    case MultiPolygon(ps) => ps.flatMap(p => p.shell ++ p.holes.flatten)
    case MultiPoint(ps) => ps
    case MultiLineString(ls) => ls.flatten
    case GeometryCollection(ms) => ms.flatMap(vertices)
  }

  /** Antimeridian-aware bbox → geometry (xcube_server/utils.py:56-70):
    * east < west means the box crosses the antimeridian and splits into
    * two boxes forming a MultiPolygon. */
  def boxSplitGeometry(lonMin: Double, latMin: Double,
                       lonMax: Double, latMax: Double): Geometry =
    if (lonMax >= lonMin) boxPolygon(lonMin, latMin, lonMax, latMax)
    else MultiPolygon(Seq(
      boxPolygon(lonMin, latMin, 180.0, latMax),
      boxPolygon(-180.0, latMin, lonMax, latMax)))

  def boxPolygon(xMin: Double, yMin: Double, xMax: Double, yMax: Double): Polygon =
    Polygon(IndexedSeq(Pt(xMin, yMin), Pt(xMax, yMin), Pt(xMax, yMax),
      Pt(xMin, yMax), Pt(xMin, yMin)))

  // --- WKT (reference: shapely.wkt.loads at places.py:46-49) ---

  /** Parse POINT / LINESTRING / POLYGON / MULTIPOLYGON WKT. */
  def parseWkt(wkt: String): Geometry = {
    val s = wkt.trim
    val upper = s.toUpperCase
    def body(prefix: String): String = {
      val i = s.indexOf('(')
      // paren-less input (e.g. the standard `POINT EMPTY` form, or
      // plain garbage) must be a CLIENT error, not a
      // StringIndexOutOfBoundsException the server maps to a 500
      require(i >= 0, s"unparseable WKT (no coordinate body): $wkt")
      s.substring(i).trim
    }
    def coords(str: String): IndexedSeq[Pt] =
      str.split(",").iterator.map { pair =>
        val xs = pair.trim.split("\\s+")
        Pt(xs(0).toDouble, xs(1).toDouble)
      }.toIndexedSeq
    def rings(str: String): Seq[IndexedSeq[Pt]] = {
      // str = ((...),(...)) — split top-level parenthesized groups
      val inner = str.trim.stripPrefix("(").stripSuffix(")")
      splitTopLevel(inner).map(g => coords(g.trim.stripPrefix("(").stripSuffix(")")))
    }
    if (upper.startsWith("GEOMETRYCOLLECTION")) {
      // members are full WKT geometries; their commas are nested, so
      // the depth-0 split isolates them
      val inner = body("GEOMETRYCOLLECTION").stripPrefix("(").stripSuffix(")")
      GeometryCollection(splitTopLevel(inner).map(m => parseWkt(m.trim)))
    } else if (upper.startsWith("MULTIPOINT")) {
      // both WKT forms: MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
      val inner = body("MULTIPOINT").stripPrefix("(").stripSuffix(")")
      MultiPoint(splitTopLevel(inner).map { g =>
        coords(g.trim.stripPrefix("(").stripSuffix(")")).head
      })
    } else if (upper.startsWith("MULTILINESTRING")) {
      val inner = body("MULTILINESTRING").stripPrefix("(").stripSuffix(")")
      MultiLineString(splitTopLevel(inner).map(g =>
        coords(g.trim.stripPrefix("(").stripSuffix(")"))))
    } else if (upper.startsWith("POINT")) {
      val c = coords(body("POINT").stripPrefix("(").stripSuffix(")"))
      Point(c.head)
    } else if (upper.startsWith("LINESTRING")) {
      LineString(coords(body("LINESTRING").stripPrefix("(").stripSuffix(")")))
    } else if (upper.startsWith("MULTIPOLYGON")) {
      val inner = body("MULTIPOLYGON").trim.stripPrefix("(").stripSuffix(")")
      MultiPolygon(splitTopLevel(inner).map { polyStr =>
        val rs = rings(polyStr.trim)
        Polygon(rs.head, rs.tail)
      })
    } else if (upper.startsWith("POLYGON")) {
      val rs = rings(body("POLYGON"))
      Polygon(rs.head, rs.tail)
    } else throw new IllegalArgumentException(s"unsupported WKT: ${s.take(40)}")
  }

  /** Split "(a),(b),(c)" at depth-0 commas. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }
}
