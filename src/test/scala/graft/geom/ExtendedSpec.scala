package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class ExtendedSpec extends AnyFunSuite {

  private def wkt(s: String): Geometry = Wkt.read(s)
  private def w(g: Geometry): String = Wkt.write(g)

  // ------------------------------------------------------------- reverse

  test("reverse flips coordinate order per path and ring orientation") {
    assert(w(Extended.reverse(wkt("LINESTRING (0 0, 1 1, 2 0)"))) ==
      "LINESTRING (2 0, 1 1, 0 0)")
    assert(w(Extended.reverse(wkt("POLYGON ((0 0, 4 0, 4 4, 0 0))"))) ==
      "POLYGON ((0 0, 4 4, 4 0, 0 0))")
    assert(w(Extended.reverse(wkt("POINT (3 4)"))) == "POINT (3 4)")
    assert(w(Extended.reverse(wkt("MULTILINESTRING ((0 0, 1 0), (2 2, 3 3))"))) ==
      "MULTILINESTRING ((1 0, 0 0), (3 3, 2 2))")
  }

  test("reverse keeps Z aligned with its vertex") {
    val l = wkt("LINESTRING Z (0 0 5, 1 1 6, 2 0 7)")
    assert(w(Extended.reverse(l)) == "LINESTRING Z (2 0 7, 1 1 6, 0 0 5)")
  }

  test("reverse is an involution") {
    val g = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 4))")
    assert(w(Extended.reverse(Extended.reverse(g))) == w(g))
  }

  // ------------------------------------------------------------- force2d

  test("force2d drops Z everywhere") {
    assert(w(Extended.force2d(wkt("POINT Z (1 2 3)"))) == "POINT (1 2)")
    assert(w(Extended.force2d(wkt("LINESTRING Z (0 0 1, 1 1 2)"))) ==
      "LINESTRING (0 0, 1 1)")
    assert(!Extended.force2d(wkt("MULTIPOINT Z ((1 1 9), (2 2 8))")).hasZ)
    // 2D input passes through
    assert(w(Extended.force2d(wkt("POINT (1 2)"))) == "POINT (1 2)")
  }

  // ---------------------------------------------------------- segmentize

  test("segmentize splits long segments evenly and keeps length") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    val s = Extended.segmentize(l, 3.0).asInstanceOf[LineString]
    // ceil(10/3)=4 pieces -> 5 points at 0, 2.5, 5, 7.5, 10
    assert(s.size == 5)
    assert(s.xy.sameElements(Array(0.0, 0.0, 2.5, 0.0, 5.0, 0.0, 7.5, 0.0, 10.0, 0.0)))
    assert(Measures.length(s) == 10.0)
    // already-short segments untouched
    assert(w(Extended.segmentize(wkt("LINESTRING (0 0, 1 0)"), 3.0)) ==
      "LINESTRING (0 0, 1 0)")
  }

  test("segmentize densifies polygon rings and preserves area") {
    val p = wkt("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))")
    val s = Extended.segmentize(p, 2.0).asInstanceOf[Polygon]
    assert(s.shell.length / 2 == 13) // 4 sides x 3 pieces + closing point
    assert(Measures.area(s) == 36.0)
  }

  test("segmentize interpolates Z linearly") {
    val l = wkt("LINESTRING Z (0 0 0, 10 0 10)")
    val s = Extended.segmentize(l, 5.0).asInstanceOf[LineString]
    assert(s.zs.toSeq == Seq(0.0, 5.0, 10.0))
  }

  test("segmentize rejects non-positive maxLen") {
    intercept[IllegalArgumentException](Extended.segmentize(wkt("POINT (0 0)"), 0.0))
  }

  // ----------------------------------------------- removeRepeatedPoints

  test("removeRepeatedPoints drops consecutive duplicates within tolerance") {
    assert(w(Extended.removeRepeatedPoints(
      wkt("LINESTRING (0 0, 0 0, 1 0, 1 0, 2 0)"), 0.0)) ==
      "LINESTRING (0 0, 1 0, 2 0)")
    // tolerance-based: vertices within 0.5 of the last kept one go
    assert(w(Extended.removeRepeatedPoints(
      wkt("LINESTRING (0 0, 0.3 0, 2 0, 2.2 0, 5 0)"), 0.5)) ==
      "LINESTRING (0 0, 2 0, 5 0)")
    // last point always kept (ring closure)
    assert(w(Extended.removeRepeatedPoints(
      wkt("POLYGON ((0 0, 4 0, 4 0, 4 4, 0 0))"), 0.0)) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    // multipoints unchanged per shapely
    assert(w(Extended.removeRepeatedPoints(wkt("MULTIPOINT ((1 1), (1 1))"), 0.0)) ==
      "MULTIPOINT ((1 1), (1 1))")
  }

  // ----------------------------------------------- extractUniquePoints

  test("extractUniquePoints keeps first-occurrence order, drops dups") {
    assert(w(Extended.extractUniquePoints(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 0))"))) ==
      "MULTIPOINT ((0 0), (4 0), (4 4))")
    assert(w(Extended.extractUniquePoints(
      wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))"))) ==
      "MULTIPOINT ((0 0), (1 1), (2 2))")
  }

  // ----------------------------------------- minimum bounding circle

  test("minimumBoundingCenterRadius: square, collinear, single point") {
    val (cx, cy, r) = Extended.minimumBoundingCenterRadius(
      wkt("MULTIPOINT ((0 0), (4 0), (4 4), (0 4))"))
    assert(math.abs(cx - 2) < 1e-12 && math.abs(cy - 2) < 1e-12)
    assert(math.abs(r - 2 * math.sqrt(2)) < 1e-12)

    val (lx, ly, lr) = Extended.minimumBoundingCenterRadius(
      wkt("LINESTRING (0 0, 1 0, 10 0)"))
    assert(math.abs(lx - 5) < 1e-12 && math.abs(ly) < 1e-12 && math.abs(lr - 5) < 1e-12)

    val (px, py, pr) = Extended.minimumBoundingCenterRadius(wkt("POINT (7 8)"))
    assert(px == 7 && py == 8 && pr == 0.0)
  }

  test("minimumBoundingCircle contains every vertex") {
    val g = wkt("MULTIPOINT ((0 0), (3 7), (-2 4), (5 5), (1 -3))")
    val (cx, cy, r) = Extended.minimumBoundingCenterRadius(g)
    g.foreachCoord((x, y) =>
      assert(math.hypot(x - cx, y - cy) <= r + 1e-9))
    // and at least two vertices lie ON the circle (it is minimal)
    var onCircle = 0
    g.foreachCoord((x, y) =>
      if (math.abs(math.hypot(x - cx, y - cy) - r) < 1e-9) onCircle += 1)
    assert(onCircle >= 2)
    val circle = Extended.minimumBoundingCircle(g, 16)
    assert(math.abs(Measures.area(circle) - math.Pi * r * r) < 0.01 * r * r)
  }

  // ------------------------------------------------- oriented envelope

  test("orientedEnvelope recovers a rotated rectangle") {
    val w0 = 6.0; val h0 = 2.0; val theta = math.toRadians(30)
    val corners = Seq((0.0, 0.0), (w0, 0.0), (w0, h0), (0.0, h0)).map { case (x, y) =>
      (x * math.cos(theta) - y * math.sin(theta),
        x * math.sin(theta) + y * math.cos(theta))
    }
    val mp = MultiPoint(corners.map { case (x, y) => Point(x, y) }.toArray)
    val env = Extended.orientedEnvelope(mp)
    assert(math.abs(Measures.area(env) - w0 * h0) < 1e-9)
    // axis-aligned bbox of the rotated rect is strictly larger
    assert(env.envelope.area > w0 * h0 + 1.0)
  }

  test("orientedEnvelope degenerates like GEOS: point and collinear input") {
    assert(w(Extended.orientedEnvelope(wkt("POINT (1 2)"))) == "POINT (1 2)")
    val col = Extended.orientedEnvelope(wkt("MULTIPOINT ((0 0), (2 2), (5 5))"))
    assert(col.isInstanceOf[LineString]) // hull of collinear points
  }

  // ------------------------------------------------------ shortestLine

  test("shortestLine between parallel segments") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    val b = wkt("LINESTRING (2 3, 12 3)")
    val sl = Extended.shortestLine(a, b).asInstanceOf[LineString]
    assert(Measures.length(sl) == 3.0)
    assert(sl.y(0) == 0.0 && sl.y(1) == 3.0)
    assert(sl.x(0) == sl.x(1)) // perpendicular
  }

  test("shortestLine endpoint order is (on a, on b)") {
    val a = wkt("POINT (0 0)")
    val b = wkt("LINESTRING (5 -5, 5 5)")
    val sl = Extended.shortestLine(a, b).asInstanceOf[LineString]
    assert(sl.x(0) == 0.0 && sl.y(0) == 0.0)
    assert(sl.x(1) == 5.0 && sl.y(1) == 0.0)
  }

  test("shortestLine of intersecting geometries is zero-length at a shared point") {
    val a = wkt("LINESTRING (0 0, 10 10)")
    val b = wkt("LINESTRING (0 10, 10 0)")
    val sl = Extended.shortestLine(a, b).asInstanceOf[LineString]
    assert(Measures.length(sl) == 0.0)
    assert(sl.x(0) == 5.0 && sl.y(0) == 5.0)
    // point inside polygon
    val in = Extended.shortestLine(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      wkt("POINT (2 2)")).asInstanceOf[LineString]
    assert(Measures.length(in) == 0.0)
  }

  test("shortestLine matches distance on polygon pairs") {
    val a = wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = wkt("POLYGON ((5 1, 7 1, 7 3, 5 3, 5 1))")
    val sl = Extended.shortestLine(a, b)
    assert(math.abs(Measures.length(sl) - Measures.distance(a, b)) < 1e-12)
  }

  // --------------------------------------------------------- lineMerge

  test("lineMerge joins chains at degree-2 nodes") {
    val m = wkt("MULTILINESTRING ((0 0, 2 0), (2 0, 2 3), (5 5, 6 6))")
    val merged = Extended.lineMerge(m)
    assert(merged.numGeometries == 2)
    val parts = (0 until 2).map(i => merged.geometryN(i).asInstanceOf[LineString])
    val chain = parts.find(_.size == 3).get
    assert(Measures.length(chain) == 5.0)
    assert(parts.map(Measures.length(_)).sum ==
      Measures.length(m))
  }

  test("lineMerge respects direction (reverses segments as needed)") {
    // second segment points INTO the junction: must reverse to chain
    val m = wkt("MULTILINESTRING ((0 0, 2 0), (5 0, 2 0))")
    val merged = Extended.lineMerge(m)
    assert(merged.isInstanceOf[LineString])
    assert(Measures.length(merged) == 5.0)
    assert(merged.asInstanceOf[LineString].size == 3)
  }

  test("lineMerge does not merge through degree-3 junctions") {
    val m = wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 5))")
    val merged = Extended.lineMerge(m)
    assert(merged.numGeometries == 3) // the 3-way node blocks all merging
  }

  test("lineMerge closes pure cycles") {
    val m = wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 1 1), (1 1, 0 0))")
    val merged = Extended.lineMerge(m)
    assert(merged.isInstanceOf[LineString])
    val l = merged.asInstanceOf[LineString]
    assert(l.isClosed && l.size == 4)
  }

  // ----------------------------------------------------- delaunayTriangles

  test("delaunay of a single triangle is that triangle") {
    val dt = Extended.delaunayTriangles(wkt("MULTIPOINT (0 0, 4 0, 0 3)"))
    assert(dt.numGeometries == 1)
    assert(math.abs(Measures.area(dt) - 6.0) < 1e-12)
  }

  test("delaunay of rectangle corners plus center is the 4-triangle fan") {
    val dt = Extended.delaunayTriangles(
      wkt("MULTIPOINT (0 0, 4 0, 4 6, 0 6, 2 3)"))
    assert(dt.numGeometries == 4)
    assert(math.abs(Measures.area(dt) - 24.0) < 1e-9)
  }

  test("delaunay of degenerate input is empty") {
    assert(Extended.delaunayTriangles(wkt("MULTIPOINT (0 0, 1 1)")).numGeometries == 0)
    // collinear points admit no triangle
    assert(Extended.delaunayTriangles(
      wkt("MULTIPOINT (0 0, 1 1, 2 2, 3 3)")).numGeometries == 0)
  }

  test("delaunay covers the convex hull and satisfies the empty-circumcircle property") {
    // deterministic scatter (no cocircular quadruples)
    val pts = (0 until 20).map { i =>
      val x = (i * 37 % 17) + 0.01 * i
      val y = (i * 53 % 13) + 0.007 * i * i
      (x, y)
    }
    val mp = MultiPoint(pts.map { case (x, y) => Point(x, y) }.toArray)
    val dt = Extended.delaunayTriangles(mp).asInstanceOf[GeometryCollection]
    val hull = Constructive.convexHull(mp)
    assert(math.abs(Measures.area(dt) - Measures.area(hull)) < 1e-9)
    // empty circumcircle: no input point strictly inside any triangle's circumcircle
    dt.geoms.foreach { tg =>
      val r = tg.asInstanceOf[Polygon].rings(0)
      val (ax, ay, bx, by, cx, cy) = (r(0), r(1), r(2), r(3), r(4), r(5))
      val d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
        (cx * cx + cy * cy) * (ay - by)) / d
      val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
        (cx * cx + cy * cy) * (bx - ax)) / d
      val r2 = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
      pts.foreach { case (px, py) =>
        val d2 = (px - ux) * (px - ux) + (py - uy) * (py - uy)
        assert(d2 >= r2 - 1e-7, s"point ($px,$py) inside circumcircle of triangle")
      }
    }
  }

  // --------------------------------------------------------- frechetDistance

  test("frechet of identical lines is zero; parallel offset is the offset") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    assert(Extended.frechetDistance(a, a) == 0.0)
    val b = wkt("LINESTRING (0 3, 10 3)")
    assert(Extended.frechetDistance(a, b) == 3.0)
  }

  test("frechet two-vertex golden value and symmetry") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    val b = wkt("LINESTRING (0 1, 10 2)")
    // min over monotone couplings = max(d11, d22) = max(1, 2)
    assert(Extended.frechetDistance(a, b) == 2.0)
    assert(Extended.frechetDistance(b, a) == 2.0)
  }

  test("frechet is discrete (vertex pairing, no densify)") {
    // the zig vertex (5,1) must pair with one END of the straight line:
    // discrete frechet = sqrt(26), far above the continuous value 1 —
    // matching shapely frechet_distance without densify
    val a = wkt("LINESTRING (0 0, 5 1, 10 0)")
    val b = wkt("LINESTRING (0 0, 10 0)")
    assert(math.abs(Extended.frechetDistance(a, b) - math.sqrt(26)) < 1e-12)
    // densified comparison side brings it down toward the continuous value
    val bd = wkt("LINESTRING (0 0, 5 0, 10 0)")
    assert(Extended.frechetDistance(a, bd) == 1.0)
  }

  // ------------------------------------------------------------ offsetCurve

  test("offsetCurve single segment offsets left for positive distance") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    assert(w(Extended.offsetCurve(l, 2.0)) == "LINESTRING (0 2, 10 2)")
    assert(w(Extended.offsetCurve(l, -2.0)) == "LINESTRING (0 -2, 10 -2)")
  }

  test("offsetCurve miters an L corner with closed-form endpoint") {
    val l = wkt("LINESTRING (0 0, 4 0, 4 3)")
    val left = Extended.offsetCurve(l, 0.5).asInstanceOf[LineString]
    assert(w(left) == "LINESTRING (0 0.5, 3.5 0.5, 3.5 3)")
    assert(math.abs(Measures.length(left) - 6.0) < 1e-12)
    val right = Extended.offsetCurve(l, -0.5).asInstanceOf[LineString]
    assert(w(right) == "LINESTRING (0 -0.5, 4.5 -0.5, 4.5 3)")
    assert(math.abs(Measures.length(right) - 8.0) < 1e-12)
  }

  test("offsetCurve zero distance and degenerate inputs pass through; areal throws") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    assert(w(Extended.offsetCurve(l, 0.0)) == w(l))
    intercept[IllegalArgumentException] {
      Extended.offsetCurve(wkt("POLYGON ((0 0, 1 0, 0 1, 0 0))"), 1.0)
    }
  }

  // ----------------------------------------------------------- samplePoints

  test("samplePoints returns exactly size points, all interior, reproducibly") {
    val tri = wkt("POLYGON ((0 0, 8 0, 0 6, 0 0))")
    val s1 = Extended.samplePoints(tri, 25, 42L)
    assert(s1.numGeometries == 25)
    s1.asInstanceOf[MultiPoint].pts.foreach { p =>
      assert(Predicates.locate(p.x, p.y, tri) == Predicates.IN)
    }
    val s2 = Extended.samplePoints(tri, 25, 42L)
    assert(w(s1) == w(s2))
    val s3 = Extended.samplePoints(tri, 25, 7L)
    assert(w(s1) != w(s3))
  }

  test("samplePoints edge cases: size zero, empty and zero-area geometries") {
    val tri = wkt("POLYGON ((0 0, 8 0, 0 6, 0 0))")
    assert(Extended.samplePoints(tri, 0, 1L).numGeometries == 0)
    assert(Extended.samplePoints(wkt("POLYGON EMPTY"), 5, 1L).numGeometries == 0)
    assert(Extended.samplePoints(wkt("LINESTRING (0 0, 1 1)"), 5, 1L).numGeometries == 0)
  }

  // ----------------------------------------------------------------- isCcw

  test("isCcw detects ring winding; false for open lines and non-lines") {
    assert(Extended.isCcw(wkt("LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")))
    assert(!Extended.isCcw(wkt("LINESTRING (0 0, 0 4, 4 4, 4 0, 0 0)")))
    assert(!Extended.isCcw(wkt("LINESTRING (0 0, 4 0, 4 4)")))
    assert(!Extended.isCcw(wkt("POINT (1 1)")))
  }

  // ------------------------------------------------------------- normalize

  test("normalize orients shells CW / holes CCW starting at the min vertex") {
    val p = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))")
    assert(w(Extended.normalize(p)) ==
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
  }

  test("normalize directs lines start <= end; closed lines rotate to min CCW") {
    assert(w(Extended.normalize(wkt("LINESTRING (5 0, 0 0)"))) ==
      "LINESTRING (0 0, 5 0)")
    assert(w(Extended.normalize(wkt("LINESTRING (0 0, 5 0)"))) ==
      "LINESTRING (0 0, 5 0)")
    assert(w(Extended.normalize(wkt("LINESTRING (4 4, 0 4, 0 0, 4 0, 4 4)"))) ==
      "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)")
  }

  test("normalize sorts multi components descending (GEOS order)") {
    assert(w(Extended.normalize(wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"))) ==
      "MULTILINESTRING ((2 2, 3 3), (0 0, 1 1))")
    assert(w(Extended.normalize(wkt("MULTIPOINT ((1 1), (3 3), (2 2))"))) ==
      "MULTIPOINT ((3 3), (2 2), (1 1))")
  }

  test("normalize is idempotent") {
    val g = wkt("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    val n1 = Extended.normalize(g)
    assert(w(Extended.normalize(n1)) == w(n1))
  }

  // ------------------------------------------------------------------ snap

  test("snap moves vertices to nearby target vertices within tolerance") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    assert(w(Extended.snap(l, wkt("POINT (0.05 0.05)"), 0.1)) ==
      "LINESTRING (0.05 0.05, 10 0)")
    // tolerance too small: unchanged
    assert(w(Extended.snap(l, wkt("POINT (0.05 0.05)"), 0.01)) == w(l))
  }

  test("snap inserts target vertices lying within tolerance of a segment") {
    val l = wkt("LINESTRING (0 0, 10 0)")
    assert(w(Extended.snap(l, wkt("POINT (5 0.05)"), 0.1)) ==
      "LINESTRING (0 0, 5 0.05, 10 0)")
  }

  test("snap preserves ring closure on polygons") {
    val p = wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val snapped = Extended.snap(p, wkt("POINT (0.02 -0.03)"), 0.1).asInstanceOf[Polygon]
    val r = snapped.rings(0)
    assert(r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
    assert(r(0) == 0.02 && r(1) == -0.03)
  }

  // ----------------------------------------------------- minimumClearance

  test("minimumClearance finds the nearest vertex-to-segment notch") {
    // the classic JTS example shape: clearance = distance from the notch
    // vertex (0.5, 0.2) to the bottom edge
    val p = wkt("POLYGON ((0 0, 1 0, 1 1, 0.5 0.2, 0 1, 0 0))")
    assert(math.abs(Extended.minimumClearance(p) - 0.2) < 1e-12)
  }

  // ----------------------------------------------------------- concaveHull

  test("concaveHull at ratio 1 is the convex hull") {
    val mp = wkt("MULTIPOINT (0 0, 6 0, 6 1, 1 1, 1 3, 0 3, 3 0.5)")
    val ch = Extended.concaveHull(mp, 1.0)
    val cvx = Constructive.convexHull(mp)
    assert(math.abs(Measures.area(ch) - Measures.area(cvx)) < 1e-9)
  }

  test("concaveHull recovers an L-shape notch at low ratio") {
    // L corners, w=h=4: the notch diagonal (4,1)-(1,4) (len 4.24) is the
    // longest border edge, erodes first to its opposite vertex (1,1), and
    // every other erosion is then blocked because the opposite vertex is
    // already on the boundary
    val mp = wkt("MULTIPOINT (0 0, 4 0, 4 1, 1 1, 1 4, 0 4)")
    val ch = Extended.concaveHull(mp, 0.0)
    assert(math.abs(Measures.area(ch) - 7.0) < 1e-9) // L area = w + h - 1
    // contains every input point
    mp.asInstanceOf[MultiPoint].pts.foreach { p =>
      assert(Predicates.locate(p.x, p.y, ch) != Predicates.OUT)
    }
  }

  test("concaveHull area is monotone in ratio and always covers the input") {
    val pts = (0 until 30).map { i =>
      Point((i * 37 % 19) + 0.013 * i, (i * 53 % 17) + 0.007 * i * i % 5)
    }
    val mp = MultiPoint(pts.toArray)
    val areas = Seq(0.0, 0.3, 0.7, 1.0).map { r =>
      val ch = Extended.concaveHull(mp, r)
      pts.foreach(p => assert(Predicates.locate(p.x, p.y, ch) != Predicates.OUT,
        s"ratio $r lost point $p"))
      Measures.area(ch)
    }
    assert(areas == areas.sorted)
  }

  test("concaveHull degenerate inputs fall back to the convex hull") {
    assert(Measures.length(Extended.concaveHull(wkt("MULTIPOINT (0 0, 2 2)"), 0.5)) ==
      Measures.length(Constructive.convexHull(wkt("MULTIPOINT (0 0, 2 2)"))))
  }

  // ------------------------------------------------------- voronoiPolygons

  test("voronoi of 4 rectangle corners: 4 congruent cells tiling the clip box") {
    val v = Extended.voronoiPolygons(wkt("MULTIPOINT (0 0, 4 0, 0 2, 4 2)"))
      .asInstanceOf[GeometryCollection]
    assert(v.numGeometries == 4)
    // clip = envelope expanded by max(w,h)=4 per side: [-4,8] x [-4,6]
    val total = v.geoms.map(Measures.area).sum
    assert(math.abs(total - 12.0 * 10.0) < 1e-9)
    // each cell: (4/2+4) x (2/2+4) = 6 x 5
    v.geoms.foreach(c => assert(math.abs(Measures.area(c) - 30.0) < 1e-9))
    // first cell belongs to the first site (0,0)
    assert(Predicates.locate(0, 0, v.geoms(0)) == Predicates.IN)
  }

  test("voronoi cells contain their sites and partition without overlap") {
    val sites = Seq((0.0, 0.0), (3.0, 1.0), (1.0, 4.0), (5.0, 3.0), (2.5, 2.0))
    val mp = MultiPoint(sites.map { case (x, y) => Point(x, y) }.toArray)
    val v = Extended.voronoiPolygons(mp).asInstanceOf[GeometryCollection]
    assert(v.numGeometries == 5)
    sites.zipWithIndex.foreach { case ((x, y), i) =>
      assert(Predicates.locate(x, y, v.geoms(i)) == Predicates.IN,
        s"site $i not in its cell")
      // each site is in exactly its own cell
      v.geoms.zipWithIndex.foreach { case (c, j) =>
        if (j != i) assert(Predicates.locate(x, y, c) == Predicates.OUT)
      }
    }
    // cells tile the clip envelope: area sums to the clip box
    val total = v.geoms.map(Measures.area).sum
    // site envelope [0,5]x[0,4], m=5 -> clip 15 x 14
    assert(math.abs(total - 15.0 * 14.0) < 1e-9)
  }

  test("voronoi edge cases: empty and single site") {
    assert(Extended.voronoiPolygons(wkt("MULTIPOINT EMPTY")).numGeometries == 0)
    val one = Extended.voronoiPolygons(wkt("POINT (2 2)"))
      .asInstanceOf[GeometryCollection]
    assert(one.numGeometries == 1)
    assert(math.abs(Measures.area(one.geoms(0)) - 4.0) < 1e-9) // 2x2 clip (m=1)
  }

  // ---------------------------------------------------------- relatePattern

  test("relatePattern matches T/F/digit/* against the DE-9IM matrix") {
    val box = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val in = wkt("POINT (5 5)")
    val out = wkt("POINT (20 20)")
    assert(Predicates.relatePattern(in, box, "T*F**F***"))  // within
    assert(!Predicates.relatePattern(out, box, "T*F**F***"))
    assert(Predicates.relatePattern(out, box, "FF*FF****")) // disjoint
    assert(Predicates.relatePattern(in, box, "0********")) // exact dim
    assert(!Predicates.relatePattern(in, box, "1********"))
    assert(Predicates.relatePattern(in, box, "*********"))
    intercept[IllegalArgumentException] {
      Predicates.relatePattern(in, box, "T*F")
    }
  }

  // ------------------------------------------------------------ sharedPaths

  test("sharedPaths splits collinear overlaps by direction") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    val sp = Extended.sharedPaths(a, wkt("LINESTRING (3 0, 7 0)"))
      .asInstanceOf[GeometryCollection]
    assert(sp.numGeometries == 2)
    assert(Measures.length(sp.geoms(0)) == 4.0) // same direction
    assert(Measures.length(sp.geoms(1)) == 0.0)
    val spOpp = Extended.sharedPaths(a, wkt("LINESTRING (7 0, 3 0)"))
      .asInstanceOf[GeometryCollection]
    assert(Measures.length(spOpp.geoms(0)) == 0.0)
    assert(Measures.length(spOpp.geoms(1)) == 4.0)
  }

  test("sharedPaths handles partial overlap, disjoint and non-collinear lines") {
    val a = wkt("LINESTRING (0 0, 10 0)")
    // overlap clipped to [4, 10]
    val sp = Extended.sharedPaths(a, wkt("LINESTRING (4 0, 15 0)"))
      .asInstanceOf[GeometryCollection]
    assert(Measures.length(sp.geoms(0)) == 6.0)
    // crossing at an angle shares nothing
    val cross = Extended.sharedPaths(a, wkt("LINESTRING (5 -1, 5 1)"))
      .asInstanceOf[GeometryCollection]
    assert(Measures.length(cross.geoms(0)) == 0.0 &&
      Measures.length(cross.geoms(1)) == 0.0)
    intercept[IllegalArgumentException] {
      Extended.sharedPaths(a, wkt("POINT (1 1)"))
    }
  }

  test("maximumInscribedCircle: closed-form shapes, holes, multipolygon") {
    def mic(s: String, tol: Double = 1e-3): (Double, Double, Double) = {
      val l = Extended.maximumInscribedCircle(wkt(s), tol).asInstanceOf[LineString]
      val r = Measures.length(l)
      (l.xy(0), l.xy(1), r)
    }
    // square 10x10: incircle r=5 centered
    val (sx, sy, sr) = mic("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(math.abs(sr - 5.0) < 0.01 &&
      math.abs(sx - 5.0) < 0.01 && math.abs(sy - 5.0) < 0.01)
    // rectangle 20x6: r=3, center on the y=3 midline (x anywhere in [3,17])
    val (rx, ry, rr) = mic("POLYGON ((0 0, 20 0, 20 6, 0 6, 0 0))")
    assert(math.abs(rr - 3.0) < 0.01 && math.abs(ry - 3.0) < 0.01 &&
      rx > 2.9 && rx < 17.1)
    // 9-12-15 right triangle: incircle r = (9+12-15)/2 = 3 at (3,3)
    val (tx, ty, tr) = mic("POLYGON ((0 0, 12 0, 0 9, 0 0))")
    assert(math.abs(tr - 3.0) < 0.01 &&
      math.abs(tx - 3.0) < 0.01 && math.abs(ty - 3.0) < 0.01)
    // 20x10 outer, centered 8x4 hole: best circle sits in a side band,
    // r = min((20-8)/2, 10)/2 = 3 (top/bottom bands allow only 1.5)
    val (hx, hy, hr) = mic(
      "POLYGON ((0 0, 20 0, 20 10, 0 10, 0 0), (6 3, 14 3, 14 7, 6 7, 6 3))")
    assert(math.abs(hr - 3.0) < 0.01, s"hole case r=$hr at ($hx,$hy)")
    // multipolygon: converges into the larger part
    val (mx2, _, mr2) = mic(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 20 0, 20 10, 10 10, 10 0)))")
    assert(math.abs(mr2 - 5.0) < 0.01 && mx2 > 10.0)
    // radius equals the returned line's length and the center is covered
    val line = Extended.maximumInscribedCircle(
      wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 1e-3)
      .asInstanceOf[LineString]
    assert(Predicates.covers(wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      Point(line.xy(0), line.xy(1))))
    // determinism: two runs bit-identical
    val a = Extended.maximumInscribedCircle(wkt(
      "POLYGON ((0 0, 20 0, 20 6, 0 6, 0 0))"), 1e-3).asInstanceOf[LineString]
    val b = Extended.maximumInscribedCircle(wkt(
      "POLYGON ((0 0, 20 0, 20 6, 0 6, 0 0))"), 1e-3).asInstanceOf[LineString]
    assert(a.xy.sameElements(b.xy))
    // empty and non-areal inputs
    assert(Extended.maximumInscribedCircle(wkt("POLYGON EMPTY"), 1e-3).isEmpty)
    intercept[IllegalArgumentException] {
      Extended.maximumInscribedCircle(wkt("LINESTRING (0 0, 1 1)"), 1e-3)
    }
  }

  test("snapToGrid: quantization, dedupe, degenerate collapse") {
    def s(g: String, size: Double): String = Wkt.write(Extended.snapToGrid(wkt(g), size))
    assert(s("POINT (1.26 -0.74)", 0.5) == "POINT (1.5 -0.5)")
    // consecutive duplicates collapse; the line survives
    assert(s("LINESTRING (0 0, 0.1 0.1, 0.2 0.1, 3 3)", 1.0) ==
      "LINESTRING (0 0, 3 3)")
    // a line collapsing to one point becomes empty
    assert(Extended.snapToGrid(wkt("LINESTRING (0 0, 0.2 0.2, 0.3 0.1)"), 1.0).isEmpty)
    // rectangle snaps; area matches the grid corners
    assert(Measures.area(Extended.snapToGrid(
      wkt("POLYGON ((0.3 0.2, 4.7 0.2, 4.7 2.6, 0.3 2.6, 0.3 0.2))"), 1.0)) == 15.0)
    // a thin sliver's ring degenerates -> empty polygon
    assert(Extended.snapToGrid(
      wkt("POLYGON ((0 0, 0.2 0, 0.2 5, 0 5, 0 0))"), 1.0).isEmpty)
    // hole collapse drops only the hole
    val holed = Extended.snapToGrid(wkt(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4.2 4, 4.2 4.2, 4 4.2, 4 4))"), 1.0)
    assert(Measures.area(holed) == 100.0 &&
      holed.asInstanceOf[Polygon].numHoles == 0)
    // multipolygon drops collapsed parts and keeps the survivor's coords
    val mp = Extended.snapToGrid(wkt(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((8 0, 8.2 0, 8.2 0.2, 8 0.2, 8 0)))"),
      1.0).asInstanceOf[MultiPolygon]
    assert(mp.polys.length == 1 &&
      Wkt.write(mp.polys(0)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Extended.snapToGrid(wkt("MULTIPOINT ((0.1 0.1), (0.2 0.2), (3 3))"), 1.0)
      .asInstanceOf[MultiPoint].pts.length == 2)
    // half-way rounding rule: floor(x/size + 0.5) rounds .5 UP
    assert(s("POINT (0.25 -0.25)", 0.5) == "POINT (0.5 0)")
    // Z passes through untouched (PostGIS contract) and stays aligned
    // with its vertex across the dedupe
    assert(s("POINT Z (1.26 -0.74 9.5)", 0.5) == "POINT Z (1.5 -0.5 9.5)")
    val zl = Extended.snapToGrid(
      wkt("LINESTRING Z (0 0 1, 0.1 0.1 2, 3 3 7)"), 1.0).asInstanceOf[LineString]
    assert(zl.zs.toSeq == Seq(1.0, 7.0), zl.zs.toSeq.toString)
  }

  test("chaikinSmooth: exact quarter-blend corners, preserved line endpoints") {
    // unit square, one iteration: the exact octagon of 1/4 and 3/4 points
    val oct = Extended.chaikinSmooth(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), 1).asInstanceOf[Polygon]
    assert(oct.rings.head.length == 18) // 8 corners + closing duplicate
    assert(Wkt.write(oct) ==
      "POLYGON ((1 0, 3 0, 4 1, 4 3, 3 4, 1 4, 0 3, 0 1, 1 0))")
    assert(math.abs(Measures.area(oct) - 14.0) < 1e-12) // 16 - 4*(1/2*1*1)

    // line keeps BOTH endpoints; the corner is cut at 3/4 and 1/4
    val l = Extended.chaikinSmooth(
      wkt("LINESTRING (0 0, 4 0, 4 4)"), 1).asInstanceOf[LineString]
    assert(Wkt.write(l) == "LINESTRING (0 0, 3 0, 4 1, 4 4)")

    // second iteration doubles ring corners; smoothed stays inside input
    val oct2 = Extended.chaikinSmooth(
      wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), 2).asInstanceOf[Polygon]
    assert(oct2.rings.head.length == 34)
    assert(Predicates.within(oct2, wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))

    // short inputs pass through; collections recurse
    assert(Wkt.write(Extended.chaikinSmooth(wkt("LINESTRING (0 0, 1 1)"), 1))
      == "LINESTRING (0 0, 1 1)")
    val gc = Extended.chaikinSmooth(
      wkt("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 4 0, 4 4))"), 1)
    assert(Wkt.write(gc) ==
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 0, 4 1, 4 4))")
  }

  test("geometricMedian: outlier robustness, singularity, passthrough") {
    // symmetric cross: the median IS the center regardless of iterations
    val cross = wkt("MULTIPOINT ((1 0), (-1 0), (0 1), (0 -1))")
    val c = Extended.geometricMedian(cross, 3).asInstanceOf[Point]
    assert(math.abs(c.x) < 1e-12 && math.abs(c.y) < 1e-12)

    // an extreme outlier drags the MEAN far but the median stays near the
    // cluster (robustness — the reason the operator exists)
    val out = wkt("MULTIPOINT ((0 0), (1 0), (0 1), (1 1), (1000 1000))")
    val m = Extended.geometricMedian(out, 20).asInstanceOf[Point]
    assert(m.x < 2.0 && m.y < 2.0, s"median dragged to $m")

    // mean coincides with an input point: returns it instead of 1/0
    val sing = wkt("MULTIPOINT ((0 0), (1 0), (-1 0), (0 1), (0 -1))")
    val s = Extended.geometricMedian(sing, 5).asInstanceOf[Point]
    assert(s.x == 0.0 && s.y == 0.0)

    // single point passes through; polygons are rejected
    assert(Wkt.write(Extended.geometricMedian(wkt("POINT (3 4)"), 3)) == "POINT (3 4)")
    intercept[IllegalArgumentException] {
      Extended.geometricMedian(wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"), 3)
    }
  }

  test("longestLine/maxDistance: farthest vertex pair, deterministic ties") {
    val rect = wkt("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))")
    val p = wkt("POINT (-3 -2)")
    val ll = Extended.longestLine(p, rect).asInstanceOf[LineString]
    assert(ll.xy.toSeq == Seq(-3.0, -2.0, 4.0, 3.0))
    assert(math.abs(Extended.maxDistance(p, rect) - math.hypot(7, 5)) < 1e-12)
    // direction matters: a -> b endpoints in argument order
    val rev = Extended.longestLine(rect, p).asInstanceOf[LineString]
    assert(rev.xy.toSeq == Seq(4.0, 3.0, -3.0, -2.0))
    // tie (symmetric square around the origin point): FIRST maximal
    // vertex in ring order wins — deterministic
    val sq = wkt("POLYGON ((-1 -1, 1 -1, 1 1, -1 1, -1 -1))")
    val t = Extended.longestLine(wkt("POINT (0 0)"), sq).asInstanceOf[LineString]
    assert(t.xy.toSeq == Seq(0.0, 0.0, -1.0, -1.0))
    // multi-geometry and line inputs work off their vertex sets
    val d = Extended.maxDistance(
      wkt("MULTIPOINT ((0 0), (10 0))"), wkt("LINESTRING (0 5, 10 5)"))
    assert(math.abs(d - math.hypot(10, 5)) < 1e-12)
  }

  test("minimumClearance vertex-vertex case and infinite cases") {
    assert(Extended.minimumClearance(wkt("LINESTRING (0 0, 7 0)")) == 7.0)
    assert(Extended.minimumClearance(wkt("POINT (1 1)")).isPosInfinity)
    // coincident points carry no positive clearance
    assert(Extended.minimumClearance(wkt("MULTIPOINT ((0 0), (0 0))")).isPosInfinity)
  }
}
