package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Planar measures over the ADT (the math the reference outsources to
  * GEOS via shapely ufuncs — operator surface at reference
  * `dask_geopandas/expr.py:947-960`).
  */
object Measures {

  /** Shoelace area (holes subtracted); 0 for points/lines. */
  def area(g: Geometry): Double = g match {
    case p: Polygon =>
      if (p.isEmpty) 0.0
      else math.abs(signedRingArea(p.rings(0))) -
        (1 until p.rings.length).map(i => math.abs(signedRingArea(p.rings(i)))).sum
    case m: MultiPolygon        => m.polys.map(area).sum
    case gc: GeometryCollection => gc.geoms.map(area).sum
    case _                      => 0.0
  }

  def signedRingArea(ring: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i + 3 < n) {
      s += ring(i) * ring(i + 3) - ring(i + 2) * ring(i + 1)
      i += 2
    }
    s / 2.0
  }

  /** Curve length: linestring path length; polygon -> 0 (use perimeter). */
  def length(g: Geometry): Double = g match {
    case l: LineString          => pathLength(l.xy)
    case m: MultiLineString     => m.lines.map(length).sum
    case gc: GeometryCollection => gc.geoms.map(length).sum
    case _                      => 0.0
  }

  /** Boundary length of areal geometries (incl. holes). */
  def perimeter(g: Geometry): Double = g match {
    case p: Polygon             => p.rings.map(pathLength).sum
    case m: MultiPolygon        => m.polys.map(perimeter).sum
    case gc: GeometryCollection => gc.geoms.map(perimeter).sum
    case _                      => 0.0
  }

  def pathLength(xy: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < xy.length) {
      val dx = xy(i + 2) - xy(i); val dy = xy(i + 3) - xy(i + 1)
      s += math.sqrt(dx * dx + dy * dy)
      i += 2
    }
    s
  }

  // ------------------------------------------------------------- distance
  def distance(a: Geometry, b: Geometry): Double = {
    if (a.isEmpty || b.isEmpty) return Double.NaN
    if (Predicates.intersects(a, b)) return 0.0
    var min = Double.PositiveInfinity
    for (ga <- Geometry.parts(a); gb <- Geometry.parts(b)) {
      val d = partDistance(ga, gb)
      if (d < min) min = d
    }
    min
  }

  private def partDistance(a: Geometry, b: Geometry): Double = (a, b) match {
    case (p: Point, q: Point) => math.hypot(p.x - q.x, p.y - q.y)
    case (p: Point, l: LineString) => pointToPath(p.x, p.y, l.xy)
    case (l: LineString, p: Point) => pointToPath(p.x, p.y, l.xy)
    case (p: Point, poly: Polygon) =>
      // not intersecting (checked above) => point outside: distance to shell,
      // or inside a hole: distance to that hole ring
      poly.rings.map(r => pointToPath(p.x, p.y, r)).min
    case (poly: Polygon, p: Point) => partDistance(p, poly)
    case (l1: LineString, l2: LineString) => pathToPath(l1.xy, l2.xy)
    case (l: LineString, poly: Polygon) => poly.rings.map(r => pathToPath(l.xy, r)).min
    case (poly: Polygon, l: LineString) => partDistance(l, poly)
    case (p1: Polygon, p2: Polygon) =>
      (for (r1 <- p1.rings; r2 <- p2.rings) yield pathToPath(r1, r2)).min
    case _ => Double.PositiveInfinity
  }

  def pointToSegment(px: Double, py: Double, x1: Double, y1: Double,
      x2: Double, y2: Double): Double = {
    val dx = x2 - x1; val dy = y2 - y1
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return math.hypot(px - x1, py - y1)
    var t = ((px - x1) * dx + (py - y1) * dy) / len2
    if (t < 0) t = 0 else if (t > 1) t = 1
    math.hypot(px - (x1 + t * dx), py - (y1 + t * dy))
  }

  def pointToPath(px: Double, py: Double, xy: Array[Double]): Double = {
    if (xy.length == 2) return math.hypot(px - xy(0), py - xy(1))
    var min = Double.PositiveInfinity
    var i = 0
    while (i + 3 < xy.length) {
      val d = pointToSegment(px, py, xy(i), xy(i + 1), xy(i + 2), xy(i + 3))
      if (d < min) min = d
      i += 2
    }
    min
  }

  private def pathToPath(a: Array[Double], b: Array[Double]): Double = {
    var min = Double.PositiveInfinity
    var i = 0
    while (i + 3 < a.length || i == 0) {
      val hasSegA = i + 3 < a.length
      var j = 0
      while (j + 3 < b.length || j == 0) {
        val hasSegB = j + 3 < b.length
        val d =
          if (hasSegA && hasSegB)
            segToSeg(a(i), a(i + 1), a(i + 2), a(i + 3), b(j), b(j + 1), b(j + 2), b(j + 3))
          else if (hasSegA) pointToSegment(b(j), b(j + 1), a(i), a(i + 1), a(i + 2), a(i + 3))
          else if (hasSegB) pointToSegment(a(i), a(i + 1), b(j), b(j + 1), b(j + 2), b(j + 3))
          else math.hypot(a(i) - b(j), a(i + 1) - b(j + 1))
        if (d < min) min = d
        j += 2
        if (b.length <= 2) j = Int.MaxValue - 4
      }
      i += 2
      if (a.length <= 2) i = Int.MaxValue - 4
    }
    min
  }

  private def segToSeg(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Double = {
    if (Predicates.segmentsIntersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)) 0.0
    else math.min(
      math.min(pointToSegment(ax1, ay1, bx1, by1, bx2, by2),
        pointToSegment(ax2, ay2, bx1, by1, bx2, by2)),
      math.min(pointToSegment(bx1, by1, ax1, ay1, ax2, ay2),
        pointToSegment(bx2, by2, ax1, ay1, ax2, ay2)))
  }

  /** Hausdorff-lite: max over vertices of a of distance to b (both directions). */
  def hausdorffApprox(a: Geometry, b: Geometry): Double = {
    def oneWay(from: Geometry, to: Geometry): Double = {
      var mx = 0.0
      from.foreachCoord { (x, y) =>
        val d = distance(Point(x, y), to)
        if (d > mx) mx = d
      }
      mx
    }
    math.max(oneWay(a, b), oneWay(b, a))
  }
}

/** Topological predicates. Semantics follow OGC SFS (what shapely/GEOS
  * exposes; reference binding list at `dask_geopandas/expr.py:983-998`).
  * Implemented directly (point-in-ring, segment intersection, containment
  * tests) rather than via a full DE-9IM matrix engine.
  */
object Predicates {

  /** 2x2 determinant orientation: >0 left/CCW, <0 right/CW, 0 collinear. */
  @inline def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Collinearity up to relative rounding noise: the raw determinant is
    * compared against the operand magnitudes, so points derived from
    * floating-point arithmetic along one carrier line (t-parameterized
    * interpolation, reprojection) still register as collinear. Exact-zero
    * tests only catch exactly-representable (axis-aligned/integer) cases.
    */
  @inline def nearlyCollinear(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Boolean = {
    val cr = orient(ax, ay, bx, by, cx, cy)
    math.abs(cr) <= 1e-12 * math.hypot(bx - ax, by - ay) * math.hypot(cx - ax, cy - ay)
  }

  /** Closed-segment intersection test (touching counts). */
  def segmentsIntersect(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean = {
    val d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    val d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    if (d1 == 0 && onSegment(bx1, by1, bx2, by2, ax1, ay1)) return true
    if (d2 == 0 && onSegment(bx1, by1, bx2, by2, ax2, ay2)) return true
    if (d3 == 0 && onSegment(ax1, ay1, ax2, ay2, bx1, by1)) return true
    if (d4 == 0 && onSegment(ax1, ay1, ax2, ay2, bx2, by2)) return true
    false
  }

  /** Proper (interior) crossing — no endpoint/collinear touching. */
  def segmentsCrossProperly(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): Boolean = {
    val d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    val d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  /** is (px,py) on segment assuming collinear */
  @inline private def onSegment(x1: Double, y1: Double, x2: Double, y2: Double,
      px: Double, py: Double): Boolean =
    px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
      py >= math.min(y1, y2) && py <= math.max(y1, y2)

  final val OUT = 0
  final val ON = 1
  final val IN = 2

  /** Point-in-ring via ray casting with exact boundary detection. */
  def pointInRing(px: Double, py: Double, ring: Array[Double]): Int = {
    var inside = false
    var i = 0
    val n = ring.length
    while (i + 3 < n) {
      val x1 = ring(i); val y1 = ring(i + 1); val x2 = ring(i + 2); val y2 = ring(i + 3)
      // boundary?
      if (orient(x1, y1, x2, y2, px, py) == 0 && onSegment(x1, y1, x2, y2, px, py))
        return ON
      if ((y1 > py) != (y2 > py)) {
        val xin = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
        if (px < xin) inside = !inside
      }
      i += 2
    }
    if (inside) IN else OUT
  }

  /** Point in polygon with holes: IN/ON/OUT. */
  def pointInPolygon(px: Double, py: Double, poly: Polygon): Int = {
    if (poly.isEmpty || !poly.envelope.contains(px, py)) return OUT
    val inShell = pointInRing(px, py, poly.rings(0))
    if (inShell != IN) return inShell
    var r = 1
    while (r < poly.rings.length) {
      val inHole = pointInRing(px, py, poly.rings(r))
      if (inHole == IN) return OUT
      if (inHole == ON) return ON
      r += 1
    }
    IN
  }

  /** Locate point in any areal geometry. */
  def locate(px: Double, py: Double, g: Geometry): Int = g match {
    case p: Polygon => pointInPolygon(px, py, p)
    case m: MultiPolygon =>
      var res = OUT
      var i = 0
      while (i < m.polys.length && res != IN) {
        val l = pointInPolygon(px, py, m.polys(i))
        if (l > res) res = l
        i += 1
      }
      res
    case _ => OUT
  }

  private def pathsIntersect(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    while (i + 3 < a.length) {
      var j = 0
      while (j + 3 < b.length) {
        if (segmentsIntersect(a(i), a(i + 1), a(i + 2), a(i + 3),
            b(j), b(j + 1), b(j + 2), b(j + 3))) return true
        j += 2
      }
      i += 2
    }
    false
  }

  private def pathsCrossProperly(a: Array[Double], b: Array[Double]): Boolean = {
    var i = 0
    while (i + 3 < a.length) {
      var j = 0
      while (j + 3 < b.length) {
        if (segmentsCrossProperly(a(i), a(i + 1), a(i + 2), a(i + 3),
            b(j), b(j + 1), b(j + 2), b(j + 3))) return true
        j += 2
      }
      i += 2
    }
    false
  }

  private def rings(g: Geometry): Array[Array[Double]] = g match {
    case l: LineString      => Array(l.xy)
    case p: Polygon         => p.rings
    case m: MultiLineString => m.lines.map(_.xy)
    case m: MultiPolygon    => m.polys.flatMap(_.rings)
    case _                  => Array.empty
  }

  // ------------------------------------------------------------ intersects
  def intersects(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    val pa = Geometry.parts(a)
    val pb = Geometry.parts(b)
    pa.exists(ga => pb.exists(gb => partIntersects(ga, gb)))
  }

  private def partIntersects(a: Geometry, b: Geometry): Boolean = (a, b) match {
    case (p: Point, q: Point) => p.x == q.x && p.y == q.y
    case (p: Point, l: LineString) => pointOnPath(p.x, p.y, l.xy)
    case (l: LineString, p: Point) => pointOnPath(p.x, p.y, l.xy)
    case (p: Point, poly: Polygon) => pointInPolygon(p.x, p.y, poly) != OUT
    case (poly: Polygon, p: Point) => pointInPolygon(p.x, p.y, poly) != OUT
    case (l1: LineString, l2: LineString) =>
      l1.envelope.intersects(l2.envelope) && pathsIntersect(l1.xy, l2.xy)
    case (l: LineString, poly: Polygon) => lineIntersectsPolygon(l, poly)
    case (poly: Polygon, l: LineString) => lineIntersectsPolygon(l, poly)
    case (p1: Polygon, p2: Polygon) => polygonsIntersect(p1, p2)
    case _ => false
  }

  def pointOnPath(px: Double, py: Double, xy: Array[Double]): Boolean = {
    if (xy.length == 2) return px == xy(0) && py == xy(1)
    var i = 0
    while (i + 3 < xy.length) {
      if (orient(xy(i), xy(i + 1), xy(i + 2), xy(i + 3), px, py) == 0 &&
          onSegment(xy(i), xy(i + 1), xy(i + 2), xy(i + 3), px, py)) return true
      i += 2
    }
    false
  }

  private def lineIntersectsPolygon(l: LineString, poly: Polygon): Boolean = {
    if (!l.envelope.intersects(poly.envelope)) return false
    if (poly.rings.exists(r => pathsIntersect(l.xy, r))) return true
    // fully inside (or fully in a hole)
    pointInPolygon(l.x(0), l.y(0), poly) != OUT
  }

  private def polygonsIntersect(a: Polygon, b: Polygon): Boolean = {
    if (!a.envelope.intersects(b.envelope)) return false
    // ANY ring pair may carry the only contact: a polygon reaching into
    // the other's hole crosses just the HOLE ring, never the shells
    // (shell-only testing missed exactly that — caught by the alternate-
    // seed erosion fuzz via a disc at a hole corner)
    if (a.rings.exists(ra => b.rings.exists(rb => pathsIntersect(ra, rb))))
      return true
    // containment either way (vertex location accounts for holes)
    pointInPolygon(a.rings(0)(0), a.rings(0)(1), b) != OUT ||
      pointInPolygon(b.rings(0)(0), b.rings(0)(1), a) != OUT
  }

  def disjoint(a: Geometry, b: Geometry): Boolean = !intersects(a, b)

  // -------------------------------------------------------------- contains
  /** OGC contains: B within A, interiors intersect (boundary-only contact
    * is NOT containment). Multi-part line operands follow the DE-9IM mod-2
    * boundary rule (a point where two parts chain is interior), and spans
    * covered by the union of touching/overlapping line parts are accepted
    * via EXACT per-segment interval-merge coverage (r8 — no sampled
    * vertices/midpoints; a gap between parts under a sampled midpoint was
    * a proven false positive).
    */
  def contains(a: Geometry, b: Geometry): Boolean = covers(a, b, strictInterior = true)

  /** OGC covers: every point of B in A (boundary contact allowed). Same
    * multi-part line semantics and exact union coverage as [[contains]].
    */
  def covers(a: Geometry, b: Geometry): Boolean = covers(a, b, strictInterior = false)

  def within(a: Geometry, b: Geometry): Boolean = contains(b, a)
  def coveredBy(a: Geometry, b: Geometry): Boolean = covers(b, a)

  /** containsProperly: B in interior of A (no boundary contact at all). */
  def containsProperly(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.containsEnv(b.envelope)) return false
    Geometry.parts(b).forall(gb => partCoveredStrict(gb, a))
  }

  private def partCoveredStrict(b: Geometry, a: Geometry): Boolean = b match {
    case p: Point => locate(p.x, p.y, a) == IN
    case l: LineString =>
      allVerticesLocated(l, a, allowOn = false) && !boundariesCross(a, b)
    case poly: Polygon =>
      allVerticesLocated(LineString(poly.rings(0)), a, allowOn = false) &&
        !boundariesCross(a, b)
    case _ => false
  }

  private def covers(a: Geometry, b: Geometry, strictInterior: Boolean): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.containsEnv(b.envelope)) return false
    (a, b) match {
      case (p: Point, q: Point) => p.x == q.x && p.y == q.y
      case (_: Point, _) => b.topoDim == 0 && Geometry.parts(b).forall {
        case q: Point => Geometry.parts(a).exists { case p: Point => p.x == q.x && p.y == q.y; case _ => false }
        case _        => false
      }
      case (l: LineString, q: Point) =>
        if (!pointOnPath(q.x, q.y, l.xy)) false
        else if (!strictInterior) true
        else !(q.x == l.x(0) && q.y == l.y(0) && !l.isClosed) &&
          !(q.x == l.x(l.size - 1) && q.y == l.y(l.size - 1) && !l.isClosed)
      // multi-part / collection a that `locate` cannot treat as one areal
      // operand: decompose BOTH sides — every part of b covered by some
      // single part of a, OR (line parts) by the UNION of a's line parts
      // via EXACT per-segment interval-merge coverage (spans covered only
      // by touching/overlapping parts are accepted, gaps are not). A point
      // at a part-chaining endpoint counts as interior per the DE-9IM
      // mod-2 boundary rule (odd endpoint multiplicity = boundary),
      // consistent with lineVertexInteriorContact.
      // MultiPolygon stays on the areal branch below (locate handles it).
      case _ if (a match {
        case _: MultiPoint | _: MultiLineString | _: GeometryCollection => true
        case _ => false
      }) =>
        val partsA = Geometry.parts(a).filterNot(_.isEmpty)
        lazy val linePaths = partsA.collect { case l: LineString if l.size > 1 => l.xy }
        // mod-2 boundary of a's line parts: endpoints occurring an odd
        // number of times; a chaining vertex (even count) is interior.
        // Endpoints are CLUSTERED within the same 1e-9 tolerance the
        // interval-merge coverage uses for part bridging — parts chained
        // at endpoints an ulp apart must register as ONE chaining vertex
        // (even multiplicity), not two boundary points, or contains would
        // flip inconsistently with the span-coverage result.
        lazy val oddEndpoints: Seq[(Double, Double)] = {
          val eps = 1e-9
          val reps = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
          val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
          partsA.foreach {
            case l: LineString if !l.isClosed && l.size > 0 =>
              Seq((l.x(0), l.y(0)), (l.x(l.size - 1), l.y(l.size - 1))).foreach { p =>
                val i = reps.indexWhere(q =>
                  math.abs(q._1 - p._1) <= eps && math.abs(q._2 - p._2) <= eps)
                if (i >= 0) counts(i) += 1 else { reps += p; counts += 1 }
              }
            case _ =>
          }
          reps.indices.collect { case i if counts(i) % 2 == 1 => reps(i) }.toSeq
        }
        def isOddEndpoint(x: Double, y: Double): Boolean =
          oddEndpoints.exists(q =>
            math.abs(q._1 - x) <= 1e-9 && math.abs(q._2 - y) <= 1e-9)
        def onUnion(x: Double, y: Double): Boolean =
          linePaths.exists(p => pointOnPath(x, y, p))
        def unionCovers(pb: Geometry): Boolean = pb match {
          case q: Point =>
            onUnion(q.x, q.y) && (!strictInterior || !isOddEndpoint(q.x, q.y))
          case l2: LineString if linePaths.nonEmpty =>
            // EXACT union coverage via the interval-merge kernel (no
            // vertex/midpoint sampling — a gap between parts under a
            // sampled midpoint was a proven false positive). A 1-dim
            // covered span guarantees interior-interior contact, so
            // strictInterior needs no extra check here.
            Overlay.pathCoveredByPaths(l2.xy, linePaths)
          case _ => false
        }
        partsA.nonEmpty &&
          Geometry.parts(b).forall(pb =>
            partsA.exists(pa => covers(pa, pb, strictInterior)) || unionCovers(pb))
      case (_, _) if a.topoDim == 2 =>
        // every part of b must be covered by the areal geometry a
        val ok = Geometry.parts(b).forall {
          case q: Point =>
            val loc = locate(q.x, q.y, a)
            loc == IN || (!strictInterior && loc == ON)
          case l: LineString =>
            coveredPath(l.xy, a) && (!boundariesCrossPath(l.xy, a))
          case poly: Polygon =>
            coveredPath(poly.rings(0), a) && !boundariesCross(a, poly) &&
              // a's holes must not poke into b
              holesDisjointFromInterior(a, poly)
          case _ => false
        }
        if (!ok) false
        else if (!strictInterior) true
        else interiorsIntersect(a, b)
      case (l1: LineString, l2: LineString) =>
        // line covers line: EXACT interval-merge coverage of every b
        // segment by a's collinear runs (r8 — replaced vertex/midpoint
        // sampling, which could miss an uncovered sub-span between
        // on-path sample points)
        Overlay.pathCoveredByPaths(l2.xy, Seq(l1.xy))
      // single-part a with multi-part b: decompose b (the mirror of the
      // decompose-a branch above — without it these pairs fell through to
      // false even when every part of b lies on a). OGC contains needs
      // every part COVERED plus interior-interior contact SOMEWHERE — not
      // every part off a's boundary (GEOS returns true for a multipoint
      // with one member on the boundary and another in the interior).
      case _ if (b match {
        case _: MultiPoint | _: MultiLineString | _: GeometryCollection => true
        case _ => false
      }) =>
        val partsB = Geometry.parts(b).filterNot(_.isEmpty)
        partsB.nonEmpty && partsB.forall(pb => covers(a, pb, strictInterior = false)) &&
          (!strictInterior || partsB.exists(pb => covers(a, pb, strictInterior = true)))
      case _ => false
    }
  }

  /** All vertices and segment midpoints of `path` lie in/on areal geometry. */
  private def coveredPath(path: Array[Double], a: Geometry): Boolean = {
    var i = 0
    while (i + 1 < path.length) {
      if (locate(path(i), path(i + 1), a) == OUT) return false
      if (i + 3 < path.length) {
        val mx = (path(i) + path(i + 2)) / 2; val my = (path(i + 1) + path(i + 3)) / 2
        if (locate(mx, my, a) == OUT) return false
      }
      i += 2
    }
    true
  }


  private def allVerticesLocated(l: LineString, a: Geometry, allowOn: Boolean): Boolean = {
    var ok = true
    l.foreachCoord { (x, y) =>
      val loc = locate(x, y, a)
      if (loc == OUT || (!allowOn && loc == ON)) ok = false
    }
    ok
  }

  private def boundariesCross(a: Geometry, b: Geometry): Boolean = {
    val ra = rings(a); val rb = rings(b)
    ra.exists(r1 => rb.exists(r2 => pathsCrossProperly(r1, r2)))
  }

  private def boundariesCrossPath(path: Array[Double], a: Geometry): Boolean =
    rings(a).exists(r => pathsCrossProperly(path, r))

  private def holesDisjointFromInterior(a: Geometry, b: Polygon): Boolean = {
    // any hole of a strictly inside b's shell breaks coverage
    val holes: Array[Array[Double]] = a match {
      case p: Polygon      => p.rings.drop(1)
      case m: MultiPolygon => m.polys.flatMap(_.rings.drop(1))
      case _               => Array.empty
    }
    !holes.exists { h =>
      h.length >= 2 && pointInPolygon(h(0), h(1), b) == IN
    }
  }

  private def interiorsIntersect(a: Geometry, b: Geometry): Boolean = b match {
    case q: Point      => locate(q.x, q.y, a) == IN
    case l: LineString =>
      var any = false
      l.foreachCoord((x, y) => if (locate(x, y, a) == IN) any = true)
      if (any) true
      else {
        var i = 0
        var found = false
        while (i + 3 < l.xy.length && !found) {
          val mx = (l.xy(i) + l.xy(i + 2)) / 2; val my = (l.xy(i + 1) + l.xy(i + 3)) / 2
          if (locate(mx, my, a) == IN) found = true
          i += 2
        }
        found
      }
    case _: Polygon | _: MultiPolygon => true // coverage already established, areas overlap
    case mg: GeometryCollectionLike   => mg.children.exists(c => interiorsIntersect(a, c))
    case _                            => false
  }

  // ------------------------------------------------- touches/crosses/overlaps
  /** touches: intersect, but interiors do not. */
  def touches(a: Geometry, b: Geometry): Boolean = {
    if (!intersects(a, b)) return false
    (a, b) match {
      case (p: Point, q: Point) => false // point interiors are the points
      case (p: Point, _)        => boundaryContact(p, b)
      case (_, q: Point)        => boundaryContact(q, a)
      case _ =>
        if (a.topoDim == 2 && b.topoDim == 2) {
          // areas touch if they intersect but no interior overlap
          !areaInteriorsOverlap(a, b)
        } else if (a.topoDim == 2 || b.topoDim == 2) {
          val (areal, other) = if (a.topoDim == 2) (a, b) else (b, a)
          var anyIn = false
          other.foreachCoord((x, y) => if (locate(x, y, areal) == IN) anyIn = true)
          !anyIn && !boundariesCross(areal, other)
        } else {
          // line/line: touch only at boundary points — no proper mid-segment
          // crossing, no collinear interior run, and no contact at a vertex
          // interior to both lines (the X-crossing noded at a shared vertex)
          !pathsCrossAnyProperly(a, b) && !collinearOverlapInterior(a, b) &&
            !lineVertexInteriorContact(a, b)
        }
    }
  }

  private def boundaryContact(p: Point, g: Geometry): Boolean = g match {
    case poly: Polygon      => pointInPolygon(p.x, p.y, poly) == ON
    case m: MultiPolygon    => locate(p.x, p.y, m) == ON
    case l: LineString      =>
      !l.isClosed && ((p.x == l.x(0) && p.y == l.y(0)) ||
        (p.x == l.x(l.size - 1) && p.y == l.y(l.size - 1)))
    case m: MultiLineString => m.lines.exists(l => boundaryContact(p, l))
    case _                  => false
  }

  private def areaInteriorsOverlap(a: Geometry, b: Geometry): Boolean = {
    if (boundariesCross(a, b)) return true
    // vertex of one strictly inside other
    var in = false
    a.foreachCoord((x, y) => if (locate(x, y, b) == IN) in = true)
    if (in) return true
    b.foreachCoord((x, y) => if (locate(x, y, a) == IN) in = true)
    if (in) return true
    // No proper edge crossing and no vertex strictly inside — interiors can
    // STILL overlap when boundaries share collinear runs (e.g. equal-height
    // rectangles offset along x). Decide by the exact intersection area
    // (overlay is general for areal pairs).
    val inter = Overlay.intersection(a, b)
    inter.topoDim == 2 && Measures.area(inter) > 0
  }

  // same computation as boundariesCross; named for the line/line call sites
  // where the paths are not boundaries
  private def pathsCrossAnyProperly(a: Geometry, b: Geometry): Boolean =
    boundariesCross(a, b)

  private def collinearOverlapInterior(a: Geometry, b: Geometry): Boolean = {
    // lines sharing a positive-length COLLINEAR sub-segment. The old
    // midpoint-on-path test also fired for a transversal crossing that
    // happened to pass through a segment midpoint — collinearity of the
    // segment pair plus overlapping projections is the real condition.
    val ra = rings(a); val rb = rings(b)
    ra.exists { pa =>
      var i = 0
      var found = false
      while (i + 3 < pa.length && !found) {
        val ax = pa(i); val ay = pa(i + 1); val bx = pa(i + 2); val by = pa(i + 3)
        val useX = math.abs(bx - ax) >= math.abs(by - ay)
        val len = if (useX) bx - ax else by - ay
        if (len != 0) {
          found = rb.exists { pb =>
            var j = 0
            var f = false
            while (j + 3 < pb.length && !f) {
              if (nearlyCollinear(ax, ay, bx, by, pb(j), pb(j + 1)) &&
                nearlyCollinear(ax, ay, bx, by, pb(j + 2), pb(j + 3))) {
                val tc = if (useX) (pb(j) - ax) / len else (pb(j + 1) - ay) / len
                val td = if (useX) (pb(j + 2) - ax) / len else (pb(j + 3) - ay) / len
                if (math.min(1.0, math.max(tc, td)) > math.max(0.0, math.min(tc, td))) f = true
              }
              j += 2
            }
            f
          }
        }
        i += 2
      }
      found
    }
  }

  /** Interior(a) ∩ interior(b) POINT contact between two line geometries
    * that `pathsCrossProperly` misses: contact at a vertex of either line
    * (an X-crossing noded at the shared vertex has every segment pair
    * meeting at segment endpoints — orientation 0 — so no PROPER crossing
    * exists). A contact point is interior-interior when it is not a
    * boundary point of either side; the boundary of a (multi)line is the
    * set of component endpoints occurring an ODD number of times (DE-9IM
    * mod-2 rule), so a point where two parts chain is interior.
    */
  private def lineVertexInteriorContact(a: Geometry, b: Geometry): Boolean = {
    def boundaryPts(g: Geometry): Set[(Double, Double)] = {
      val counts = scala.collection.mutable.Map.empty[(Double, Double), Int]
      Geometry.parts(g).foreach {
        case l: LineString if !l.isClosed && l.size > 0 =>
          Seq((l.x(0), l.y(0)), (l.x(l.size - 1), l.y(l.size - 1)))
            .foreach(p => counts(p) = counts.getOrElse(p, 0) + 1)
        case _ =>
      }
      // NOT counts.collect { case (p, n) ... => p }: collecting Tuple2s
      // out of a Map rebuilds a MAP (the pair is read as key -> value), so
      // two boundary points sharing an x-coordinate would collapse into one
      counts.filter(_._2 % 2 == 1).keySet.toSet
    }
    val ba = boundaryPts(a)
    val bb = boundaryPts(b)
    def vertexOnOther(src: Geometry, dst: Geometry): Boolean = {
      var found = false
      src.foreachCoord { (x, y) =>
        if (!found && !ba.contains((x, y)) && !bb.contains((x, y)) &&
          rings(dst).exists(r => pointOnPath(x, y, r))) found = true
      }
      found
    }
    vertexOnOther(a, b) || vertexOnOther(b, a)
  }

  /** crosses: interiors intersect, dim(intersection) < max dim, neither contains other. */
  def crosses(a: Geometry, b: Geometry): Boolean = {
    if (!intersects(a, b)) return false
    (a.topoDim, b.topoDim) match {
      case (0, 1) | (0, 2) => somePointsIn(a, b) && somePointsOut(a, b)
      case (1, 0) | (2, 0) => somePointsIn(b, a) && somePointsOut(b, a)
      case (1, 1)          =>
        // dim(II) must be 0: a point contact (proper crossing OR interior
        // vertex contact) qualifies; a collinear interior run makes the
        // intersection 1-dimensional -> not crosses
        (pathsCrossAnyProperly(a, b) || lineVertexInteriorContact(a, b)) &&
          !collinearOverlapInterior(a, b)
      case (1, 2)          => lineCrossesArea(a, b)
      case (2, 1)          => lineCrossesArea(b, a)
      case _               => false
    }
  }

  private def somePointsIn(pts: Geometry, g: Geometry): Boolean = {
    var any = false
    pts.foreachCoord { (x, y) =>
      if (!any) {
        val in = g match {
          case areal if areal.topoDim == 2 => locate(x, y, areal) == IN
          case line => rings(line).exists(r => pointOnPath(x, y, r))
        }
        if (in) any = true
      }
    }
    any
  }

  private def somePointsOut(pts: Geometry, g: Geometry): Boolean = {
    var any = false
    pts.foreachCoord { (x, y) =>
      if (!any) {
        val out = g match {
          case areal if areal.topoDim == 2 => locate(x, y, areal) == OUT
          case line => !rings(line).exists(r => pointOnPath(x, y, r))
        }
        if (out) any = true
      }
    }
    any
  }

  private def lineCrossesArea(line: Geometry, area: Geometry): Boolean = {
    var in = false; var out = false
    line.foreachCoord { (x, y) =>
      locate(x, y, area) match {
        case IN  => in = true
        case OUT => out = true
        case _   =>
      }
    }
    (in && out) || (in && !covers(area, line)) ||
      (out && boundariesCross(area, line))
  }

  /** overlaps: same dim, interiors intersect, neither covers the other. */
  def overlaps(a: Geometry, b: Geometry): Boolean = {
    if (a.topoDim != b.topoDim || !intersects(a, b)) return false
    if (covers(a, b) || covers(b, a)) return false
    a.topoDim match {
      case 0 => somePointsIn(a, b) && somePointsOut(a, b) && somePointsOut(b, a)
      case 1 => collinearOverlapInterior(a, b)
      case 2 => areaInteriorsOverlap(a, b)
      case _ => false
    }
  }

  /** Exact structural equality of point sets — approximated by normalized
    * coordinates equality for identical types, or mutual coverage otherwise.
    */
  def geomEquals(a: Geometry, b: Geometry): Boolean = {
    if (a.isEmpty && b.isEmpty) return true
    if (a.isEmpty || b.isEmpty) return false
    if (a.envelope != b.envelope) return false
    if (a.topoDim != b.topoDim) return false
    if (a.topoDim == 2) covers(a, b) && covers(b, a)
    else if (a.topoDim == 0) {
      val sa = Geometry.parts(a).collect { case p: Point => (p.x, p.y) }.toSet
      val sb = Geometry.parts(b).collect { case p: Point => (p.x, p.y) }.toSet
      sa == sb
    } else {
      // mutual EXACT union coverage (r8): each side's every path covered by
      // the union of the other side's paths — handles one path equal to the
      // union of several opposite parts, which per-pair matching missed.
      // Paths come from flattened parts (NOT rings(), which is empty for
      // GeometryCollection and made two collections compare vacuously
      // equal). Point members of a mixed collection participate as point
      // sets: a point ON the other side's paths is set-redundant, a point
      // off them breaks equality.
      def paths(g: Geometry): Seq[Array[Double]] =
        Geometry.parts(g).collect { case l: LineString if !l.isEmpty => l.xy }
      def pts(g: Geometry): Seq[(Double, Double)] =
        Geometry.parts(g).collect { case p: Point if !p.isEmpty => (p.x, p.y) }
      val ra = paths(a); val rb = paths(b)
      val pa = pts(a); val pb = pts(b)
      def ptCovered(pt: (Double, Double), otherPaths: Seq[Array[Double]],
          otherPts: Seq[(Double, Double)]): Boolean =
        otherPaths.exists(r => pointOnPath(pt._1, pt._2, r)) || otherPts.contains(pt)
      ra.nonEmpty && rb.nonEmpty &&
        ra.forall(r => Overlay.pathCoveredByPaths(r, rb)) &&
        rb.forall(r => Overlay.pathCoveredByPaths(r, ra)) &&
        pa.forall(ptCovered(_, rb, pb)) &&
        pb.forall(ptCovered(_, ra, pa))
    }
  }

  /** geom_equals_exact: same structure within tolerance (reference
    * `dask_geopandas/expr.py:307-312`).
    */
  def geomEqualsExact(a: Geometry, b: Geometry, tol: Double): Boolean = {
    val ca = ArrayBuffer[Double]()
    val cb = ArrayBuffer[Double]()
    a.foreachCoord((x, y) => { ca += x; ca += y })
    b.foreachCoord((x, y) => { cb += x; cb += y })
    a.geometryType == b.geometryType && ca.length == cb.length &&
      ca.indices.forall(i => math.abs(ca(i) - cb(i)) <= tol)
  }

  /** DWithin: distance(a,b) <= d. */
  def dWithin(a: Geometry, b: Geometry, d: Double): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.expand(d).intersects(b.envelope)) return false
    Measures.distance(a, b) <= d
  }

  /** DE-9IM relate pattern (computed from the predicate set; interior/
    * boundary/exterior dims derived for the common type combinations).
    */
  /** All coordinates of a 0-dimensional geometry. */
  private def pointsOf(g: Geometry): Array[Point] = g match {
    case p: Point                  => Array(p)
    case m: MultiPoint             => m.pts
    case c: GeometryCollectionLike => c.children.flatMap(pointsOf)
    case _                         => Array.empty
  }

  /** Boundary points of a 1-dimensional geometry (mod-2 rule: endpoints of
    * non-closed parts occurring an odd number of times).
    */
  private def boundaryPointsOf(g: Geometry): Seq[(Double, Double)] = {
    val counts = scala.collection.mutable.Map.empty[(Double, Double), Int]
    Geometry.parts(g).foreach {
      case l: LineString if !l.isClosed && l.size >= 2 =>
        val e1 = (l.x(0), l.y(0)); val e2 = (l.x(l.size - 1), l.y(l.size - 1))
        counts(e1) = counts.getOrElse(e1, 0) + 1
        counts(e2) = counts.getOrElse(e2, 0) + 1
      case _ =>
    }
    counts.collect { case (p, n) if n % 2 == 1 => p }.toSeq
  }

  /** 3-way location of a point against ANY geometry: IN = interior,
    * ON = boundary, OUT. For lines, interior is the path minus the mod-2
    * boundary endpoints; for point geometries, the points ARE the interior.
    */
  private def locateFull(px: Double, py: Double, g: Geometry): Int = g match {
    case _: Polygon | _: MultiPolygon => locate(px, py, g)
    case _: LineString | _: MultiLineString =>
      if (boundaryPointsOf(g).contains((px, py))) ON
      else if (covers(g, Point(px, py))) IN
      else OUT
    case p: Point      => if (px == p.x && py == p.y) IN else OUT
    case m: MultiPoint => if (m.pts.exists(q => q.x == px && q.y == py)) IN else OUT
    case c: GeometryCollectionLike =>
      var res = OUT
      c.children.foreach { ch =>
        val l = locateFull(px, py, ch)
        if (l > res) res = l
      }
      res
    case _ => OUT
  }

  /** DE-9IM with a 0-dimensional side, built directly from point locations
    * (the generic derivation's covers-based proxies are wrong for points —
    * a point ON a polygon boundary is covered by it yet still meets its
    * boundary, so cell IB must read '0', not 'F').
    */
  private def relatePointish(a: Geometry, b: Geometry): String = {
    def dimC(cond: Boolean, dim: Int): Char =
      if (!cond || dim < 0) 'F' else if (dim == 0) '0' else if (dim == 1) '1' else '2'
    if (a.topoDim == 0 && b.topoDim == 0) {
      val as = pointsOf(a); val bs = pointsOf(b)
      def in(p: Point, s: Array[Point]) = s.exists(q => q.x == p.x && q.y == p.y)
      val ii = as.exists(in(_, bs))
      val ie = as.exists(!in(_, bs))
      val ei = bs.exists(!in(_, as))
      new String(Array(dimC(ii, 0), 'F', dimC(ie, 0), 'F', 'F', 'F',
        dimC(ei, 0), 'F', '2'))
    } else if (a.topoDim == 0) {
      val locs = pointsOf(a).map(p => locateFull(p.x, p.y, b))
      val bBoundDim = boundaryDim(b)
      // a finite point set can cover b's boundary only when that boundary
      // is itself a finite point set (line endpoints)
      val ebCovered = bBoundDim == 0 && {
        val as = pointsOf(a)
        boundaryPointsOf(b).forall { case (x, y) =>
          as.exists(p => p.x == x && p.y == y)
        }
      }
      new String(Array(
        dimC(locs.contains(IN), 0),
        dimC(bBoundDim >= 0 && locs.contains(ON), 0),
        dimC(locs.contains(OUT), 0),
        'F', 'F', 'F',
        dimC(true, b.topoDim),
        if (ebCovered) 'F' else dimC(true, bBoundDim),
        '2'))
    } else {
      val m = relatePointish(b, a)
      new String(Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))
    }
  }

  /** DE-9IM for two 1-dimensional geometries, built from the exact contact
    * kernels (proper crossings, collinear runs, vertex contacts, endpoint
    * locations, interval-merge path coverage) — the generic derivation's
    * covers proxies get II wrong for X-crossings ('1' instead of '0') and
    * IB wrong for endpoint-on-interior contacts.
    */
  private def relateLineLine(a: Geometry, b: Geometry): String = {
    val aB = boundaryPointsOf(a).toSet
    val bB = boundaryPointsOf(b).toSet
    def onGeom(p: (Double, Double), g: Geometry): Boolean =
      rings(g).exists(r => pointOnPath(p._1, p._2, r))
    val collin = collinearOverlapInterior(a, b)
    val contact0 = pathsCrossAnyProperly(a, b) || lineVertexInteriorContact(a, b)
    val ii: Char =
      if (collin) '1' else if (contact0) '0' else 'F'
    val ib = bB.exists(p => !aB.contains(p) && onGeom(p, a))
    val bi = aB.exists(p => !bB.contains(p) && onGeom(p, b))
    val bb = aB.exists(bB.contains)
    val be = aB.exists(p => !onGeom(p, b))
    val eb = bB.exists(p => !onGeom(p, a))
    val aCovered = rings(a).forall(p => Overlay.pathCoveredByPaths(p, rings(b).toSeq))
    val bCovered = rings(b).forall(p => Overlay.pathCoveredByPaths(p, rings(a).toSeq))
    new String(Array(ii,
      if (ib) '0' else 'F',
      if (aCovered) 'F' else '1',
      if (bi) '0' else 'F',
      if (bb) '0' else 'F',
      if (be) '0' else 'F',
      if (bCovered) 'F' else '1',
      if (eb) '0' else 'F',
      '2'))
  }

  /** DE-9IM for a 1-dimensional a against a 2-dimensional b. Straight
    * segments can only meet a ring transversally (proper crossing), at a
    * vertex of one of the paths, or along a collinear run — so the exact
    * contact kernels classify cell IB completely, and interior runs are
    * classified by vertex + segment-midpoint location (exact between
    * contacts for straight segments).
    */
  private def relateLineArea(a: Geometry, b: Geometry): String = {
    val aB = boundaryPointsOf(a).toSet
    val cross = pathsCrossAnyProperly(a, b)
    val collin = collinearOverlapInterior(a, b)
    val vertexContact = lineVertexInteriorContact(a, b)
    var anyIn = false; var anyOut = false
    rings(a).foreach { p =>
      var i = 0
      while (i + 1 < p.length) {
        if (!aB.contains((p(i), p(i + 1)))) {
          val l = locate(p(i), p(i + 1), b)
          if (l == IN) anyIn = true else if (l == OUT) anyOut = true
        }
        if (i + 3 < p.length) {
          val l = locate((p(i) + p(i + 2)) / 2, (p(i + 1) + p(i + 3)) / 2, b)
          if (l == IN) anyIn = true else if (l == OUT) anyOut = true
        }
        i += 2
      }
    }
    if (cross) { anyIn = true; anyOut = true }
    val ib: Char =
      if (collin) '1'
      else if (cross || vertexContact) '0'
      else 'F'
    val endLocs = aB.toSeq.map(p => locate(p._1, p._2, b))
    val ringsCovered = rings(b).forall(r =>
      Overlay.pathCoveredByPaths(r, rings(a).toSeq))
    new String(Array(
      if (anyIn) '1' else 'F',
      ib,
      if (anyOut) '1' else 'F',
      if (endLocs.contains(IN)) '0' else 'F',
      if (endLocs.contains(ON)) '0' else 'F',
      if (endLocs.contains(OUT)) '0' else 'F',
      '2',
      if (ringsCovered) 'F' else '1',
      '2'))
  }

  def relate(a: Geometry, b: Geometry): String = {
    // GEOS/shapely reject relate on heterogeneous GeometryCollections
    // (IllegalArgumentException) — matching that beats returning a matrix
    // the mixed-dimension machinery cannot make correct
    def gc(g: Geometry): Boolean = g.isInstanceOf[GeometryCollection]
    if (gc(a) || gc(b)) throw new IllegalArgumentException(
      "relate does not support GEOMETRYCOLLECTION arguments (GEOS contract)")
    // a 0-dimensional side takes the direct point-location construction
    if (math.min(a.topoDim, b.topoDim) == 0 && !a.isEmpty && !b.isEmpty)
      return relatePointish(a, b)
    if (!a.isEmpty && !b.isEmpty) {
      (a.topoDim, b.topoDim) match {
        case (1, 1) => return relateLineLine(a, b)
        case (1, 2) => return relateLineArea(a, b)
        case (2, 1) =>
          val m = relateLineArea(b, a)
          return new String(Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)))
        case _ =>
      }
    }
    // Build the 9 cells II IB IE / BI BB BE / EI EB EE with dimension chars.
    // This is a pragmatic derivation sufficient for line/area combos.
    // dim < 0 means the part is EMPTY (e.g. a point's boundary) -> 'F',
    // matching DE-9IM: "FF0FFF0F2" for disjoint points, not "FF0FF0002".
    def dimChar(cond: Boolean, dim: Int): Char =
      if (!cond || dim < 0) 'F' else if (dim == 0) '0' else if (dim == 1) '1' else '2'
    val inter = intersects(a, b)
    if (!inter) {
      val sb = new StringBuilder("FF")
      sb.append(dimChar(true, a.topoDim))
      sb.append("FF").append(dimChar(true, boundaryDim(a)))
      sb.append(dimChar(true, b.topoDim)).append(dimChar(true, boundaryDim(b))).append('2')
      return sb.toString
    }
    val ii = interiorsIntersectSym(a, b)
    val aCoversB = covers(a, b); val bCoversA = covers(b, a)
    val minD = math.min(a.topoDim, b.topoDim)
    Array(
      dimChar(ii, minD),
      dimChar(inter && !bCoversA && boundaryDim(b) >= 0, math.min(a.topoDim, boundaryDim(b))),
      dimChar(!bCoversA, a.topoDim),
      dimChar(inter && !aCoversB && boundaryDim(a) >= 0, math.min(boundaryDim(a), b.topoDim)),
      dimChar(inter && boundaryDim(a) >= 0 && boundaryDim(b) >= 0 && boundariesTouch(a, b),
        math.min(boundaryDim(a), boundaryDim(b))),
      dimChar(!bCoversA && boundaryDim(a) >= 0, boundaryDim(a)),
      dimChar(!aCoversB, b.topoDim),
      dimChar(!aCoversB && boundaryDim(b) >= 0, boundaryDim(b)),
      '2').mkString
  }

  /** shapely relate_pattern: match the DE-9IM matrix of (a, b) against a
    * 9-char pattern — 'T' any non-F dimension, 'F' empty, '0'/'1'/'2'
    * exact, '*' anything.
    */
  def relatePattern(a: Geometry, b: Geometry, pattern: String): Boolean = {
    require(pattern.length == 9,
      s"relate_pattern: pattern '$pattern' must be 9 characters")
    val m = relate(a, b)
    var i = 0
    while (i < 9) {
      val p = Character.toUpperCase(pattern.charAt(i)); val c = m.charAt(i)
      val ok = p match {
        case '*' => true
        case 'T' => c != 'F'
        case _   => p == c
      }
      if (!ok) return false
      i += 1
    }
    true
  }

  private def interiorsIntersectSym(a: Geometry, b: Geometry): Boolean =
    // areal×areal CANNOT take interiorsIntersect's polygon shortcut: that
    // `true` is only valid for its covers() caller, where coverage is
    // already established. Here the pair may merely touch (shared vertex /
    // shared edge), so ask the exact interior-overlap kernel — the same
    // one touches() uses, keeping relate's II cell and touches consistent.
    if (a.topoDim == 2 && b.topoDim == 2) areaInteriorsOverlap(a, b)
    else if (a.topoDim == 2) interiorsIntersect(a, b)
    else if (b.topoDim == 2) interiorsIntersect(b, a)
    else intersects(a, b)

  private def boundaryDim(g: Geometry): Int = g.topoDim match {
    case 0 => -1
    case 1 =>
      val closed = Geometry.parts(g).forall { case l: LineString => l.isClosed; case _ => true }
      if (closed) -1 else 0
    case 2 => 1
    case _ => -1
  }

  private def boundariesTouch(a: Geometry, b: Geometry): Boolean = {
    val ra = rings(a); val rb = rings(b)
    ra.exists(r1 => rb.exists(r2 => pathsIntersect(r1, r2)))
  }
}
