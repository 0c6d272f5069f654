package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Overlay (set-theoretic) operations.
  *
  * Reference ops at `dask_geopandas/expr.py:1001-1013`
  * intersection/difference/union and `clip.py:12-47`.
  *
  *  - areal ∘ areal (arbitrary simple polygons with holes, convex or
  *    concave, multipolygons): general boolean overlay via
  *    [[PolygonClip]] (boundary fragment classification), with cheap
  *    disjoint/containment fast paths that return the original geometry
  *    unchanged.
  *  - point/line operands: direct clipping against areal geometries,
  *    pairwise segment intersection between curves.
  *  - union of mixed-dimension operands: the higher-dimension side absorbs
  *    the covered part of the lower (poly ∪ crossing line keeps only the
  *    outside line spans); line ∪ line stays collected, not noded.
  */
object Overlay {

  def isConvexRing(ring: Array[Double]): Boolean = {
    val n = ring.length / 2 - 1 // closed
    if (n < 3) return false
    var sign = 0
    var i = 0
    while (i < n) {
      val ax = ring(2 * i); val ay = ring(2 * i + 1)
      val bx = ring(2 * ((i + 1) % n)); val by = ring(2 * ((i + 1) % n) + 1)
      val cx = ring(2 * ((i + 2) % n)); val cy = ring(2 * ((i + 2) % n) + 1)
      val o = Predicates.orient(ax, ay, bx, by, cx, cy)
      if (o != 0) {
        val s = if (o > 0) 1 else -1
        if (sign == 0) sign = s
        else if (sign != s) return false
      }
      i += 1
    }
    true
  }

  def isConvexPolygon(g: Geometry): Boolean = g match {
    case p: Polygon => p.rings.length == 1 && isConvexRing(p.rings(0))
    case _          => false
  }

  // ---------------------------------------------------------- intersection
  def intersection(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty || b.isEmpty || !a.envelope.intersects(b.envelope))
      return GeometryCollection(Array.empty)
    (a, b) match {
      case (p: Point, _) => if (Predicates.intersects(p, b)) p else GeometryCollection(Array.empty)
      case (_, p: Point) => if (Predicates.intersects(a, p)) p else GeometryCollection(Array.empty)
      case (mp: MultiPoint, _) =>
        MultiPoint(mp.pts.filter(p => Predicates.intersects(p, b)))
      case (_, mp: MultiPoint) =>
        MultiPoint(mp.pts.filter(p => Predicates.intersects(a, p)))
      case (l: LineString, _) if b.topoDim == 2 => clipLineToArea(l, b)
      case (_, l: LineString) if a.topoDim == 2 => clipLineToArea(l, a)
      case (ml: MultiLineString, _) if b.topoDim == 2 =>
        Geometry.collect(ml.lines.toIndexedSeq.map(l => clipLineToArea(l, b)))
      case (_, ml: MultiLineString) if a.topoDim == 2 =>
        Geometry.collect(ml.lines.toIndexedSeq.map(l => clipLineToArea(l, a)))
      case _ if a.topoDim == 2 && b.topoDim == 2 => areaIntersection(a, b)
      case _ if a.topoDim == 1 && b.topoDim == 1 =>
        // curve x curve (any multiplicity): crossings (dim 0) + collinear
        // overlap spans (dim 1). Each a part is intersected against ALL b
        // paths at once: spansByOverlap's per-segment interval merge dedups
        // collinear spans contributed by different b parts over the same
        // stretch of a — pairwise concatenation would emit overlapping
        // duplicate spans and inflate downstream length measures.
        val la = lineParts(a); val lb = lineParts(b)
        val bPaths = lb.map(_.xy)
        val all = la.map(x => lineLineIntersection(x, bPaths))
          .filterNot(_.isEmpty)
        if (all.isEmpty) GeometryCollection(Array.empty)
        else if (all.forall(_.topoDim == 0)) unionPoints(all)
        else {
          val parts = all.flatMap(Geometry.parts)
          val lines = parts.collect { case l: LineString => l }
          val pts = parts.collect { case p: Point => p }
            .filterNot(p => lines.exists(l => Predicates.pointOnPath(p.x, p.y, l.xy)))
            .distinctBy(p => (p.x, p.y))
          Geometry.collect(lines ++ pts)
        }
      case _ =>
        throw new UnsupportedOperationException(
          s"intersection(${a.geometryType}, ${b.geometryType}) not supported in v1")
    }
  }

  private def lineParts(g: Geometry): Seq[LineString] =
    Geometry.parts(g).collect { case l: LineString if !l.isEmpty => l }

  private def areaIntersection(a: Geometry, b: Geometry): Geometry = {
    // containment fast paths return the original geometry unchanged
    if (Predicates.covers(a, b)) return b
    if (Predicates.covers(b, a)) return a
    val areal = PolygonClip.overlay(a, b, PolygonClip.OpIntersection)
    if (!areal.isEmpty) return areal
    // zero-area overlap: operands that merely touch intersect in their
    // shared boundary — return the shared segments/points like GEOS does
    // instead of an empty collection
    if (Predicates.intersects(a, b)) boundaryIntersection(a, b)
    else areal
  }

  /** Intersection of the boundaries of two areal geometries: shared
    * (collinear-overlapping) edge segments, or touch points where no
    * segment is shared. Supports the dimension-collapse cases of
    * intersection (edge-touch -> LineString, corner-touch -> Point).
    */
  private def boundaryIntersection(a: Geometry, b: Geometry): Geometry = {
    def edgesOf(g: Geometry): Array[Array[Double]] = g match {
      case p: Polygon      => p.rings
      case m: MultiPolygon => m.polys.flatMap(_.rings)
      case _               => Array.empty
    }
    val ra = edgesOf(a); val rb = edgesOf(b)
    val segs = ArrayBuffer[(Double, Double, Double, Double)]()
    val pts = ArrayBuffer[(Double, Double)]()
    ra.foreach { ea =>
      var i = 0
      while (i + 3 < ea.length) {
        val ax = ea(i); val ay = ea(i + 1); val bx = ea(i + 2); val by = ea(i + 3)
        val dx = bx - ax; val dy = by - ay
        rb.foreach { eb =>
          var j = 0
          while (j + 3 < eb.length) {
            val cx = eb(j); val cy = eb(j + 1); val ddx = eb(j + 2); val ddy = eb(j + 3)
            val collinear = Predicates.orient(ax, ay, bx, by, cx, cy) == 0 &&
              Predicates.orient(ax, ay, bx, by, ddx, ddy) == 0
            if (collinear) {
              // overlap interval in A-edge parameter space
              @inline def tOf(px: Double, py: Double): Double =
                if (math.abs(dx) >= math.abs(dy)) (px - ax) / dx else (py - ay) / dy
              if (dx != 0 || dy != 0) {
                val t0 = tOf(cx, cy); val t1 = tOf(ddx, ddy)
                val lo = math.max(0.0, math.min(t0, t1))
                val hi = math.min(1.0, math.max(t0, t1))
                if (hi > lo) {
                  segs += ((ax + lo * dx, ay + lo * dy, ax + hi * dx, ay + hi * dy))
                } else if (hi == lo) {
                  pts += ((ax + lo * dx, ay + lo * dy))
                }
              }
            } else if (Predicates.segmentsIntersect(ax, ay, bx, by, cx, cy, ddx, ddy)) {
              segParamIntersection(ax, ay, bx, by, cx, cy, ddx, ddy)
                .foreach(t => pts += ((ax + t * dx, ay + t * dy)))
            }
            j += 2
          }
        }
        i += 2
      }
    }
    val distinctSegs = segs.map { case (x1, y1, x2, y2) =>
      if (x1 < x2 || (x1 == x2 && y1 <= y2)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
    }.distinct
    if (distinctSegs.nonEmpty) {
      val lines = distinctSegs.map { case (x1, y1, x2, y2) =>
        LineString(Array(x1, y1, x2, y2))
      }
      if (lines.length == 1) lines(0) else MultiLineString(lines.toArray)
    } else {
      val distinctPts = pts.distinct
      if (distinctPts.isEmpty) GeometryCollection(Array.empty)
      else if (distinctPts.length == 1) Point(distinctPts(0)._1, distinctPts(0)._2)
      else MultiPoint(distinctPts.sorted.map { case (x, y) => Point(x, y) }.toArray)
    }
  }

  /** One half-plane clip step: keep the part of `poly` on the requested side
    * of the directed line (x1,y1)->(x2,y2). Boundary points are kept on both
    * sides (closed clipping). Core of Sutherland–Hodgman, reused by the
    * difference decomposition.
    */
  private def clipEdge(poly: ArrayBuffer[(Double, Double)], x1: Double, y1: Double,
      x2: Double, y2: Double, keepLeft: Boolean): ArrayBuffer[(Double, Double)] = {
    @inline def inside(px: Double, py: Double): Boolean = {
      val o = Predicates.orient(x1, y1, x2, y2, px, py)
      if (keepLeft) o >= 0 else o <= 0
    }
    @inline def intersect(ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
      val dx1 = bx - ax; val dy1 = by - ay
      val dx2 = x2 - x1; val dy2 = y2 - y1
      val denom = dx1 * dy2 - dy1 * dx2
      val t = ((x1 - ax) * dy2 - (y1 - ay) * dx2) / denom
      (ax + t * dx1, ay + t * dy1)
    }
    val out = ArrayBuffer[(Double, Double)]()
    var i = 0
    val n = poly.length
    while (i < n) {
      val cur = poly(i)
      val prev = poly((i + n - 1) % n)
      val curIn = inside(cur._1, cur._2)
      val prevIn = inside(prev._1, prev._2)
      if (curIn) {
        if (!prevIn) out += intersect(prev._1, prev._2, cur._1, cur._2)
        out += cur
      } else if (prevIn) {
        out += intersect(prev._1, prev._2, cur._1, cur._2)
      }
      i += 1
    }
    out
  }

  private def toRing(poly: ArrayBuffer[(Double, Double)]): Array[Double] = {
    if (poly.length < 3) return Array.empty
    val ring = new Array[Double]((poly.length + 1) * 2)
    var i = 0
    while (i < poly.length) { ring(2 * i) = poly(i)._1; ring(2 * i + 1) = poly(i)._2; i += 1 }
    ring(2 * poly.length) = poly(0)._1; ring(2 * poly.length + 1) = poly(0)._2
    ring
  }

  private def reverseRing(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < n) {
      out(2 * i) = ring(2 * (n - 1 - i))
      out(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Inward offset (negative buffer) of a convex single-ring polygon:
    * intersect the half-planes of each edge shifted inward by `d`. Exact
    * for convex inputs; collapses to empty when `d` reaches the inradius.
    */
  def erodeConvex(p: Polygon, d: Double): Geometry = {
    require(d >= 0, "erode distance must be non-negative")
    val r0 = p.rings(0)
    val ring = if (Measures.signedRingArea(r0) > 0) r0 else reverseRing(r0)
    var poly = toPairs(ring)
    val n = ring.length / 2 - 1
    var e = 0
    while (e < n && poly.nonEmpty) {
      val x1 = ring(2 * e); val y1 = ring(2 * e + 1)
      val x2 = ring(2 * e + 2); val y2 = ring(2 * e + 3)
      val len = math.hypot(x2 - x1, y2 - y1)
      if (len > 0) {
        // CCW ring: interior is to the left; left normal = (-dy, dx)/len
        val nx = -(y2 - y1) / len * d
        val ny = (x2 - x1) / len * d
        poly = clipEdge(poly, x1 + nx, y1 + ny, x2 + nx, y2 + ny, keepLeft = true)
      }
      e += 1
    }
    val out = toRing(poly)
    if (out.length < 8 || Measures.area(Polygon(out)) <= 0) GeometryCollection(Array.empty)
    else Polygon(out)
  }

  /** Clip a closed subject ring by a convex clip ring. Output closed ring
    * (possibly empty). Standard Sutherland–Hodgman.
    */
  def sutherlandHodgman(subject: Array[Double], clip: Array[Double]): Array[Double] = {
    // determine clip orientation so "inside" is consistent
    val ccw = Measures.signedRingArea(clip) > 0
    var poly = toPairs(subject)
    val nClip = clip.length / 2 - 1
    var e = 0
    while (e < nClip && poly.nonEmpty) {
      poly = clipEdge(poly, clip(2 * e), clip(2 * e + 1),
        clip(2 * e + 2), clip(2 * e + 3), keepLeft = ccw)
      e += 1
    }
    toRing(poly)
  }

  private def toPairs(ring: Array[Double]): ArrayBuffer[(Double, Double)] = {
    val out = ArrayBuffer[(Double, Double)]()
    var i = 0
    val stop = ring.length - 2 // drop closing vertex
    while (i < stop) { out += ((ring(i), ring(i + 1))); i += 2 }
    out
  }

  /** Clip a linestring to an areal geometry: walk segments, keep sub-spans
    * inside. Splits at boundary crossings found by parametric sampling of
    * exact segment/ring intersections.
    */
  private def clipLineToArea(l: LineString, area: Geometry): Geometry =
    clipLineByLocate(l, area, keepInside = true)

  /** Split `l` at every ring crossing and keep the sub-spans whose midpoint
    * locates inside (intersection) or outside (difference) `area` — the one
    * parameterized pass both boolean ops share.
    */
  private def clipLineByLocate(l: LineString, area: Geometry,
      keepInside: Boolean): Geometry = {
    if (l.isEmpty) return l
    val ringArrs: Array[Array[Double]] = area match {
      case p: Polygon      => p.rings
      case m: MultiPolygon => m.polys.flatMap(_.rings)
      // non-areal clip target: nothing is inside it; everything is outside
      case _               => return if (keepInside) GeometryCollection(Array.empty) else l
    }
    val outLines = ArrayBuffer[LineString]()
    val cur = ArrayBuffer[Double]()
    def flush(): Unit = {
      if (cur.length >= 4) outLines += LineString(cur.toArray)
      cur.clear()
    }
    var i = 0
    while (i + 3 < l.xy.length) {
      val ax = l.xy(i); val ay = l.xy(i + 1); val bx = l.xy(i + 2); val by = l.xy(i + 3)
      // parametric cut points with every ring edge
      val ts = ArrayBuffer(0.0, 1.0)
      ringArrs.foreach { ring =>
        var j = 0
        while (j + 3 < ring.length) {
          segParamIntersection(ax, ay, bx, by, ring(j), ring(j + 1), ring(j + 2), ring(j + 3))
            .foreach(ts += _)
          j += 2
        }
      }
      val sorted = ts.distinct.sorted
      var k = 0
      while (k + 1 < sorted.length) {
        val t0 = sorted(k); val t1 = sorted(k + 1)
        val mx = ax + (bx - ax) * (t0 + t1) / 2; val my = ay + (by - ay) * (t0 + t1) / 2
        val keep = (Predicates.locate(mx, my, area) != Predicates.OUT) == keepInside
        if (keep) {
          val sx = ax + (bx - ax) * t0; val sy = ay + (by - ay) * t0
          val ex = ax + (bx - ax) * t1; val ey = ay + (by - ay) * t1
          if (cur.length >= 2 && cur(cur.length - 2) == sx && cur.last == sy) {
            cur += ex; cur += ey
          } else {
            flush()
            cur += sx; cur += sy; cur += ex; cur += ey
          }
        } else flush()
        k += 1
      }
      i += 2
    }
    flush()
    if (outLines.isEmpty) GeometryCollection(Array.empty)
    else if (outLines.length == 1) outLines(0)
    else MultiLineString(outLines.toArray)
  }

  /** Parameter t on segment A where it crosses segment B, if any. */
  private def segParamIntersection(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Option[Double] = {
    val r1x = bx - ax; val r1y = by - ay
    val r2x = dx - cx; val r2y = dy - cy
    val denom = r1x * r2y - r1y * r2x
    if (denom == 0) return None
    val t = ((cx - ax) * r2y - (cy - ay) * r2x) / denom
    val u = ((cx - ax) * r1y - (cy - ay) * r1x) / denom
    if (t >= 0 && t <= 1 && u >= 0 && u <= 1) Some(t) else None
  }

  /** Merged parameter intervals [lo,hi] on segment (ax,ay)-(bx,by) that
    * collinearly overlap some segment of `paths` (the dim-1 part of a
    * curve×curve intersection, which `segParamIntersection` cannot see —
    * its denominator is 0 for parallel segments).
    */
  private def segOverlapIntervals(ax: Double, ay: Double, bx: Double, by: Double,
      paths: Seq[Array[Double]]): Seq[(Double, Double)] = {
    val iv = ArrayBuffer[(Double, Double)]()
    val useX = math.abs(bx - ax) >= math.abs(by - ay)
    val len = if (useX) bx - ax else by - ay
    if (len == 0) return Nil
    paths.foreach { p =>
      var j = 0
      while (j + 3 < p.length) {
        if (Predicates.nearlyCollinear(ax, ay, bx, by, p(j), p(j + 1)) &&
          Predicates.nearlyCollinear(ax, ay, bx, by, p(j + 2), p(j + 3))) {
          val tc = if (useX) (p(j) - ax) / len else (p(j + 1) - ay) / len
          val td = if (useX) (p(j + 2) - ax) / len else (p(j + 3) - ay) / len
          val lo = math.max(0.0, math.min(tc, td))
          val hi = math.min(1.0, math.max(tc, td))
          if (hi > lo) iv += ((lo, hi))
        }
        j += 2
      }
    }
    val merged = ArrayBuffer[(Double, Double)]()
    // bridge sub-1e-9 parameter gaps: chained part endpoints computed
    // upstream can differ by an ulp, and an exact-touch merge would leave
    // a phantom uncovered sliver (inconsistent with the tolerance-based
    // pointOnPath/nearlyCollinear used everywhere else)
    val eps = 1e-9
    iv.sortBy(_._1).foreach { x =>
      if (merged.nonEmpty && x._1 <= merged.last._2 + eps) {
        val l = merged.remove(merged.length - 1)
        merged += ((l._1, math.max(l._2, x._2)))
      } else merged += x
    }
    merged.toSeq
  }

  /** EXACT union coverage of a path by a set of line paths: every segment's
    * full [0,1] parameter interval must be covered by the merged collinear
    * overlap intervals (the same interval machinery lineMinusLine uses).
    * Zero-length segments degenerate to a point-on-any-path test. Used by
    * the multi-part covers/contains predicates — no vertex/midpoint
    * sampling approximation.
    */
  private[geom] def pathCoveredByPaths(path: Array[Double], paths: Seq[Array[Double]]): Boolean = {
    val eps = 1e-12
    // a degenerate single-coordinate path is a point: test it directly
    // (the segment loop below would otherwise pass it vacuously)
    if (path.length == 2)
      return paths.exists(p => Predicates.pointOnPath(path(0), path(1), p))
    var i = 0
    while (i + 3 < path.length) {
      val ax = path(i); val ay = path(i + 1)
      val bx = path(i + 2); val by = path(i + 3)
      if (ax == bx && ay == by) {
        if (!paths.exists(p => Predicates.pointOnPath(ax, ay, p))) return false
      } else {
        val merged = segOverlapIntervals(ax, ay, bx, by, paths)
        // merged intervals are sorted and disjoint: coverage of [0,1] means
        // one interval spans it (within eps)
        val ok = merged.exists { case (lo, hi) => lo <= eps && hi >= 1.0 - eps }
        if (!ok) return false
      }
      i += 2
    }
    true
  }

  /** Sub-spans of `a` selected by per-segment parameter intervals, chained
    * into maximal linestrings. `keepInside` keeps the intervals themselves
    * (intersection); false keeps their complement (difference).
    */
  private def spansByOverlap(a: LineString, paths: Seq[Array[Double]],
      keepInside: Boolean): ArrayBuffer[LineString] = {
    val outLines = ArrayBuffer[LineString]()
    val cur = ArrayBuffer[Double]()
    def flush(): Unit = {
      if (cur.length >= 4) outLines += LineString(cur.toArray)
      cur.clear()
    }
    var i = 0
    while (i + 3 < a.xy.length) {
      val ax = a.xy(i); val ay = a.xy(i + 1); val bx = a.xy(i + 2); val by = a.xy(i + 3)
      val merged = segOverlapIntervals(ax, ay, bx, by, paths)
      def emit(s: Double, e: Double): Unit = if (e > s) {
        val sx = ax + (bx - ax) * s; val sy = ay + (by - ay) * s
        val ex = ax + (bx - ax) * e; val ey = ay + (by - ay) * e
        if (cur.length >= 2 && cur(cur.length - 2) == sx && cur.last == sy) {
          cur += ex; cur += ey
        } else {
          flush(); cur += sx; cur += sy; cur += ex; cur += ey
        }
      }
      if (keepInside) merged.foreach { case (lo, hi) => emit(lo, hi) }
      else {
        var t0 = 0.0
        merged.foreach { case (lo, hi) => emit(t0, lo); t0 = math.max(t0, hi) }
        emit(t0, 1.0)
      }
      i += 2
    }
    flush()
    outLines
  }

  /** Line \ line: remove the collinear overlapping spans; point contacts
    * (crossings) are measure-zero and stay (GEOS semantics).
    */
  private def lineMinusLine(a: LineString, b: Geometry): Geometry = {
    val paths = Geometry.parts(b).collect { case l: LineString => l.xy }
    val kept = spansByOverlap(a, paths, keepInside = false)
    if (kept.isEmpty) GeometryCollection(Array.empty)
    else if (kept.length == 1) kept(0)
    else MultiLineString(kept.toArray)
  }

  private def lineLineIntersection(a: LineString, bPaths: Seq[Array[Double]]): Geometry = {
    // dim-1 component: collinear overlapping spans against ALL b paths at
    // once — the per-segment interval merge dedups spans contributed by
    // different b parts over the same stretch of a
    val spans = spansByOverlap(a, bPaths, keepInside = true)
    // dim-0 component: proper/endpoint crossings not inside a span
    val pts = ArrayBuffer[(Double, Double)]()
    var i = 0
    while (i + 3 < a.xy.length) {
      bPaths.foreach { bxy =>
        var j = 0
        while (j + 3 < bxy.length) {
          segParamIntersection(a.xy(i), a.xy(i + 1), a.xy(i + 2), a.xy(i + 3),
            bxy(j), bxy(j + 1), bxy(j + 2), bxy(j + 3)).foreach { t =>
            pts += ((a.xy(i) + t * (a.xy(i + 2) - a.xy(i)),
              a.xy(i + 1) + t * (a.xy(i + 3) - a.xy(i + 1))))
          }
          j += 2
        }
      }
      i += 2
    }
    val distinct = pts.distinct.filterNot { case (x, y) =>
      spans.exists(s => Predicates.pointOnPath(x, y, s.xy))
    }
    val out: Seq[Geometry] =
      spans.toSeq ++ distinct.map { case (x, y) => Point(x, y) }
    if (out.isEmpty) GeometryCollection(Array.empty)
    else if (out.length == 1) out.head
    else Geometry.collect(out)
  }

  // ----------------------------------------------------------------- union
  /** Binary union. Exact for point sets and arbitrary areal operands
    * (topological merge via [[PolygonClip]]). Intersecting mixed-dimension
    * operands are collected, not noded.
    */
  def union(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    if (a.topoDim == 0 && b.topoDim == 0) return unionPoints(Seq(a, b))
    if (a.topoDim == 2 && b.topoDim == 2) {
      // areal pair: the exact intersects test would route
      // snap-tolerance-close (jittered shared boundary) operands to a plain
      // collect; PolygonClip welds and merges them instead, and its
      // tolerance-expanded envelope gate short-circuits disjoint inputs
      if (Predicates.covers(a, b)) return a
      if (Predicates.covers(b, a)) return b
      return PolygonClip.overlay(a, b, PolygonClip.OpUnion)
    }
    if (!Predicates.intersects(a, b)) return Geometry.collect(Seq(a, b))
    if (Predicates.covers(a, b)) return a
    if (Predicates.covers(b, a)) return b
    // mixed dimensions: the higher-dimension operand absorbs the covered
    // part of the lower-dimension one (GEOS homogenizes the same way), so
    // union(polygon, crossing line) keeps only the line part outside
    if (a.topoDim == 2 && b.topoDim < 2)
      return Geometry.collect(Seq(a) ++ Geometry.parts(difference(b, a)).filterNot(_.isEmpty))
    if (b.topoDim == 2 && a.topoDim < 2)
      return Geometry.collect(Seq(b) ++ Geometry.parts(difference(a, b)).filterNot(_.isEmpty))
    if (a.topoDim == 1 && b.topoDim == 0)
      return Geometry.collect(Seq(a) ++ Geometry.parts(difference(b, a)).filterNot(_.isEmpty))
    if (b.topoDim == 1 && a.topoDim == 0)
      return Geometry.collect(Seq(b) ++ Geometry.parts(difference(a, b)).filterNot(_.isEmpty))
    Geometry.collect(Seq(a, b))
  }

  def unionPoints(gs: Seq[Geometry]): Geometry = {
    val set = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
    gs.foreach(_.foreachCoord((x, y) => set += ((x, y))))
    if (set.isEmpty) GeometryCollection(Array.empty)
    else if (set.size == 1) { val h = set.head; Point(h._1, h._2) }
    else MultiPoint(set.toArray.sorted.map { case (x, y) => Point(x, y) })
  }

  /** N-ary union: canonical (sorted, deduped) for point sets; other inputs
    * merge through a balanced binary tree — O(n log n) union work instead of
    * the quadratic left fold (each part participates in ~log n merges, not
    * in every one).
    */
  def unionAll(gs: Seq[Geometry]): Geometry = {
    val nonEmpty = gs.filterNot(_.isEmpty)
    if (nonEmpty.isEmpty) return GeometryCollection(Array.empty)
    if (nonEmpty.forall(_.topoDim == 0)) return unionPoints(nonEmpty)
    var layer: Seq[Geometry] = nonEmpty
    while (layer.length > 1)
      layer = layer.grouped(2).map {
        case Seq(a, b) => union(a, b)
        case Seq(a)    => a
      }.toSeq
    layer.head
  }

  /** Bounded-memory streaming n-ary union accumulator (the incremental form
    * of GEOS' cascaded polygon union). Parts are buffered in small batches;
    * full batches merge into binomial-counter levels where level i holds the
    * union of ~batch*2^i inputs. At any moment the accumulator retains at
    * most `batch` raw parts plus O(log n) partial unions — a dissolve over
    * an arbitrarily large group no longer accumulates every input geometry
    * (the round-4 StUnionAgg OOM-at-scale defect), and total work is
    * O(n log n) unions instead of the quadratic left fold.
    */
  final class CascadedUnion(batch: Int = 8) {
    private val pending = ArrayBuffer[Geometry]()
    private val levels = ArrayBuffer[Geometry]() // null = empty slot

    def add(g: Geometry): Unit = {
      if (g.isEmpty) return
      pending += g
      if (pending.length >= batch) flushPending()
    }

    private def flushPending(): Unit = {
      if (pending.isEmpty) return
      var acc = unionAll(pending.toSeq)
      pending.clear()
      var i = 0
      var placed = false
      while (!placed && i < levels.length) {
        if (levels(i) == null) { levels(i) = acc; placed = true }
        else { acc = union(levels(i), acc); levels(i) = null; i += 1 }
      }
      if (!placed) levels += acc
    }

    /** Current partial state (pending raw parts + level unions) — what a
      * partial-aggregation buffer serializes.
      */
    def parts: Seq[Geometry] = pending.toSeq ++ levels.filter(_ != null)

    /** Number of geometries currently held — bounded by batch + O(log n). */
    def size: Int = pending.length + levels.count(_ != null)

    def result(): Option[Geometry] = {
      flushPending()
      val ps = levels.filter(_ != null).toSeq
      if (ps.isEmpty) None else Some(ps.reduceLeft(union))
    }
  }

  // ------------------------------------------------------------ difference
  def difference(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty || b.isEmpty || !a.envelope.intersects(b.envelope)) return a
    a match {
      case p: Point => if (Predicates.intersects(p, b)) GeometryCollection(Array.empty) else p
      case mp: MultiPoint => MultiPoint(mp.pts.filterNot(p => Predicates.intersects(p, b)))
      case l: LineString if b.topoDim == 2 => lineMinusArea(l, b)
      case ml: MultiLineString if b.topoDim == 2 =>
        Geometry.collect(ml.lines.toIndexedSeq.map(l => lineMinusArea(l, b))
          .flatMap(Geometry.parts).filterNot(_.isEmpty))
      case _ if a.topoDim == 2 && b.topoDim < 2 => a // minus a measure-zero set
      case _ if a.topoDim == 1 && b.topoDim == 0 => a // minus a measure-zero set
      case _ if a.topoDim == 1 && b.topoDim == 1 =>
        // line \ line: remove collinear overlap spans; crossings are
        // measure-zero and remain (previously threw for intersecting lines)
        val kept = Geometry.parts(a).collect { case l: LineString => lineMinusLine(l, b) }
          .flatMap(Geometry.parts).filterNot(_.isEmpty)
        if (kept.isEmpty) GeometryCollection(Array.empty) else Geometry.collect(kept)
      case _ if a.topoDim == 2 && b.topoDim == 2 =>
        if (Predicates.covers(b, a)) GeometryCollection(Array.empty)
        else if (!Predicates.intersects(a, b)) a
        else areaDifference(a, b)
      case _ =>
        if (Predicates.covers(b, a)) GeometryCollection(Array.empty)
        else if (!Predicates.intersects(a, b)) a
        else throw new UnsupportedOperationException(
          s"difference(${a.geometryType}, ${b.geometryType}) not supported in v1")
    }
  }

  /** A \ B for areal operands: general boolean overlay via [[PolygonClip]]
    * (arbitrary simple polygons with holes, concave subtrahends,
    * multipolygons).
    */
  private def areaDifference(a: Geometry, b: Geometry): Geometry =
    PolygonClip.overlay(a, b, PolygonClip.OpDifference)

  // complement of clipLineToArea: keep sub-spans outside. clipComplement
  // already returns l unchanged when nothing is inside — the previous
  // intersection(l, area) pre-test paid a second full clipping pass per
  // row only to decide whether to run this one.
  private def lineMinusArea(l: LineString, area: Geometry): Geometry =
    clipComplement(l, area)

  private def clipComplement(l: LineString, area: Geometry): Geometry =
    clipLineByLocate(l, area, keepInside = false)

  def symDifference(a: Geometry, b: Geometry): Geometry =
    union(difference(a, b), difference(b, a))

  /** Clip to an axis-aligned rectangle — the workhorse of the reference's
    * `clip` (`dask_geopandas/clip.py:12-47`) and `cx` (`expr.py:1022-1077`).
    */
  def clipByRect(g: Geometry, minX: Double, minY: Double, maxX: Double, maxY: Double): Geometry =
    intersection(g, Polygon.box(minX, minY, maxX, maxY))
}
