package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Constructive geometry ops (reference surface:
  * `dask_geopandas/expr.py:963-972` boundary/centroid/convex_hull/envelope/
  * exterior, `expr.py:301-337` representative_point/buffer/simplify/
  * interpolate, `expr.py:339-385` affine family).
  */
object Constructive {

  // -------------------------------------------------------------- centroid
  /** Area- (then length-, then point-) weighted centroid, GEOS-style:
    * highest topological dimension present wins.
    */
  def centroid(g: Geometry): Point = {
    if (g.isEmpty) return Point.empty
    val dim = g.topoDim
    if (dim == 2) {
      var ax = 0.0; var ay = 0.0; var aSum = 0.0
      Geometry.parts(g).foreach {
        case p: Polygon if !p.isEmpty =>
          var r = 0
          while (r < p.rings.length) {
            val sign = if (r == 0) 1.0 else -1.0
            val ring = p.rings(r)
            val sa = Measures.signedRingArea(ring)
            val w = sign * math.abs(sa)
            val (cx, cy) = ringCentroid(ring, sa)
            ax += cx * w; ay += cy * w; aSum += w
            r += 1
          }
        case _ =>
      }
      if (aSum != 0) return Point(ax / aSum, ay / aSum)
    }
    if (dim >= 1) {
      var lx = 0.0; var ly = 0.0; var lSum = 0.0
      Geometry.parts(g).foreach {
        case l: LineString =>
          var i = 0
          while (i + 3 < l.xy.length) {
            val x1 = l.xy(i); val y1 = l.xy(i + 1); val x2 = l.xy(i + 2); val y2 = l.xy(i + 3)
            val len = math.hypot(x2 - x1, y2 - y1)
            lx += (x1 + x2) / 2 * len; ly += (y1 + y2) / 2 * len; lSum += len
            i += 2
          }
        case p: Polygon =>
          p.rings.foreach { ring =>
            var i = 0
            while (i + 3 < ring.length) {
              val len = math.hypot(ring(i + 2) - ring(i), ring(i + 3) - ring(i + 1))
              lx += (ring(i) + ring(i + 2)) / 2 * len
              ly += (ring(i + 1) + ring(i + 3)) / 2 * len
              lSum += len
              i += 2
            }
          }
        case _ =>
      }
      if (lSum != 0) return Point(lx / lSum, ly / lSum)
    }
    var px = 0.0; var py = 0.0; var n = 0
    // for point geoms: average distinct part points; else average vertices
    g.foreachCoord { (x, y) => px += x; py += y; n += 1 }
    if (n == 0) Point.empty else Point(px / n, py / n)
  }

  private def ringCentroid(ring: Array[Double], signedArea: Double): (Double, Double) = {
    if (signedArea == 0) {
      // degenerate ring: average vertices
      var sx = 0.0; var sy = 0.0; var n = 0
      var i = 0
      while (i < ring.length) { sx += ring(i); sy += ring(i + 1); n += 1; i += 2 }
      return (sx / n, sy / n)
    }
    var cx = 0.0; var cy = 0.0
    var i = 0
    while (i + 3 < ring.length) {
      val cross = ring(i) * ring(i + 3) - ring(i + 2) * ring(i + 1)
      cx += (ring(i) + ring(i + 2)) * cross
      cy += (ring(i + 1) + ring(i + 3)) * cross
      i += 2
    }
    (cx / (6 * signedArea), cy / (6 * signedArea))
  }

  // ----------------------------------------------------------- convex hull
  /** Andrew's monotone chain. Returns Point/LineString/Polygon by rank. */
  def convexHull(g: Geometry): Geometry = {
    val pts = ArrayBuffer[(Double, Double)]()
    g.foreachCoord((x, y) => pts += ((x, y)))
    val distinct = pts.distinct.sortBy(identity)
    if (distinct.isEmpty) return GeometryCollection(Array.empty)
    if (distinct.length == 1) return Point(distinct(0)._1, distinct(0)._2)
    val hull = monotoneChain(distinct)
    if (hull.length == 2)
      LineString(Array(hull(0)._1, hull(0)._2, hull(1)._1, hull(1)._2))
    else {
      val ring = new Array[Double]((hull.length + 1) * 2)
      var i = 0
      while (i < hull.length) { ring(2 * i) = hull(i)._1; ring(2 * i + 1) = hull(i)._2; i += 1 }
      ring(2 * hull.length) = hull(0)._1; ring(2 * hull.length + 1) = hull(0)._2
      Polygon(ring)
    }
  }

  private def monotoneChain(sorted: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] = {
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = ArrayBuffer[(Double, Double)]()
    for (p <- sorted) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = ArrayBuffer[(Double, Double)]()
    for (p <- sorted.reverseIterator) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    lower.dropRight(1) ++ upper.dropRight(1)
  }

  // -------------------------------------------------------------- boundary
  def boundary(g: Geometry): Geometry = g match {
    case _: Point | _: MultiPoint => GeometryCollection(Array.empty)
    case l: LineString =>
      if (l.isClosed || l.isEmpty) MultiPoint(Array.empty)
      else MultiPoint(Array(Point(l.x(0), l.y(0)), Point(l.x(l.size - 1), l.y(l.size - 1))))
    case m: MultiLineString =>
      val pts = ArrayBuffer[Point]()
      m.lines.foreach { l =>
        if (!l.isClosed && !l.isEmpty) {
          pts += Point(l.x(0), l.y(0)); pts += Point(l.x(l.size - 1), l.y(l.size - 1))
        }
      }
      // mod-2 rule: points appearing an even number of times vanish
      val keep = pts.groupBy(p => (p.x, p.y)).filter(_._2.size % 2 == 1).keys
      MultiPoint(keep.map { case (x, y) => Point(x, y) }.toArray)
    case p: Polygon =>
      if (p.isEmpty) MultiLineString(Array.empty)
      else if (p.rings.length == 1) LineString(p.rings(0))
      else MultiLineString(p.rings.map(LineString(_)))
    case m: MultiPolygon =>
      MultiLineString(m.polys.flatMap(p => p.rings.map(LineString(_))))
    case gc: GeometryCollection =>
      Geometry.collect(gc.geoms.map(boundary).toIndexedSeq)
  }

  def exteriorRing(g: Geometry): Geometry = g match {
    case p: Polygon if !p.isEmpty => LineString(p.rings(0))
    case _                        => GeometryCollection(Array.empty)
  }

  // ------------------------------------------------------------- simplify
  /** Douglas–Peucker, per ring/line; rings keep >= 4 points. */
  def simplify(g: Geometry, tol: Double): Geometry = g match {
    case l: LineString => LineString(dp(l.xy, tol, isRing = false))
    case p: Polygon    => Polygon(p.rings.map(r => dp(r, tol, isRing = true)))
    case m: MultiLineString => MultiLineString(m.lines.map(l => LineString(dp(l.xy, tol, isRing = false))))
    case m: MultiPolygon => MultiPolygon(m.polys.map(p => Polygon(p.rings.map(r => dp(r, tol, isRing = true)))))
    case gc: GeometryCollection => GeometryCollection(gc.geoms.map(simplify(_, tol)))
    case other => other
  }

  /** DP over a raw open coordinate array, endpoints kept — the arc-level
    * entry [[Coverage.simplifyCoverage]] uses so every shared arc is
    * simplified exactly once.
    */
  private[geom] def simplifyLineXy(xy: Array[Double], tol: Double): Array[Double] =
    dp(xy, tol, isRing = false)

  /** DP over a raw closed ring array (last == first), >= 4 points kept. */
  private[geom] def simplifyRingXy(xy: Array[Double], tol: Double): Array[Double] =
    dp(xy, tol, isRing = true)

  private def dp(xy: Array[Double], tol: Double, isRing: Boolean): Array[Double] = {
    val n = xy.length / 2
    if (n <= (if (isRing) 4 else 2)) return xy
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    def recurse(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      var maxD = -1.0; var maxI = -1
      var i = lo + 1
      while (i < hi) {
        val d = Measures.pointToSegment(xy(2 * i), xy(2 * i + 1),
          xy(2 * lo), xy(2 * lo + 1), xy(2 * hi), xy(2 * hi + 1))
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > tol) { keep(maxI) = true; recurse(lo, maxI); recurse(maxI, hi) }
    }
    recurse(0, n - 1)
    var kept: Seq[Int] = (0 until n).filter(keep)
    if (isRing && kept.length < 4) {
      // preserve a valid ring: keep the two farthest interior points
      kept = Seq(0, n / 3, 2 * n / 3, n - 1).distinct.sorted
    }
    val out = new Array[Double](kept.length * 2)
    var j = 0
    for (i <- kept) { out(2 * j) = xy(2 * i); out(2 * j + 1) = xy(2 * i + 1); j += 1 }
    out
  }

  // ---------------------------------------------------------------- buffer
  /** Positive buffer. `resolution` = segments per quarter circle (shapely
    * default 16 — reference `dask_geopandas/expr.py:314-322`). Points get an
    * exact regular 4*resolution-gon; other geometries use the convex hull of
    * vertex circles (exact for convex inputs, approximate for concave).
    */
  def buffer(g: Geometry, dist: Double, resolution: Int = 16): Geometry = {
    if (g.isEmpty) return g
    if (dist == 0) return g
    if (dist < 0) return g match {
      // inward offset: exact for convex polygons via half-plane erosion
      case p: Polygon if p.numHoles == 0 && Overlay.isConvexPolygon(p) =>
        Overlay.erodeConvex(p, -dist)
      case p: Polygon => erodeGeneral(p, -dist, resolution)
      case m: MultiPolygon =>
        // merge touching parts BEFORE eroding: per-part erosion would also
        // erode along shared (interior) boundaries and underestimate the
        // result; after the union the remaining parts are pairwise disjoint
        // so per-part erosion is exact
        val merged = Geometry.parts(Overlay.unionAll(m.polys.toIndexedSeq))
          .collect { case p: Polygon if !p.isEmpty => p }
        val parts = merged.map(buffer(_, dist, resolution))
          .flatMap(Geometry.parts).collect { case p: Polygon if !p.isEmpty => p }
        if (parts.isEmpty) GeometryCollection(Array.empty)
        else if (parts.length == 1) parts(0) else MultiPolygon(parts.toArray)
      case _: Point | _: MultiPoint | _: LineString | _: MultiLineString =>
        GeometryCollection(Array.empty) // negative buffer of dim<2 is empty
      case c: GeometryCollection =>
        Overlay.unionAll(c.geoms.toIndexedSeq.map(buffer(_, dist, resolution)))
    }
    val n = math.max(4, 4 * resolution)
    g match {
      case p: Point => circle(p.x, p.y, dist, n)
      case mp: MultiPoint =>
        MultiPolygon(mp.pts.filterNot(_.isEmpty).map(p => circle(p.x, p.y, dist, n)))
      case p: Polygon if p.numHoles == 0 && Overlay.isConvexPolygon(p) =>
        hullOfVertexCircles(p, dist, n) // exact for convex inputs
      case l: LineString      => dilatePaths(Seq(l.xy), Nil, dist, n)
      case m: MultiLineString => dilatePaths(m.lines.toIndexedSeq.map(_.xy), Nil, dist, n)
      case p: Polygon         => dilatePaths(p.rings.toIndexedSeq, Seq(p), dist, n)
      case m: MultiPolygon =>
        dilatePaths(m.polys.toIndexedSeq.flatMap(_.rings), m.polys.toIndexedSeq, dist, n)
      case c: GeometryCollection =>
        Overlay.unionAll(c.geoms.toIndexedSeq.map(buffer(_, dist, resolution)))
    }
  }

  /** Styled positive buffer (geopandas/shapely `buffer(cap_style=,
    * join_style=, mitre_limit=)`). `capStyle`: "round" (disc ends),
    * "flat" (cut at the endpoint; a flat-capped point is EMPTY like
    * shapely), "square" (extended half-square; a square-capped point is
    * the r-box). `joinStyle`: "round" (vertex discs), "bevel" (chord
    * between the offset corners), "mitre" (offset edges extended to their
    * intersection, falling back to bevel past `mitreLimit`·r like OGC).
    * Styles apply to positive distances; negative distances keep the
    * round erosion of [[buffer]].
    */
  def bufferStyled(g: Geometry, dist: Double, resolution: Int = 16,
      capStyle: String = "round", joinStyle: String = "round",
      mitreLimit: Double = 5.0): Geometry = {
    require(Set("round", "flat", "square").contains(capStyle),
      s"unknown cap_style '$capStyle' (round | flat | square)")
    require(Set("round", "bevel", "mitre").contains(joinStyle),
      s"unknown join_style '$joinStyle' (round | bevel | mitre)")
    if (capStyle == "round" && joinStyle == "round")
      return buffer(g, dist, resolution)
    if (g.isEmpty || dist == 0) return buffer(g, dist, resolution)
    if (dist < 0) return buffer(g, dist, resolution)
    val n = math.max(4, 4 * resolution)
    def one(gg: Geometry): Geometry = gg match {
      case p: Point => capStyle match {
        case "round"  => circle(p.x, p.y, dist, n)
        case "square" => Polygon.box(p.x - dist, p.y - dist, p.x + dist, p.y + dist)
        case _        => GeometryCollection(Array.empty) // flat cap: empty
      }
      case mp: MultiPoint =>
        Overlay.unionAll(mp.pts.filterNot(_.isEmpty).toIndexedSeq.map(one))
      case l: LineString =>
        dilatePathsStyled(Seq(l.xy), Nil, dist, n, capStyle, joinStyle, mitreLimit)
      case m: MultiLineString =>
        dilatePathsStyled(m.lines.toIndexedSeq.map(_.xy), Nil, dist, n,
          capStyle, joinStyle, mitreLimit)
      case p: Polygon =>
        dilatePathsStyled(p.rings.toIndexedSeq, Seq(p), dist, n,
          capStyle, joinStyle, mitreLimit)
      case m: MultiPolygon =>
        dilatePathsStyled(m.polys.toIndexedSeq.flatMap(_.rings),
          m.polys.toIndexedSeq, dist, n, capStyle, joinStyle, mitreLimit)
      case c: GeometryCollection =>
        Overlay.unionAll(c.geoms.toIndexedSeq.map(one))
    }
    one(g)
  }

  /** Minkowski dilation with explicit cap/join pieces: per-segment
    * rectangles always; joins at interior (and ring) vertices per
    * `joinStyle`; caps at open-path endpoints per `capStyle`.
    */
  private def dilatePathsStyled(paths: Seq[Array[Double]], bodies: Seq[Geometry],
      r: Double, n: Int, capStyle: String, joinStyle: String,
      mitreLimit: Double): Geometry = {
    val pieces = ArrayBuffer[Geometry]()
    bodies.foreach(pieces += _)
    paths.foreach { xy =>
      val nPts = xy.length / 2
      if (nPts >= 2) {
        val closed = xy(0) == xy(xy.length - 2) && xy(1) == xy(xy.length - 1)
        // segment rectangles
        var i = 0
        while (i + 3 < xy.length) {
          val x1 = xy(i); val y1 = xy(i + 1); val x2 = xy(i + 2); val y2 = xy(i + 3)
          val len = math.hypot(x2 - x1, y2 - y1)
          if (len > 0) {
            val nx = -(y2 - y1) / len * r
            val ny = (x2 - x1) / len * r
            pieces += Polygon(Array(Array(
              x1 + nx, y1 + ny, x2 + nx, y2 + ny,
              x2 - nx, y2 - ny, x1 - nx, y1 - ny, x1 + nx, y1 + ny)))
          }
          i += 2
        }
        // joins at interior vertices (every vertex of a closed ring)
        def dirAfter(vi: Int): (Double, Double) = {
          val dx = xy(2 * vi + 2) - xy(2 * vi); val dy = xy(2 * vi + 3) - xy(2 * vi + 1)
          val l = math.hypot(dx, dy); if (l == 0) (0, 0) else (dx / l, dy / l)
        }
        val interior: Seq[(Int, Int)] = // (vertex index, preceding segment start)
          if (closed) (0 until nPts - 1).map(v => (v, if (v == 0) nPts - 2 else v - 1))
          else (1 until nPts - 1).map(v => (v, v - 1))
        interior.foreach { case (v, pseg) =>
          val vx = xy(2 * v); val vy = xy(2 * v + 1)
          val d1 = dirAfter(pseg)
          val d2 = dirAfter(v)
          if (d1 != (0.0, 0.0) && d2 != (0.0, 0.0)) {
            joinStyle match {
              case "round" => pieces += circle(vx, vy, r, n)
              case style =>
                Seq(1.0, -1.0).foreach { s =>
                  val a1x = vx + s * (-d1._2) * r; val a1y = vy + s * d1._1 * r
                  val a2x = vx + s * (-d2._2) * r; val a2y = vy + s * d2._1 * r
                  val mitre: Option[(Double, Double)] =
                    if (style == "mitre") {
                      val denom = d1._1 * d2._2 - d1._2 * d2._1
                      if (denom == 0) None
                      else {
                        val t = ((a2x - a1x) * d2._2 - (a2y - a1y) * d2._1) / denom
                        val mx = a1x + t * d1._1; val my = a1y + t * d1._2
                        if (math.hypot(mx - vx, my - vy) <= mitreLimit * r) Some((mx, my))
                        else None // OGC: fall back to bevel past the limit
                      }
                    } else None
                  pieces += (mitre match {
                    case Some((mx, my)) => Polygon(Array(Array(
                      vx, vy, a1x, a1y, mx, my, a2x, a2y, vx, vy)))
                    case None => Polygon(Array(Array(
                      vx, vy, a1x, a1y, a2x, a2y, vx, vy)))
                  })
                }
            }
          }
        }
        // caps at the two open ends
        if (!closed) {
          def cap(ex: Double, ey: Double, dx: Double, dy: Double): Unit = {
            // (dx,dy) = unit direction pointing OUT of the path
            capStyle match {
              case "round" => pieces += circle(ex, ey, r, n)
              case "square" =>
                val nx = -dy * r; val ny = dx * r
                pieces += Polygon(Array(Array(
                  ex + nx, ey + ny, ex + nx + dx * r, ey + ny + dy * r,
                  ex - nx + dx * r, ey - ny + dy * r, ex - nx, ey - ny,
                  ex + nx, ey + ny)))
              case _ => // flat: the segment rectangle already ends here
            }
          }
          val d0 = dirAfter(0)
          if (d0 != (0.0, 0.0)) cap(xy(0), xy(1), -d0._1, -d0._2)
          val dl = dirAfter(nPts - 2)
          if (dl != (0.0, 0.0)) cap(xy(xy.length - 2), xy(xy.length - 1), dl._1, dl._2)
        }
      }
    }
    if (pieces.isEmpty) GeometryCollection(Array.empty)
    else Overlay.unionAll(pieces.toSeq)
  }

  private def hullOfVertexCircles(g: Geometry, dist: Double, n: Int): Geometry = {
    val pts = ArrayBuffer[(Double, Double)]()
    g.foreachCoord { (x, y) =>
      var k = 0
      while (k < n) {
        val a = 2 * math.Pi * k / n
        pts += ((x + dist * math.cos(a), y + dist * math.sin(a)))
        k += 1
      }
    }
    convexHull(MultiPoint(pts.map { case (x, y) => Point(x, y) }.toArray))
  }

  /** Minkowski dilation of a set of polyline paths by radius `r`: the union
    * of per-segment rectangles and per-vertex discs (round caps/joins), plus
    * the areal bodies themselves for polygon dilation. Exact up to the
    * inscribed-polygon disc approximation (`n` segments per full circle),
    * concave inputs included — this is the general positive buffer.
    */
  private def dilatePaths(paths: Seq[Array[Double]], bodies: Seq[Geometry],
      r: Double, n: Int): Geometry = {
    val pieces = ArrayBuffer[Geometry]()
    bodies.foreach(pieces += _)
    paths.foreach { xy =>
      var i = 0
      while (i + 3 < xy.length) {
        val x1 = xy(i); val y1 = xy(i + 1); val x2 = xy(i + 2); val y2 = xy(i + 3)
        val len = math.hypot(x2 - x1, y2 - y1)
        if (len > 0) {
          val nx = -(y2 - y1) / len * r
          val ny = (x2 - x1) / len * r
          pieces += Polygon(Array(
            x1 + nx, y1 + ny, x2 + nx, y2 + ny,
            x2 - nx, y2 - ny, x1 - nx, y1 - ny, x1 + nx, y1 + ny))
        }
        i += 2
      }
      i = 0
      while (i + 1 < xy.length) {
        pieces += circle(xy(i), xy(i + 1), r, n)
        i += 2
      }
    }
    Overlay.unionAll(pieces.toSeq)
  }

  /** Erosion (inward offset) of an arbitrary simple polygon with holes:
    * subtract from `p` everything within distance `r` of its boundary —
    * per-edge both-side strips and per-vertex discs. Reflex corners get the
    * correct rounded notch; disc discretization (`4*resolution` segments)
    * makes the result a slight superset of the true erosion, vanishing with
    * resolution.
    */
  private def erodeGeneral(p: Polygon, r: Double, resolution: Int): Geometry = {
    val n = math.max(8, 4 * resolution)
    var result: Geometry = p
    p.rings.foreach { xy =>
      var i = 0
      while (i + 3 < xy.length && !result.isEmpty) {
        val x1 = xy(i); val y1 = xy(i + 1); val x2 = xy(i + 2); val y2 = xy(i + 3)
        val len = math.hypot(x2 - x1, y2 - y1)
        if (len > 0) {
          val nx = -(y2 - y1) / len * r
          val ny = (x2 - x1) / len * r
          val strip = Polygon(Array(
            x1 + nx, y1 + ny, x2 + nx, y2 + ny,
            x2 - nx, y2 - ny, x1 - nx, y1 - ny, x1 + nx, y1 + ny))
          result = Overlay.difference(result, strip)
        }
        i += 2
      }
      i = 0
      while (i + 1 < xy.length && !result.isEmpty) {
        result = Overlay.difference(result, circle(xy(i), xy(i + 1), r, n))
        i += 2
      }
    }
    result
  }

  def circle(cx: Double, cy: Double, r: Double, n: Int): Polygon = {
    val ring = new Array[Double](2 * (n + 1))
    var k = 0
    while (k < n) {
      val a = 2 * math.Pi * k / n
      ring(2 * k) = cx + r * math.cos(a)
      ring(2 * k + 1) = cy + r * math.sin(a)
      k += 1
    }
    ring(2 * n) = ring(0); ring(2 * n + 1) = ring(1)
    Polygon(ring)
  }

  // ------------------------------------------------- representative point
  /** A point guaranteed inside the geometry (reference
    * `dask_geopandas/expr.py:301-305`).
    */
  def pointOnSurface(g: Geometry): Point = {
    if (g.isEmpty) return Point.empty
    g match {
      case p: Point      => p
      case mp: MultiPoint => mp.pts.find(!_.isEmpty).getOrElse(Point.empty)
      case l: LineString =>
        // middle vertex
        Point(l.x(l.size / 2), l.y(l.size / 2))
      case m: MultiLineString => pointOnSurface(m.lines(m.lines.length / 2))
      case poly: Polygon =>
        val c = centroid(poly)
        if (Predicates.pointInPolygon(c.x, c.y, poly) == Predicates.IN) c
        else scanlinePoint(poly)
      case m: MultiPolygon =>
        // largest part
        pointOnSurface(m.polys.maxBy(Measures.area))
      case gc: GeometryCollection =>
        // highest-dimension NON-EMPTY child: an empty polygon must not win
        // over a real line (the contract is a point inside the geometry)
        val live = gc.geoms.filterNot(_.isEmpty)
        if (live.isEmpty) Point.empty else pointOnSurface(live.maxBy(_.topoDim))
    }
  }

  /** Midpoint of the widest scanline crossing at the polygon's mid-y. */
  private def scanlinePoint(poly: Polygon): Point = {
    val env = poly.envelope
    val y = (env.minY + env.maxY) / 2
    val xs = ArrayBuffer[Double]()
    poly.rings.foreach { ring =>
      var i = 0
      while (i + 3 < ring.length) {
        val y1 = ring(i + 1); val y2 = ring(i + 3)
        if ((y1 > y) != (y2 > y)) {
          xs += ring(i) + (y - y1) / (y2 - y1) * (ring(i + 2) - ring(i))
        }
        i += 2
      }
    }
    val sorted = xs.sorted
    if (sorted.length < 2) return centroid(poly)
    var best = (sorted(0) + sorted(1)) / 2; var bestW = sorted(1) - sorted(0)
    var i = 0
    while (i + 1 < sorted.length) {
      val w = sorted(i + 1) - sorted(i)
      val mid = (sorted(i) + sorted(i + 1)) / 2
      if (w > bestW && Predicates.pointInPolygon(mid, y, poly) == Predicates.IN) {
        best = mid; bestW = w
      }
      i += 2
    }
    Point(best, y)
  }

  // -------------------------------------------------------- line reference
  /** Point at `distance` along the line (clamped); `normalized` in [0,1]
    * (reference `dask_geopandas/expr.py:330-337`).
    */
  def lineInterpolatePoint(g: Geometry, distance: Double, normalized: Boolean = false): Point = {
    val l = g match {
      case l: LineString => l
      case m: MultiLineString if m.lines.nonEmpty => m.lines(0)
      case _ => return Point.empty
    }
    if (l.isEmpty) return Point.empty
    val total = Measures.pathLength(l.xy)
    var target = if (normalized) distance * total else distance
    if (target <= 0) return Point(l.x(0), l.y(0))
    if (target >= total) return Point(l.x(l.size - 1), l.y(l.size - 1))
    var i = 0
    while (i + 3 < l.xy.length) {
      val segLen = math.hypot(l.xy(i + 2) - l.xy(i), l.xy(i + 3) - l.xy(i + 1))
      if (target <= segLen && segLen > 0) {
        val t = target / segLen
        return Point(l.xy(i) + t * (l.xy(i + 2) - l.xy(i)),
          l.xy(i + 1) + t * (l.xy(i + 3) - l.xy(i + 1)))
      }
      target -= segLen
      i += 2
    }
    Point(l.x(l.size - 1), l.y(l.size - 1))
  }

  /** Partial line between two normalized length fractions —
    * shapely.ops.substring / PostGIS ST_LineSubstring. Fractions clamp to
    * [0, 1] and swap if reversed; a degenerate window (f0 == f1) yields
    * the interpolated POINT at that fraction, like PostGIS. Interior
    * vertices between the cut points are preserved; the cut endpoints are
    * interpolated on their segments.
    *
    * MultiLineString input operates on the FIRST component only — this
    * repo's convention, shared with [[lineInterpolatePoint]] and
    * [[lineProject]]. It deliberately diverges from PostGIS (returns NULL)
    * and shapely (raises) for multi-part input: a defined first-part answer
    * composes with `explode` for per-part substrings, while a null/throw
    * poisons whole columns at scale. Documented at the st_linesubstring
    * registration.
    */
  def lineSubstring(g: Geometry, f0In: Double, f1In: Double): Geometry = {
    val l = g match {
      case l: LineString => l
      case m: MultiLineString if m.lines.nonEmpty => m.lines(0)
      case _ => return LineString(Array.empty[Double])
    }
    if (l.isEmpty) return LineString(Array.empty[Double])
    val lo = math.max(0.0, math.min(f0In, f1In))
    val hi = math.min(1.0, math.max(f0In, f1In))
    if (lo >= 1.0) return lineInterpolatePoint(l, 1.0, normalized = true)
    if (hi == lo) return lineInterpolatePoint(l, lo, normalized = true)
    val total = Measures.pathLength(l.xy)
    if (total == 0) return lineInterpolatePoint(l, lo, normalized = true)
    val s0 = lo * total
    val s1 = hi * total
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    def push(x: Double, y: Double): Unit = {
      val m = out.length
      if (m < 2 || out(m - 2) != x || out(m - 1) != y) { out += x; out += y }
    }
    var walked = 0.0
    var i = 0
    while (i + 3 < l.xy.length) {
      val x0 = l.xy(i); val y0 = l.xy(i + 1)
      val x1 = l.xy(i + 2); val y1 = l.xy(i + 3)
      val segLen = math.hypot(x1 - x0, y1 - y0)
      val a = walked; val b = walked + segLen
      if (segLen > 0 && b > s0 && a < s1) {
        val t0 = math.max(0.0, (s0 - a) / segLen)
        val t1 = math.min(1.0, (s1 - a) / segLen)
        push(x0 + t0 * (x1 - x0), y0 + t0 * (y1 - y0))
        push(x0 + t1 * (x1 - x0), y0 + t1 * (y1 - y0))
      }
      walked = b
      i += 2
    }
    if (out.length < 4) lineInterpolatePoint(l, lo, normalized = true)
    else LineString(out.toArray)
  }

  /** shapely.ops.split for polyline inputs: cut `g` at every point where
    * `splitter` meets its interior. A Point/MultiPoint splitter cuts
    * where a point lies ON the line (within 1e-9); a line-ish or polygon
    * splitter cuts at segment-intersection points with the splitter's
    * curves (polygons contribute their boundary rings; collinear
    * overlaps cut at the overlap's endpoints). Returns a
    * GEOMETRYCOLLECTION of the parts in path order, like shapely; cuts
    * landing on the line's own endpoints are no-ops, and a splitter that
    * never meets the interior returns the input as the single part.
    */
  def split(g: Geometry, splitter: Geometry): GeometryCollection = {
    val lines: Seq[LineString] = g match {
      case l: LineString => Seq(l)
      case m: MultiLineString => m.lines.toSeq
      case _: Polygon | _: MultiPolygon => return splitPolygon(g, splitter)
      case _ => throw new IllegalArgumentException(
        s"split: (Multi)LineString or polygonal inputs are supported, got ${g.geometryType}")
    }
    GeometryCollection(lines.flatMap(splitOne(_, splitter)).toArray)
  }

  /** shapely.ops.split for POLYGON inputs cut by a line: node the
    * polygon's boundary rings together with the splitter, polygonize the
    * noded arrangement, and keep the faces whose interior point lies
    * inside the original polygon — the standard split-by-polygonize
    * construction. A splitter that doesn't cross the interior returns
    * the input as the single part.
    */
  def splitPolygon(poly: Geometry, splitter: Geometry): GeometryCollection = {
    val rings: Seq[Array[Double]] = poly match {
      case p: Polygon => p.rings.toSeq
      case mp: MultiPolygon => mp.polys.flatMap(_.rings).toSeq
      case _ => throw new IllegalArgumentException(
        s"splitPolygon: polygonal input required, got ${poly.geometryType}")
    }
    val cutLines: Seq[LineString] = splitter match {
      case l: LineString => Seq(l)
      case m: MultiLineString => m.lines.toSeq
      case _ => throw new IllegalArgumentException(
        s"splitPolygon: line splitter required, got ${splitter.geometryType}")
    }
    val arrangement = GeometryCollection(
      (rings.map(LineString(_): Geometry) ++ cutLines).toArray)
    val faces = Geometry.parts(Polygonize.polygonize(Noding.node(arrangement)))
      .filter { f =>
        val ip = pointOnSurface(f)
        !ip.isEmpty && Predicates.within(ip, poly)
      }
    if (faces.isEmpty) GeometryCollection(Array(poly))
    else GeometryCollection(faces.toArray)
  }

  private def splitOne(l: LineString, splitter: Geometry): Seq[Geometry] = {
    if (l.isEmpty) return Seq(l)
    val total = Measures.pathLength(l.xy)
    if (total == 0) return Seq(l)
    val eps = 1e-9
    val cuts = scala.collection.mutable.SortedSet.empty[Double]
    def addCutAt(px: Double, py: Double): Unit = {
      var walked = 0.0
      var i = 0
      while (i + 3 < l.xy.length) {
        val x0 = l.xy(i); val y0 = l.xy(i + 1)
        val x1 = l.xy(i + 2); val y1 = l.xy(i + 3)
        val segLen = math.hypot(x1 - x0, y1 - y0)
        if (segLen > 0 && Measures.pointToSegment(px, py, x0, y0, x1, y1) <= eps) {
          val t = ((px - x0) * (x1 - x0) + (py - y0) * (y1 - y0)) / (segLen * segLen)
          val s = walked + math.max(0.0, math.min(1.0, t)) * segLen
          if (s > eps && s < total - eps) cuts += s / total
          return
        }
        walked += segLen
        i += 2
      }
    }
    def curves(sp: Geometry): Seq[Array[Double]] = sp match {
      case sl: LineString => Seq(sl.xy)
      case m: MultiLineString => m.lines.map(_.xy).toSeq
      case p: Polygon => p.rings.toSeq
      case mp: MultiPolygon => mp.polys.flatMap(_.rings).toSeq
      case gc: GeometryCollection => gc.geoms.toSeq.flatMap(curves)
      case _ => Nil
    }
    splitter match {
      case p: Point if !p.isEmpty => addCutAt(p.x, p.y)
      case mp: MultiPoint => mp.pts.foreach(p => if (!p.isEmpty) addCutAt(p.x, p.y))
      case other =>
        for (c <- curves(other)) {
          var i = 0
          while (i + 3 < l.xy.length) {
            val ax = l.xy(i); val ay = l.xy(i + 1)
            val bx = l.xy(i + 2); val by = l.xy(i + 3)
            val dx = bx - ax; val dy = by - ay
            var j = 0
            while (j + 3 < c.length) {
              val cx = c(j); val cy = c(j + 1)
              val ex = c(j + 2); val ey = c(j + 3)
              val fx = ex - cx; val fy = ey - cy
              val denom = dx * fy - dy * fx
              if (denom != 0) {
                val t = ((cx - ax) * fy - (cy - ay) * fx) / denom
                val u = ((cx - ax) * dy - (cy - ay) * dx) / denom
                if (t >= 0 && t <= 1 && u >= 0 && u <= 1)
                  addCutAt(ax + t * dx, ay + t * dy)
              } else if (dx * (cy - ay) - dy * (cx - ax) == 0) {
                // collinear overlap: the overlap's endpoints are the cuts
                addCutAt(cx, cy); addCutAt(ex, ey)
              }
              j += 2
            }
            i += 2
          }
        }
    }
    if (cuts.isEmpty) Seq(l)
    else {
      val fr = 0.0 +: cuts.toSeq :+ 1.0
      fr.sliding(2).map { w => lineSubstring(l, w.head, w.last) }.toSeq
    }
  }

  /** Distance along the line of the closest point to p (st_linelocatepoint /
    * shapely project — reference `dask_geopandas/expr.py:1001-1013`).
    */
  def lineLocatePoint(g: Geometry, p: Point, normalized: Boolean = false): Double = {
    val l = g match {
      case l: LineString => l
      case m: MultiLineString if m.lines.nonEmpty => m.lines(0)
      case _ => return Double.NaN
    }
    if (l.isEmpty || p.isEmpty) return Double.NaN
    var best = Double.PositiveInfinity
    var bestAlong = 0.0
    var along = 0.0
    var i = 0
    while (i + 3 < l.xy.length) {
      val x1 = l.xy(i); val y1 = l.xy(i + 1); val x2 = l.xy(i + 2); val y2 = l.xy(i + 3)
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      val segLen = math.sqrt(len2)
      var t = if (len2 == 0) 0.0 else ((p.x - x1) * dx + (p.y - y1) * dy) / len2
      if (t < 0) t = 0 else if (t > 1) t = 1
      val d = math.hypot(p.x - (x1 + t * dx), p.y - (y1 + t * dy))
      if (d < best) { best = d; bestAlong = along + t * segLen }
      along += segLen
      i += 2
    }
    if (normalized) { if (along == 0) 0.0 else bestAlong / along } else bestAlong
  }

  // --------------------------------------------------------------- affine
  /** 2-D affine: x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff
    * (matches shapely's 6-element matrix order [a,b,d,e,xoff,yoff] used by
    * reference `dask_geopandas/expr.py:339-343`).
    */
  def affine(g: Geometry, a: Double, b: Double, d: Double, e: Double,
      xoff: Double, yoff: Double): Geometry =
    g.mapCoords((x, y) => (a * x + b * y + xoff, d * x + e * y + yoff))

  def translate(g: Geometry, xoff: Double, yoff: Double): Geometry =
    affine(g, 1, 0, 0, 1, xoff, yoff)

  /** origin semantics: shapely default 'center' = bbox center. */
  def originOf(g: Geometry, origin: String): (Double, Double) = origin match {
    case "centroid" => val c = centroid(g); (c.x, c.y)
    case _          => val e = g.envelope; (e.midX, e.midY)
  }

  def rotate(g: Geometry, angle: Double, ox: Double, oy: Double,
      useRadians: Boolean = false): Geometry = {
    val rad = if (useRadians) angle else math.toRadians(angle)
    val c = math.cos(rad); val s = math.sin(rad)
    g.mapCoords((x, y) => (ox + c * (x - ox) - s * (y - oy), oy + s * (x - ox) + c * (y - oy)))
  }

  def scale(g: Geometry, xf: Double, yf: Double, ox: Double, oy: Double): Geometry =
    g.mapCoords((x, y) => (ox + xf * (x - ox), oy + yf * (y - oy)))

  def skew(g: Geometry, xs: Double, ys: Double, ox: Double, oy: Double,
      useRadians: Boolean = false): Geometry = {
    val tx = math.tan(if (useRadians) xs else math.toRadians(xs))
    val ty = math.tan(if (useRadians) ys else math.toRadians(ys))
    g.mapCoords((x, y) => (x + tx * (y - oy), y + ty * (x - ox)))
  }

  // ------------------------------------------------------------- subdivide
  /** PostGIS-style `ST_Subdivide`: recursively bisect a geometry's
    * envelope (longer axis, midpoint) and clip, until every piece carries
    * at most `maxVertices` vertices. The join-balance operator for
    * oversized geometries at scale — a continent-sized polygon becomes
    * many grid-join-friendly tiles whose union covers exactly the
    * original (pieces share only split-line boundaries, so areas sum to
    * the original area).
    *
    * Multi-part inputs subdivide per part; points/empties pass through
    * (one piece). `maxVertices` >= 8 (a clipped box fragment needs ring
    * room, same spirit as PostGIS's >= 5 floor on a tighter clipper).
    * Depth is bounded (48 bisections = 2^48 tiles on an axis) so a
    * pathological sliver cannot recurse forever; a piece that stops
    * shrinking is emitted as-is rather than looping.
    */
  def subdivide(g: Geometry, maxVertices: Int): Seq[Geometry] = {
    require(maxVertices >= 8, s"subdivide: maxVertices must be >= 8, got $maxVertices")
    def go(gg: Geometry, depth: Int): Seq[Geometry] = {
      if (gg.isEmpty) Nil
      else if (gg.numPoints <= maxVertices || depth >= 48) Seq(gg)
      else {
        val e = gg.envelope
        val (a, b) =
          if (e.maxX - e.minX >= e.maxY - e.minY) {
            val mx = (e.minX + e.maxX) / 2.0
            if (mx <= e.minX || mx >= e.maxX) return Seq(gg) // degenerate extent
            (Overlay.clipByRect(gg, e.minX, e.minY, mx, e.maxY),
              Overlay.clipByRect(gg, mx, e.minY, e.maxX, e.maxY))
          } else {
            val my = (e.minY + e.maxY) / 2.0
            if (my <= e.minY || my >= e.maxY) return Seq(gg)
            (Overlay.clipByRect(gg, e.minX, e.minY, e.maxX, my),
              Overlay.clipByRect(gg, e.minX, my, e.maxX, e.maxY))
          }
        // a clip that failed to shrink the piece would recurse forever —
        // emit the offender instead (clipByRect is snap-rounded; exact
        // on-boundary slivers can resist splitting)
        val halves = Seq(a, b).filterNot(_.isEmpty)
        if (halves.exists(h => h.numPoints >= gg.numPoints) &&
            halves.map(_.numPoints).sum >= 2 * gg.numPoints) Seq(gg)
        else halves.flatMap(go(_, depth + 1))
      }
    }
    g match {
      case c: GeometryCollectionLike => c.children.flatMap(p => go(p, 0)).toSeq
      case other                     => go(other, 0)
    }
  }
}
