package graft.geom

import scala.collection.mutable

/** Extended constructive operators — the geopandas-proper surface one notch
  * past the reference's binding list (`dask_geopandas/expr.py:947-1013`
  * stops at the classic set; geopandas itself exposes these via shapely 2.x
  * and dask-geopandas inherits them per-partition). Semantics follow
  * shapely/GEOS; deviations are documented per function.
  */
object Extended {

  /** Reverse coordinate order of every path (GEOS Reverse). Rings flip
    * orientation; points are unchanged.
    */
  def reverse(g: Geometry): Geometry = g match {
    case p: Point => p
    case l: LineString => reverseLine(l)
    case p: Polygon => Polygon(p.rings.map(reverseRing))
    case m: MultiPoint => m
    case m: MultiLineString => MultiLineString(m.lines.map(reverseLine))
    case m: MultiPolygon => MultiPolygon(m.polys.map(p => Polygon(p.rings.map(reverseRing))))
    case c: GeometryCollection => GeometryCollection(c.geoms.map(reverse))
  }

  private def reverseRing(xy: Array[Double]): Array[Double] = {
    val n = xy.length / 2
    val out = new Array[Double](xy.length)
    var i = 0
    while (i < n) {
      out(2 * i) = xy(2 * (n - 1 - i))
      out(2 * i + 1) = xy(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  private def reverseLine(l: LineString): LineString =
    LineString(reverseRing(l.xy), if (l.zs == null) null else l.zs.reverse)

  /** Drop Z from every coordinate (shapely force_2d). */
  def force2d(g: Geometry): Geometry = g match {
    case p: Point => if (p.hasZ) Point(p.x, p.y) else p
    case l: LineString => if (l.zs == null) l else LineString(l.xy, null)
    case p: Polygon => p // rings carry no Z in this model
    case m: MultiPoint => MultiPoint(m.pts.map(p => force2d(p).asInstanceOf[Point]))
    case m: MultiLineString =>
      MultiLineString(m.lines.map(l => force2d(l).asInstanceOf[LineString]))
    case m: MultiPolygon => m
    case c: GeometryCollection => GeometryCollection(c.geoms.map(force2d))
  }

  /** Insert vertices so no segment exceeds `maxLen` (GEOS Densify /
    * shapely segmentize). Each segment of length L splits into
    * ceil(L/maxLen) equal pieces; existing vertices are kept; Z values
    * interpolate linearly when present.
    */
  def segmentize(g: Geometry, maxLen: Double): Geometry = {
    require(maxLen > 0, s"segmentize: maxLen must be positive, got $maxLen")
    g match {
      case p: Point => p
      case l: LineString =>
        val (xy, zs) = densify(l.xy, l.zs, maxLen)
        LineString(xy, zs)
      case p: Polygon => Polygon(p.rings.map(r => densify(r, null, maxLen)._1))
      case m: MultiPoint => m
      case m: MultiLineString =>
        MultiLineString(m.lines.map(l => segmentize(l, maxLen).asInstanceOf[LineString]))
      case m: MultiPolygon =>
        MultiPolygon(m.polys.map(p => segmentize(p, maxLen).asInstanceOf[Polygon]))
      case c: GeometryCollection => GeometryCollection(c.geoms.map(segmentize(_, maxLen)))
    }
  }

  /** Chaikin corner-cutting smoothing (PostGIS ST_ChaikinSmoothing):
    * each iteration replaces every segment with its 1/4 and 3/4 points —
    * rings are cut at every corner (output stays closed); line endpoints
    * are always preserved (the PostGIS behavior). Pure rational blends,
    * so results are exactly reproducible in SQL mirrors.
    */
  def chaikinSmooth(g: Geometry, iters: Int = 1): Geometry = {
    require(iters >= 1 && iters <= 10,
      s"chaikinSmooth: iters in 1..10 (each iteration doubles vertices), got $iters")
    def oneLine(xy: Array[Double]): Array[Double] = {
      val k = xy.length / 2
      if (k < 3) return xy
      val out = mutable.ArrayBuilder.make[Double]
      out += xy(0) += xy(1) // preserve start
      var i = 0
      while (i < k - 1) {
        val x1 = xy(2 * i); val y1 = xy(2 * i + 1)
        val x2 = xy(2 * i + 2); val y2 = xy(2 * i + 3)
        // skip the Q of the first segment / R of the last (endpoints kept)
        if (i > 0) out += x1 + 0.25 * (x2 - x1) += y1 + 0.25 * (y2 - y1)
        if (i < k - 2) out += x1 + 0.75 * (x2 - x1) += y1 + 0.75 * (y2 - y1)
        i += 1
      }
      out += xy(2 * k - 2) += xy(2 * k - 1) // preserve end
      out.result()
    }
    def oneRing(ring: Array[Double]): Array[Double] = {
      val k = ring.length / 2 - 1 // drop the closing duplicate
      if (k < 3) return ring
      val out = new Array[Double](k * 4 + 2)
      var i = 0
      while (i < k) {
        val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
        val x2 = ring(2 * (i + 1)); val y2 = ring(2 * (i + 1) + 1)
        out(4 * i) = x1 + 0.25 * (x2 - x1); out(4 * i + 1) = y1 + 0.25 * (y2 - y1)
        out(4 * i + 2) = x1 + 0.75 * (x2 - x1); out(4 * i + 3) = y1 + 0.75 * (y2 - y1)
        i += 1
      }
      out(k * 4) = out(0); out(k * 4 + 1) = out(1) // close
      out
    }
    def once(gg: Geometry): Geometry = gg match {
      case p: Point      => p
      case m: MultiPoint => m
      case l: LineString => LineString(oneLine(l.xy))
      case m: MultiLineString =>
        MultiLineString(m.lines.map(l => LineString(oneLine(l.xy))))
      case p: Polygon    => Polygon(p.rings.map(oneRing))
      case m: MultiPolygon =>
        MultiPolygon(m.polys.map(p => Polygon(p.rings.map(oneRing))))
      case c: GeometryCollection => GeometryCollection(c.geoms.map(once))
    }
    (1 to iters).foldLeft(g)((acc, _) => once(acc))
  }

  /** Geometric median of a (multi)point (PostGIS ST_GeometricMedian):
    * Weiszfeld iteration from the arithmetic mean, FIXED iteration count
    * so the result is a pure function of the input (exactly
    * SQL-mirrorable by unrolling). The Weiszfeld singularity (the iterate
    * landing on an input point) returns that point — it is within one
    * update of optimal there and any continuation divides by zero.
    */
  def geometricMedian(g: Geometry, iters: Int = 3): Geometry = {
    val pts: Array[Double] = g match {
      case p: Point      => return p
      case m: MultiPoint =>
        val out = new Array[Double](m.pts.length * 2)
        var i = 0
        while (i < m.pts.length) {
          out(2 * i) = m.pts(i).x; out(2 * i + 1) = m.pts(i).y; i += 1
        }
        out
      case other => throw new IllegalArgumentException(
        s"st_geometricmedian expects a (multi)point, got ${other.getClass.getSimpleName}")
    }
    val k = pts.length / 2
    if (k == 0) return MultiPoint(Array.empty)
    var x = 0.0; var y = 0.0
    var i = 0
    while (i < k) { x += pts(2 * i); y += pts(2 * i + 1); i += 1 }
    x /= k; y /= k
    var it = 0
    while (it < iters) {
      var sw = 0.0; var sx = 0.0; var sy = 0.0
      var hit = false
      i = 0
      while (i < k && !hit) {
        val d = math.hypot(x - pts(2 * i), y - pts(2 * i + 1))
        if (d < 1e-12) hit = true
        else { val w = 1.0 / d; sw += w; sx += w * pts(2 * i); sy += w * pts(2 * i + 1) }
        i += 1
      }
      if (hit) it = iters // landed on an input point: stop
      else { x = sx / sw; y = sy / sw; it += 1 }
    }
    Point(x, y)
  }

  /** PostGIS ST_LongestLine / ST_MaxDistance: the farthest vertex pair
    * between two geometries (max distance over segments is attained at
    * their endpoints, so the vertex sets suffice). Deterministic: the
    * FIRST maximal pair in vertex order wins ties. Returns the 2-point
    * LineString a→b; [[maxDistance]] is its length.
    */
  def longestLine(a: Geometry, b: Geometry): Geometry = {
    val va = vertices(a); val vb = vertices(b)
    if (va.isEmpty || vb.isEmpty) return LineString(Array.empty)
    var best = -1.0; var bi = 0; var bj = 0
    var i = 0
    while (i < va.length / 2) {
      var j = 0
      while (j < vb.length / 2) {
        val dx = va(2 * i) - vb(2 * j); val dy = va(2 * i + 1) - vb(2 * j + 1)
        val d2 = dx * dx + dy * dy
        if (d2 > best) { best = d2; bi = i; bj = j }
        j += 1
      }
      i += 1
    }
    LineString(Array(va(2 * bi), va(2 * bi + 1), vb(2 * bj), vb(2 * bj + 1)))
  }

  def maxDistance(a: Geometry, b: Geometry): Double = longestLine(a, b) match {
    case l: LineString if l.xy.length == 4 =>
      math.hypot(l.xy(2) - l.xy(0), l.xy(3) - l.xy(1))
    case _ => Double.NaN
  }

  /** All vertex coordinates of a geometry, packed (x0,y0,x1,y1,...). */
  private def vertices(g: Geometry): Array[Double] = {
    val out = mutable.ArrayBuilder.make[Double]
    g.mapCoords { (x, y) => out += x += y; (x, y) }
    out.result()
  }

  private def densify(xy: Array[Double], zs: Array[Double],
      maxLen: Double): (Array[Double], Array[Double]) = {
    if (xy.length < 4) return (xy, zs)
    val outXy = mutable.ArrayBuilder.make[Double]
    val outZ = if (zs == null) null else mutable.ArrayBuilder.make[Double]
    var i = 0
    while (i + 3 < xy.length) {
      val x1 = xy(i); val y1 = xy(i + 1); val x2 = xy(i + 2); val y2 = xy(i + 3)
      val len = math.hypot(x2 - x1, y2 - y1)
      val pieces = math.max(1, math.ceil(len / maxLen).toInt)
      var k = 0
      while (k < pieces) {
        val t = k.toDouble / pieces
        outXy += x1 + t * (x2 - x1) += y1 + t * (y2 - y1)
        if (outZ != null) outZ += zs(i / 2) + t * (zs(i / 2 + 1) - zs(i / 2))
        k += 1
      }
      i += 2
    }
    outXy += xy(xy.length - 2) += xy(xy.length - 1)
    if (outZ != null) outZ += zs(zs.length - 1)
    (outXy.result(), if (outZ == null) null else outZ.result())
  }

  /** Drop consecutive vertices closer than `tol` (shapely
    * remove_repeated_points). First and last points of every path are
    * always kept, so rings stay closed; (Multi)Points return unchanged,
    * matching shapely.
    */
  def removeRepeatedPoints(g: Geometry, tol: Double = 0.0): Geometry = g match {
    case p: Point => p
    case m: MultiPoint => m
    case l: LineString => LineString(dedupPath(l.xy, tol))
    case p: Polygon => Polygon(p.rings.map(r => dedupPath(r, tol)))
    case m: MultiLineString =>
      MultiLineString(m.lines.map(l => LineString(dedupPath(l.xy, tol))))
    case m: MultiPolygon =>
      MultiPolygon(m.polys.map(p => Polygon(p.rings.map(r => dedupPath(r, tol)))))
    case c: GeometryCollection =>
      GeometryCollection(c.geoms.map(removeRepeatedPoints(_, tol)))
  }

  private def dedupPath(xy: Array[Double], tol: Double): Array[Double] = {
    if (xy.length <= 4) return xy
    val out = mutable.ArrayBuilder.make[Double]
    out += xy(0) += xy(1)
    var lastX = xy(0); var lastY = xy(1)
    var i = 2
    while (i < xy.length - 2) {
      val d = math.hypot(xy(i) - lastX, xy(i + 1) - lastY)
      if (d > tol) {
        out += xy(i) += xy(i + 1)
        lastX = xy(i); lastY = xy(i + 1)
      }
      i += 2
    }
    out += xy(xy.length - 2) += xy(xy.length - 1)
    out.result()
  }

  /** Every distinct vertex, in order of first occurrence, as a MultiPoint
    * (GEOS ExtractUniquePoints). Exact coordinate equality.
    */
  def extractUniquePoints(g: Geometry): Geometry = {
    val seen = mutable.LinkedHashSet.empty[(Double, Double)]
    g.foreachCoord((x, y) => seen += ((x, y)))
    if (seen.isEmpty) MultiPoint(Array.empty)
    else MultiPoint(seen.iterator.map { case (x, y) => Point(x, y) }.toArray)
  }

  /** Smallest enclosing circle of the vertices (Welzl's algorithm with the
    * input order — deterministic, no randomization; expected-linear cost
    * relies on typical vertex orders, worst case O(n²) on adversarial
    * inputs, fine at per-row geometry sizes). Returns (cx, cy, radius);
    * NaNs for empty input.
    */
  def minimumBoundingCenterRadius(g: Geometry): (Double, Double, Double) = {
    val pts = mutable.ArrayBuffer.empty[(Double, Double)]
    g.foreachCoord((x, y) => pts += ((x, y)))
    if (pts.isEmpty) return (Double.NaN, Double.NaN, Double.NaN)
    var cx = pts(0)._1; var cy = pts(0)._2; var r = 0.0
    @inline def inside(p: (Double, Double)): Boolean =
      math.hypot(p._1 - cx, p._2 - cy) <= r * (1 + 1e-12) + 1e-300
    def circle2(a: (Double, Double), b: (Double, Double)): Unit = {
      cx = (a._1 + b._1) / 2; cy = (a._2 + b._2) / 2
      r = math.hypot(a._1 - b._1, a._2 - b._2) / 2
    }
    def circle3(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Boolean = {
      val d = 2 * (a._1 * (b._2 - c._2) + b._1 * (c._2 - a._2) + c._1 * (a._2 - b._2))
      if (d == 0) return false // collinear
      val a2 = a._1 * a._1 + a._2 * a._2
      val b2 = b._1 * b._1 + b._2 * b._2
      val c2 = c._1 * c._1 + c._2 * c._2
      cx = (a2 * (b._2 - c._2) + b2 * (c._2 - a._2) + c2 * (a._2 - b._2)) / d
      cy = (a2 * (c._1 - b._1) + b2 * (a._1 - c._1) + c2 * (b._1 - a._1)) / d
      r = math.hypot(a._1 - cx, a._2 - cy)
      true
    }
    // incremental Welzl (move-to-front flavor without the random shuffle)
    var i = 1
    while (i < pts.length) {
      if (!inside(pts(i))) {
        cx = pts(i)._1; cy = pts(i)._2; r = 0.0
        var j = 0
        while (j < i) {
          if (!inside(pts(j))) {
            circle2(pts(i), pts(j))
            var k = 0
            while (k < j) {
              if (!inside(pts(k))) {
                if (!circle3(pts(i), pts(j), pts(k))) {
                  // collinear triple: the two farthest apart span the circle
                  val d1 = math.hypot(pts(i)._1 - pts(j)._1, pts(i)._2 - pts(j)._2)
                  val d2 = math.hypot(pts(i)._1 - pts(k)._1, pts(i)._2 - pts(k)._2)
                  val d3 = math.hypot(pts(j)._1 - pts(k)._1, pts(j)._2 - pts(k)._2)
                  if (d1 >= d2 && d1 >= d3) circle2(pts(i), pts(j))
                  else if (d2 >= d3) circle2(pts(i), pts(k))
                  else circle2(pts(j), pts(k))
                }
              }
              k += 1
            }
          }
          j += 1
        }
      }
      i += 1
    }
    (cx, cy, r)
  }

  /** Smallest enclosing circle as a polygon (shapely
    * minimum_bounding_circle), approximated with `resolution` segments per
    * quadrant like st_buffer. Degenerate single-vertex input returns the
    * point itself.
    */
  def minimumBoundingCircle(g: Geometry, resolution: Int = 16): Geometry = {
    val (cx, cy, r) = minimumBoundingCenterRadius(g)
    if (cx.isNaN) GeometryCollection(Array.empty)
    else if (r == 0.0) Point(cx, cy)
    else Constructive.circle(cx, cy, r, math.max(1, resolution) * 4)
  }

  /** PostGIS ST_SnapToGrid: every vertex moves to the nearest grid node
    * (`floor(x/size + 0.5) * size` — one explicit rounding rule so
    * external engines can mirror the arithmetic bit-for-bit), consecutive
    * duplicate vertices collapse, and degenerate parts drop: a path left
    * with < 2 distinct points becomes empty, a ring left with < 3
    * (before re-closing) is removed — a polygon losing its shell becomes
    * empty (the PostGIS contract; like PostGIS, the result is NOT
    * guaranteed valid — `st_makevalid` is the repair step).
    */
  def snapToGrid(g: Geometry, size: Double): Geometry = {
    require(size > 0.0, s"snapToGrid: size > 0 (got $size)")
    def snap(v: Double): Double = math.floor(v / size + 0.5) * size
    // snap + collapse consecutive duplicates over an OPEN path; kept
    // vertex indices come along so Z values (untouched by the grid, per
    // PostGIS) stay aligned with their vertices
    def pathIdx(xy: Array[Double]): (Array[Double], Array[Int]) = {
      val out = mutable.ArrayBuilder.make[Double]
      val idx = mutable.ArrayBuilder.make[Int]
      var px = Double.NaN; var py = Double.NaN
      var i = 0
      while (i < xy.length) {
        val x = snap(xy(i)); val y = snap(xy(i + 1))
        if (!(x == px && y == py)) { out += x; out += y; idx += i / 2; px = x; py = y }
        i += 2
      }
      (out.result(), idx.result())
    }
    def path(xy: Array[Double]): Array[Double] = pathIdx(xy)._1
    def ring(r: Array[Double]): Option[Array[Double]] = {
      // open (drop the closing vertex), snap/dedupe, re-close
      val open = if (r.length >= 4 && r(0) == r(r.length - 2) &&
        r(1) == r(r.length - 1)) r.dropRight(2) else r
      var p = path(open)
      // snapping can re-merge the first and last vertex
      if (p.length >= 4 && p(0) == p(p.length - 2) && p(1) == p(p.length - 1))
        p = p.dropRight(2)
      if (p.length < 6) None // fewer than 3 distinct corners: degenerate
      else Some(p ++ Array(p(0), p(1)))
    }
    g match {
      case p: Point if p.isEmpty => p
      case p: Point => Point(snap(p.x), snap(p.y), p.z) // Z untouched
      case m: MultiPoint =>
        // dedupe by snapped coordinates + Z bits (case-class equality
        // fails on the NaN z; first occurrence keeps its Z)
        val seen = mutable.LinkedHashSet.empty[(Double, Double, Long)]
        val kept = mutable.ArrayBuffer.empty[Point]
        m.pts.foreach { p =>
          val key = (snap(p.x), snap(p.y), java.lang.Double.doubleToLongBits(p.z))
          if (seen.add(key)) kept += Point(snap(p.x), snap(p.y), p.z)
        }
        MultiPoint(kept.toArray)
      case l: LineString =>
        val (p, ki) = pathIdx(l.xy)
        if (p.length < 4) LineString(Array.empty[Double])
        else if (l.zs == null) LineString(p)
        else LineString(p, ki.map(l.zs))
      case m: MultiLineString =>
        MultiLineString(m.lines.map { l =>
          val (p, ki) = pathIdx(l.xy)
          if (p.length < 4) LineString(Array.empty[Double])
          else if (l.zs == null) LineString(p)
          else LineString(p, ki.map(l.zs))
        }.filter(_.xy.length >= 4))
      case p: Polygon =>
        if (p.isEmpty) p
        else ring(p.shell) match {
          case None => Polygon(Array.empty[Array[Double]])
          case Some(sh) =>
            Polygon(Array(sh) ++ (1 until p.rings.length).flatMap(i => ring(p.rings(i))))
        }
      case m: MultiPolygon =>
        MultiPolygon(m.polys.map(q => snapToGrid(q, size).asInstanceOf[Polygon])
          .filter(!_.isEmpty))
      case c: GeometryCollection =>
        GeometryCollection(c.geoms.map(snapToGrid(_, size)).filter(!_.isEmpty))
    }
  }

  /** Largest circle fully contained in a polygonal geometry (shapely 2.x
    * maximum_inscribed_circle / PostGIS ST_MaximumInscribedCircle),
    * located with the polylabel quadtree search (Mapbox 2016): cells are
    * explored best-first by `signedDist(center) + half·√2` (an upper
    * bound on any point in the cell) and subdivided until the bound is
    * within `tolerance` of the best center found — so the returned
    * radius is within `tolerance` of the true optimum. Holes are handled
    * by the signed distance (negative outside the area, including inside
    * a hole); multipolygons converge into whichever part holds the
    * larger circle. The search order is a deterministic total order
    * (bound, then coordinates), so results are bit-stable across runs
    * and partition layouts.
    *
    * Returns the shapely convention: a 2-point LineString from the
    * circle center to the nearest boundary point (radius = its length);
    * empty input → empty LineString. `tolerance <= 0` → max bbox
    * dimension / 1000 (the PostGIS default).
    */
  def maximumInscribedCircle(g: Geometry, tolerance: Double = 0.0): Geometry = {
    if (g.isEmpty) return LineString(Array.empty[Double])
    require(g.topoDim == 2,
      "maximum_inscribed_circle expects a (multi)polygon input")
    val env = g.envelope
    val w = env.maxX - env.minX
    val h = env.maxY - env.minY
    val bnd = Constructive.boundary(g)
    def sd(x: Double, y: Double): Double = {
      val p = Point(x, y)
      val d = Measures.distance(p, bnd)
      val dd = if (d.isNaN) 0.0 else d
      if (Predicates.covers(g, p)) dd else -dd
    }
    if (w == 0.0 || h == 0.0) {
      // degenerate (zero-area) polygon: center = bbox midpoint, radius 0
      val cx = (env.minX + env.maxX) / 2.0; val cy = (env.minY + env.maxY) / 2.0
      return LineString(Array(cx, cy, cx, cy))
    }
    val tol = if (tolerance > 0) tolerance else math.max(w, h) / 1000.0
    val sqrt2 = math.sqrt(2.0)
    final case class Cell(x: Double, y: Double, half: Double, d: Double) {
      val pot: Double = d + half * sqrt2
    }
    // best is updated at EVALUATION time (not dequeue), which licenses
    // the early exit below: the queue is ordered by pot, so once the top
    // cell's bound is within tol of best, no remaining cell can do
    // better than tol — stop instead of draining the frontier (on
    // rectangle-like inputs the optimum is a 1-D ridge of centers and a
    // full drain subdivides linearly in 1/tol along it)
    var best: Cell = null
    def cell(x: Double, y: Double, half: Double): Cell = {
      val c = Cell(x, y, half, sd(x, y))
      if (best == null || c.d > best.d ||
          (c.d == best.d && (c.x < best.x || (c.x == best.x && c.y < best.y))))
        best = Cell(c.x, c.y, 0.0, c.d)
      c
    }
    // deterministic total order: bound first, then coordinates
    val pq = mutable.PriorityQueue.empty[Cell](
      Ordering.by((c: Cell) => (c.pot, -c.x, -c.y, c.half)))
    val cellSize = math.min(w, h)
    val half0 = cellSize / 2.0
    // seed with the bbox center and a guaranteed-interior point so the
    // search never starts from an all-negative frontier
    cell((env.minX + env.maxX) / 2.0, (env.minY + env.maxY) / 2.0, 0.0)
    val pos = Constructive.pointOnSurface(g)
    if (!pos.isEmpty) cell(pos.x, pos.y, 0.0)
    var gx = env.minX
    while (gx < env.maxX) {
      var gy = env.minY
      while (gy < env.maxY) {
        pq.enqueue(cell(gx + half0, gy + half0, half0))
        gy += cellSize
      }
      gx += cellSize
    }
    var go = true
    while (go && pq.nonEmpty) {
      val c = pq.dequeue()
      if (c.pot - best.d <= tol) go = false
      else {
        val nh = c.half / 2.0
        pq.enqueue(cell(c.x - nh, c.y - nh, nh))
        pq.enqueue(cell(c.x + nh, c.y - nh, nh))
        pq.enqueue(cell(c.x - nh, c.y + nh, nh))
        pq.enqueue(cell(c.x + nh, c.y + nh, nh))
      }
    }
    val center = Point(best.x, best.y)
    if (best.d <= 0.0) return LineString(Array(best.x, best.y, best.x, best.y))
    shortestLine(center, bnd) match {
      case l: LineString if l.xy.length >= 4 => l
      case _ => LineString(Array(best.x, best.y, best.x, best.y))
    }
  }

  /** Minimum-area rotated rectangle of the convex hull (shapely
    * oriented_envelope / minimum_rotated_rectangle): one candidate
    * rectangle per hull edge, aligned to it. Degenerate inputs (point,
    * collinear) return the hull itself, matching GEOS.
    */
  def orientedEnvelope(g: Geometry): Geometry = {
    Constructive.convexHull(g) match {
      case hull: Polygon =>
        val ring = hull.shell
        val n = ring.length / 2 - 1 // closed ring
        if (n < 3) return hull
        var bestArea = Double.PositiveInfinity
        var best: Array[Double] = null
        var e = 0
        while (e < n) {
          val ex = ring(2 * ((e + 1) % n)) - ring(2 * e)
          val ey = ring(2 * ((e + 1) % n) + 1) - ring(2 * e + 1)
          val len = math.hypot(ex, ey)
          if (len > 0) {
            val ux = ex / len; val uy = ey / len // edge direction
            var minU = Double.PositiveInfinity; var maxU = Double.NegativeInfinity
            var minV = Double.PositiveInfinity; var maxV = Double.NegativeInfinity
            var i = 0
            while (i < n) {
              val u = ring(2 * i) * ux + ring(2 * i + 1) * uy
              val v = -ring(2 * i) * uy + ring(2 * i + 1) * ux
              if (u < minU) minU = u
              if (u > maxU) maxU = u
              if (v < minV) minV = v
              if (v > maxV) maxV = v
              i += 1
            }
            val area = (maxU - minU) * (maxV - minV)
            if (area < bestArea) {
              bestArea = area
              // corners back in world space: p = u*dir + v*normal
              @inline def corner(u: Double, v: Double): (Double, Double) =
                (u * ux - v * uy, u * uy + v * ux)
              val c1 = corner(minU, minV); val c2 = corner(maxU, minV)
              val c3 = corner(maxU, maxV); val c4 = corner(minU, maxV)
              best = Array(c1._1, c1._2, c2._1, c2._2, c3._1, c3._2,
                c4._1, c4._2, c1._1, c1._2)
            }
          }
          e += 1
        }
        if (best == null) hull else Polygon(best)
      case degenerate => degenerate
    }
  }

  /** The shortest connecting line between two geometries (shapely
    * shortest_line): a two-point LineString from the nearest point on `a`
    * to the nearest point on `b`. Intersecting inputs yield a zero-length
    * line at a shared point. Empty input yields an empty LineString.
    */
  def shortestLine(a: Geometry, b: Geometry): Geometry = {
    if (a.isEmpty || b.isEmpty) return LineString(Array.empty[Double])
    var bd = Double.PositiveInfinity
    var bax = 0.0; var bay = 0.0; var bbx = 0.0; var bby = 0.0
    def consider(d: Double, ax: Double, ay: Double, bx: Double, by: Double): Unit =
      if (d < bd) { bd = d; bax = ax; bay = ay; bbx = bx; bby = by }
    // closest point on segment (x1,y1)-(x2,y2) to p
    def onSeg(px: Double, py: Double, x1: Double, y1: Double,
        x2: Double, y2: Double): (Double, Double) = {
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      if (len2 == 0) return (x1, y1)
      var t = ((px - x1) * dx + (py - y1) * dy) / len2
      if (t < 0) t = 0 else if (t > 1) t = 1
      (x1 + t * dx, y1 + t * dy)
    }
    def pathsOf(g: Geometry): Seq[Array[Double]] = g match {
      case p: Point => Seq(Array(p.x, p.y))
      case l: LineString => Seq(l.xy)
      case p: Polygon => p.rings.toSeq
      case m: MultiPoint => m.pts.toSeq.map(p => Array(p.x, p.y))
      case m: MultiLineString => m.lines.toSeq.map(_.xy)
      case m: MultiPolygon => m.polys.toSeq.flatMap(_.rings)
      case c: GeometryCollection => c.geoms.toSeq.flatMap(pathsOf)
    }
    // interior containment: a point of one inside the other's polygon area
    def interiorHit(outer: Geometry, inner: Geometry): Boolean = outer match {
      case _: Polygon | _: MultiPolygon | _: GeometryCollection =>
        var hit = false
        inner.foreachCoord((x, y) =>
          if (!hit && Predicates.locate(x, y, outer) > Predicates.OUT) {
            consider(0.0, x, y, x, y); hit = true
          })
        hit
      case _ => false
    }
    if (!interiorHit(a, b) && !interiorHit(b, a)) {
      for (pa <- pathsOf(a); pb <- pathsOf(b)) {
        // vertex of a vs segments of b and vice versa; proper segment
        // crossings contribute the crossing point
        var i = 0
        while (i < pa.length) {
          if (pb.length == 2) {
            val d = math.hypot(pa(i) - pb(0), pa(i + 1) - pb(1))
            consider(d, pa(i), pa(i + 1), pb(0), pb(1))
          } else {
            var j = 0
            while (j + 3 < pb.length) {
              val (qx, qy) = onSeg(pa(i), pa(i + 1), pb(j), pb(j + 1), pb(j + 2), pb(j + 3))
              consider(math.hypot(pa(i) - qx, pa(i + 1) - qy), pa(i), pa(i + 1), qx, qy)
              j += 2
            }
          }
          i += 2
        }
        var j = 0
        while (j < pb.length) {
          if (pa.length == 2) {
            val d = math.hypot(pb(j) - pa(0), pb(j + 1) - pa(1))
            consider(d, pa(0), pa(1), pb(j), pb(j + 1))
          } else {
            var i2 = 0
            while (i2 + 3 < pa.length) {
              val (qx, qy) = onSeg(pb(j), pb(j + 1), pa(i2), pa(i2 + 1), pa(i2 + 2), pa(i2 + 3))
              consider(math.hypot(pb(j) - qx, pb(j + 1) - qy), qx, qy, pb(j), pb(j + 1))
              i2 += 2
            }
          }
          j += 2
        }
        // proper crossings: zero-length result at the intersection point
        if (bd > 0 && pa.length >= 4 && pb.length >= 4) {
          var i3 = 0
          while (i3 + 3 < pa.length && bd > 0) {
            var j3 = 0
            while (j3 + 3 < pb.length && bd > 0) {
              if (Predicates.segmentsIntersect(
                  pa(i3), pa(i3 + 1), pa(i3 + 2), pa(i3 + 3),
                  pb(j3), pb(j3 + 1), pb(j3 + 2), pb(j3 + 3))) {
                val (ix, iy) = segCross(pa(i3), pa(i3 + 1), pa(i3 + 2), pa(i3 + 3),
                  pb(j3), pb(j3 + 1), pb(j3 + 2), pb(j3 + 3))
                consider(0.0, ix, iy, ix, iy)
              }
              j3 += 2
            }
            i3 += 2
          }
        }
      }
    }
    LineString(Array(bax, bay, bbx, bby))
  }

  /** Intersection point of two segments known to intersect (midpoint of the
    * overlap for collinear contact).
    */
  private def segCross(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
      bx1: Double, by1: Double, bx2: Double, by2: Double): (Double, Double) = {
    val d = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
    if (d != 0) {
      val t = ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / d
      (ax1 + t * (ax2 - ax1), ay1 + t * (ay2 - ay1))
    } else {
      // collinear: any shared endpoint, else segment-a endpoint on b
      if (Measures.pointToSegment(ax1, ay1, bx1, by1, bx2, by2) == 0) (ax1, ay1)
      else (ax2, ay2)
    }
  }

  /** Merge the lines of a (Multi)LineString at nodes where exactly two line
    * ends meet (GEOS LineMerger). Exact endpoint coordinate match, like
    * GEOS. Returns a LineString when everything merges to one chain, else a
    * MultiLineString.
    */
  def lineMerge(g: Geometry): Geometry = {
    val lines: Array[LineString] = g match {
      case l: LineString => return l // already one chain
      case m: MultiLineString => m.lines.filter(!_.isEmpty)
      case c: GeometryCollection =>
        c.geoms.collect { case l: LineString if !l.isEmpty => l }
      case other => return other // lineMerge of non-lineal input: unchanged
    }
    if (lines.isEmpty) return MultiLineString(Array.empty)
    final case class End(line: Int, atStart: Boolean)
    val nodeOf = mutable.LinkedHashMap.empty[(Double, Double), mutable.ArrayBuffer[End]]
    def endpoint(l: LineString, start: Boolean): (Double, Double) =
      if (start) (l.x(0), l.y(0)) else (l.x(l.size - 1), l.y(l.size - 1))
    lines.zipWithIndex.foreach { case (l, i) =>
      nodeOf.getOrElseUpdate(endpoint(l, start = true), mutable.ArrayBuffer.empty) +=
        End(i, atStart = true)
      nodeOf.getOrElseUpdate(endpoint(l, start = false), mutable.ArrayBuffer.empty) +=
        End(i, atStart = false)
    }
    val used = new Array[Boolean](lines.length)
    val merged = mutable.ArrayBuffer.empty[LineString]

    // walk a maximal chain starting by consuming `e`'s line away from `from`
    def walk(first: End): Array[Double] = {
      val acc = mutable.ArrayBuilder.make[Double]
      var e = first
      var firstLine = true
      var continue = true
      while (continue) {
        val l = lines(e.line)
        used(e.line) = true
        // traverse the line from the entry end to the far end
        val xy = if (e.atStart) l.xy else reverseRing(l.xy)
        val from = if (firstLine) 0 else 2 // skip duplicated junction vertex
        var i = from
        while (i < xy.length) { acc += xy(i); i += 1 }
        firstLine = false
        val far = (xy(xy.length - 2), xy(xy.length - 1))
        val incident = nodeOf(far)
        if (incident.length == 2) {
          val next = incident.find(x => !used(x.line))
          if (next.isDefined) e = next.get else continue = false
        } else continue = false
      }
      acc.result()
    }

    // chains must START at nodes of degree != 2 (or where the mate is used)
    for ((_, ends) <- nodeOf; if ends.length != 2; e <- ends; if !used(e.line))
      merged += LineString(walk(e))
    // leftover pure cycles: every node degree 2
    lines.indices.foreach { i =>
      if (!used(i)) merged += LineString(walk(End(i, atStart = true)))
    }
    if (merged.length == 1) merged(0) else MultiLineString(merged.toArray)
  }

  // ------------------------------------------------------------- delaunay

  /** Delaunay triangulation of the unique vertices (shapely
    * delaunay_triangles): Bowyer–Watson incremental insertion. Returns a
    * GeometryCollection of triangle Polygons (empty for fewer than 3
    * non-collinear vertices). Triangle order is deterministic but not
    * GEOS's — compare as sets or by aggregate measures.
    */
  def delaunayTriangles(g: Geometry): Geometry = {
    val pts = uniqueVertices(g)
    if (pts.length < 3) return GeometryCollection(Array.empty)
    val out = delaunayIndexed(pts).toArray.flatMap { case (a, b, c) =>
      val (ax, ay) = pts(a); val (bx, by) = pts(b); val (cx, cy) = pts(c)
      val orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      if (orient == 0) None // degenerate sliver
      else if (orient > 0)
        Some(Polygon(Array(ax, ay, bx, by, cx, cy, ax, ay)))
      else Some(Polygon(Array(ax, ay, cx, cy, bx, by, ax, ay)))
    }
    GeometryCollection(out.toArray[Geometry])
  }

  private def uniqueVertices(g: Geometry): Array[(Double, Double)] = {
    val seen = mutable.LinkedHashSet.empty[(Double, Double)]
    g.foreachCoord((x, y) => seen += ((x, y)))
    seen.toArray
  }

  /** Bowyer–Watson core over unique points; returns vertex-index triangles
    * (super-triangle artifacts removed, degenerate slivers kept for the
    * callers that filter them).
    */
  private def delaunayIndexed(
      pts: Array[(Double, Double)]): mutable.ArrayBuffer[(Int, Int, Int)] = {
    // super-triangle comfortably containing every point
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    pts.foreach { case (x, y) =>
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
    }
    val dmax = math.max(maxX - minX, maxY - minY) max 1.0
    val mx = (minX + maxX) / 2; val my = (minY + maxY) / 2
    val s1 = (mx - 20 * dmax, my - 10 * dmax)
    val s2 = (mx + 20 * dmax, my - 10 * dmax)
    val s3 = (mx, my + 20 * dmax)
    val all = pts ++ Array(s1, s2, s3)
    val n = pts.length

    var tris = mutable.ArrayBuffer((n, n + 1, n + 2))

    @inline def inCircumcircle(t: (Int, Int, Int), px: Double, py: Double): Boolean = {
      val (ax, ay) = all(t._1); val (bx, by) = all(t._2); val (cx, cy) = all(t._3)
      val adx = ax - px; val ady = ay - py
      val bdx = bx - px; val bdy = by - py
      val cdx = cx - px; val cdy = cy - py
      val ad = adx * adx + ady * ady
      val bd = bdx * bdx + bdy * bdy
      val cd = cdx * cdx + cdy * cdy
      val det = adx * (bdy * cd - bd * cdy) -
        ady * (bdx * cd - bd * cdx) +
        ad * (bdx * cdy - bdy * cdx)
      // sign depends on orientation; normalize by the triangle's orientation
      val orient = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      if (orient > 0) det > 0 else det < 0
    }

    var i = 0
    while (i < n) {
      val (px, py) = pts(i)
      val bad = tris.filter(inCircumcircle(_, px, py))
      if (bad.nonEmpty) {
        // boundary of the cavity: edges appearing exactly once among bad tris
        val edgeCount = mutable.LinkedHashMap.empty[(Int, Int), Int]
        def addEdge(u: Int, v: Int): Unit = {
          val k = if (u < v) (u, v) else (v, u)
          edgeCount(k) = edgeCount.getOrElse(k, 0) + 1
        }
        bad.foreach { t => addEdge(t._1, t._2); addEdge(t._2, t._3); addEdge(t._3, t._1) }
        tris = tris.filterNot(inCircumcircle(_, px, py))
        edgeCount.foreach { case ((u, v), cnt) =>
          if (cnt == 1) tris += ((u, v, i))
        }
      }
      i += 1
    }

    tris.filter(t => t._1 < n && t._2 < n && t._3 < n)
  }

  // --------------------------------------------------------- concaveHull

  /** Concave hull of the unique vertices (shapely 2.1 concave_hull):
    * chi-shape erosion over the Delaunay triangulation (Duckham et al.
    * 2008, the public algorithm GEOS's ConcaveHull is built from). Border
    * edges longer than `minEdge + ratio * (maxEdge - minEdge)` are eroded
    * longest-first when the opposite vertex is not already on the boundary
    * (which guarantees the result stays one simple polygon). ratio=1 is the
    * convex hull; ratio=0 erodes down to the shortest-edge scale. The exact
    * erosion sequence differs from GEOS's area-based variant; containment
    * of all input points and the ratio=1 == convex-hull identity hold for
    * both.
    */
  def concaveHull(g: Geometry, ratio: Double): Geometry = {
    require(ratio >= 0 && ratio <= 1, s"concave_hull: ratio $ratio outside [0,1]")
    val pts = uniqueVertices(g)
    val tris0 = if (pts.length < 3) mutable.ArrayBuffer.empty[(Int, Int, Int)]
      else delaunayIndexed(pts)
    val tris = tris0.filter { case (a, b, c) =>
      val (ax, ay) = pts(a); val (bx, by) = pts(b); val (cx, cy) = pts(c)
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) != 0
    }
    if (tris.isEmpty) return Constructive.convexHull(g)

    @inline def key(u: Int, v: Int): (Int, Int) = if (u < v) (u, v) else (v, u)
    @inline def len(e: (Int, Int)): Double = {
      val (ax, ay) = pts(e._1); val (bx, by) = pts(e._2)
      math.hypot(bx - ax, by - ay)
    }
    // edge -> alive triangle indices
    val edgeTris = mutable.LinkedHashMap.empty[(Int, Int), mutable.ArrayBuffer[Int]]
    tris.zipWithIndex.foreach { case ((a, b, c), ti) =>
      Seq(key(a, b), key(b, c), key(c, a)).foreach { e =>
        edgeTris.getOrElseUpdate(e, mutable.ArrayBuffer.empty) += ti
      }
    }
    var minL = Double.PositiveInfinity; var maxL = 0.0
    edgeTris.keys.foreach { e =>
      val l = len(e)
      if (l < minL) minL = l
      if (l > maxL) maxL = l
    }
    val threshold = minL + ratio * (maxL - minL)

    val alive = Array.fill(tris.length)(true)
    val boundary = mutable.LinkedHashSet.empty[(Int, Int)]
    edgeTris.foreach { case (e, ts) => if (ts.length == 1) boundary += e }
    val onBoundary = mutable.HashSet.empty[Int]
    boundary.foreach { e => onBoundary += e._1; onBoundary += e._2 }

    val pq = mutable.PriorityQueue.empty[((Int, Int), Double)](Ordering.by(_._2))
    boundary.foreach(e => pq.enqueue((e, len(e))))
    while (pq.nonEmpty) {
      val (e, l) = pq.dequeue()
      if (l > threshold && boundary.contains(e)) {
        val ts = edgeTris(e).filter(alive(_))
        if (ts.length == 1) {
          val ti = ts(0)
          val (a, b, c) = tris(ti)
          val opp = if (a != e._1 && a != e._2) a else if (b != e._1 && b != e._2) b else c
          if (!onBoundary.contains(opp)) {
            alive(ti) = false
            boundary -= e
            val e1 = key(e._1, opp); val e2 = key(e._2, opp)
            Seq(e1, e2).foreach { ne =>
              boundary += ne
              pq.enqueue((ne, len(ne)))
            }
            onBoundary += opp
          }
        }
      }
    }

    // trace the boundary cycle (each vertex has exactly two boundary edges)
    val nbr = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    boundary.foreach { case (u, v) =>
      nbr.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v
      nbr.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += u
    }
    val start = nbr.keys.min
    val ring = mutable.ArrayBuilder.make[Double]
    var prev = -1
    var cur = start
    var guard = 0
    do {
      val (x, y) = pts(cur)
      ring += x += y
      val ns = nbr(cur)
      val next = if (ns(0) != prev) ns(0) else ns(1)
      prev = cur; cur = next
      guard += 1
    } while (cur != start && guard <= boundary.size + 1)
    val (sx, sy) = pts(start)
    ring += sx += sy
    val closed = ring.result()
    if (Measures.signedRingArea(closed) < 0) Polygon(reverseRing(closed))
    else Polygon(closed)
  }

  // ----------------------------------------------------- voronoiPolygons

  /** Voronoi diagram of the unique vertices (shapely voronoi_polygons):
    * one convex cell per site, computed by half-plane intersection against
    * every other site and clipped to the site envelope expanded on each
    * side by its larger dimension (the GEOS default-extent analog; pass
    * `extendTo` to widen it further). Cells are returned in first-seen site
    * order — GEOS's triangulation order differs; compare per-site or by
    * measure, not positionally.
    */
  def voronoiPolygons(g: Geometry, extendTo: Envelope = null): Geometry = {
    val sites = uniqueVertices(g)
    if (sites.isEmpty) return GeometryCollection(Array.empty)
    require(sites.length <= 4096,
      s"voronoi: ${sites.length} sites exceeds the 4096 guard")
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    sites.foreach { case (x, y) =>
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
    }
    val m = math.max(maxX - minX, maxY - minY) max 1.0
    var clip = Envelope(minX - m, minY - m, maxX + m, maxY + m)
    if (extendTo != null) clip = clip.union(extendTo)

    val cells = sites.map { case (sx, sy) =>
      var poly: Array[Double] = Array(
        clip.minX, clip.minY, clip.maxX, clip.minY,
        clip.maxX, clip.maxY, clip.minX, clip.maxY, clip.minX, clip.minY)
      var j = 0
      while (j < sites.length && poly.length >= 8) {
        val (ox, oy) = sites(j)
        if (ox != sx || oy != sy) {
          // keep the side closer to (sx, sy): a*x + b*y <= c
          val a = ox - sx; val b = oy - sy
          val c = a * (sx + ox) / 2 + b * (sy + oy) / 2
          poly = clipHalfPlane(poly, a, b, c)
        }
        j += 1
      }
      Polygon(poly): Geometry
    }
    GeometryCollection(cells)
  }

  /** Sutherland–Hodgman clip of a closed ring against a*x + b*y <= c. */
  private def clipHalfPlane(ring: Array[Double], a: Double, b: Double,
      c: Double): Array[Double] = {
    val n = ring.length / 2 - 1 // drop closing duplicate
    if (n < 3) return Array.empty
    val out = mutable.ArrayBuilder.make[Double]
    var count = 0
    var i = 0
    while (i < n) {
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val j = (i + 1) % n
      val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
      val d1 = a * x1 + b * y1 - c
      val d2 = a * x2 + b * y2 - c
      if (d1 <= 0) { out += x1 += y1; count += 1 }
      if ((d1 < 0 && d2 > 0) || (d1 > 0 && d2 < 0)) {
        val t = d1 / (d1 - d2)
        out += x1 + t * (x2 - x1) += y1 + t * (y2 - y1)
        count += 1
      }
      i += 1
    }
    if (count < 3) return Array.empty
    val body = out.result()
    body ++ Array(body(0), body(1))
  }

  // ------------------------------------------------------------- frechet

  /** Discrete Fréchet distance over the vertex sequences (shapely
    * frechet_distance without densify): standard O(n·m) dynamic program.
    * Multi-part inputs use the concatenated vertex sequence of each side.
    */
  def frechetDistance(a: Geometry, b: Geometry): Double = {
    val pa = verticesOf(a); val pb = verticesOf(b)
    if (pa.isEmpty || pb.isEmpty) return Double.NaN
    val n = pa.length / 2; val m = pb.length / 2
    require(n.toLong * m <= 4_000_000L,
      s"frechet: vertex product $n x $m exceeds the 4M guard")
    val ca = new Array[Double](n * m)
    @inline def d(i: Int, j: Int): Double =
      math.hypot(pa(2 * i) - pb(2 * j), pa(2 * i + 1) - pb(2 * j + 1))
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        val dij = d(i, j)
        val prev =
          if (i == 0 && j == 0) 0.0
          else if (i == 0) ca((j - 1))
          else if (j == 0) ca((i - 1) * m)
          else math.min(ca((i - 1) * m + j),
            math.min(ca((i - 1) * m + (j - 1)), ca(i * m + (j - 1))))
        ca(i * m + j) = math.max(prev, dij)
        j += 1
      }
      i += 1
    }
    ca(n * m - 1)
  }

  private def verticesOf(g: Geometry): Array[Double] = {
    val b = mutable.ArrayBuilder.make[Double]
    g.foreachCoord((x, y) => b += x += y)
    b.result()
  }

  // --------------------------------------------------------- offsetCurve

  /** Parallel offset of a line at signed distance (shapely offset_curve):
    * positive = left of the direction of travel, like GEOS. Joins are
    * MITERED (GEOS's default is round; mitered join is the documented
    * deviation — identical results on single-segment lines, and within the
    * miter limit of GEOS's `join_style="mitre"` mode elsewhere). Negative
    * distance offsets right; GEOS keeps the original direction, so do we.
    */
  def offsetCurve(g: Geometry, dist: Double): Geometry = g match {
    case l: LineString =>
      if (l.isEmpty || l.size < 2 || dist == 0.0) l
      else LineString(offsetPath(l.xy, dist))
    case m: MultiLineString =>
      MultiLineString(m.lines.map(l =>
        offsetCurve(l, dist).asInstanceOf[LineString]))
    case other => throw new IllegalArgumentException(
      s"offset_curve requires lineal input, got ${other.geometryType}")
  }

  private def offsetPath(xy: Array[Double], dist: Double): Array[Double] = {
    val nSeg = xy.length / 2 - 1
    // per-segment unit normals (left side)
    val nx = new Array[Double](nSeg); val ny = new Array[Double](nSeg)
    var i = 0
    while (i < nSeg) {
      val dx = xy(2 * i + 2) - xy(2 * i); val dy = xy(2 * i + 3) - xy(2 * i + 1)
      val len = math.hypot(dx, dy)
      if (len == 0) { nx(i) = Double.NaN; ny(i) = Double.NaN }
      else { nx(i) = -dy / len; ny(i) = dx / len }
      i += 1
    }
    val out = mutable.ArrayBuilder.make[Double]
    // first point
    var s0 = 0
    while (s0 < nSeg && nx(s0).isNaN) s0 += 1
    if (s0 == nSeg) return xy.clone() // all-degenerate path
    out += xy(0) + dist * nx(s0) += xy(1) + dist * ny(s0)
    i = 1
    while (i < xy.length / 2 - 1) {
      // join at interior vertex i between segment i-1 and i (skip degenerates)
      var p = i - 1; while (p >= 0 && nx(p).isNaN) p -= 1
      var q = i; while (q < nSeg && nx(q).isNaN) q += 1
      if (p >= 0 && q < nSeg) {
        val sumX = nx(p) + nx(q); val sumY = ny(p) + ny(q)
        val denom = sumX * sumX + sumY * sumY
        if (denom > 1e-24) {
          // miter: along the angle bisector, scaled so both offsets meet
          val scale = 2 * dist / denom
          out += xy(2 * i) + scale * sumX += xy(2 * i + 1) + scale * sumY
        } else {
          // 180-degree reversal: square off with both raw offsets
          out += xy(2 * i) + dist * nx(p) += xy(2 * i + 1) + dist * ny(p)
          out += xy(2 * i) + dist * nx(q) += xy(2 * i + 1) + dist * ny(q)
        }
      }
      i += 1
    }
    var sL = nSeg - 1
    while (sL >= 0 && nx(sL).isNaN) sL -= 1
    out += xy(xy.length - 2) + dist * nx(sL) += xy(xy.length - 1) + dist * ny(sL)
    out.result()
  }

  // -------------------------------------------------------- samplePoints

  /** Deterministic uniform random points inside a polygonal geometry
    * (geopandas sample_points(size, rng=seed)): rejection sampling from the
    * envelope driven by a splitmix64 stream seeded with (seed, attempt).
    * Same (geometry, size, seed) always yields the same MultiPoint — the
    * reproducibility a distributed engine needs (geopandas gets it from the
    * numpy Generator; we derive it from the seed alone so the result is
    * partition-layout-independent).
    */
  def samplePoints(g: Geometry, size: Int, seed: Long): Geometry = {
    require(size >= 0, s"sample_points: negative size $size")
    val e = g.envelope
    if (e.isEmpty || size == 0 || Measures.area(g) == 0.0)
      return MultiPoint(Array.empty)
    val out = new Array[Point](size)
    var found = 0
    var attempt = 0L
    val maxAttempts = 10_000L * size
    while (found < size && attempt < maxAttempts) {
      val r1 = splitmix64(seed ^ (attempt * 2 + 1))
      val r2 = splitmix64(seed ^ (attempt * 2 + 2))
      val x = e.minX + (e.maxX - e.minX) * toUnit(r1)
      val y = e.minY + (e.maxY - e.minY) * toUnit(r2)
      if (Predicates.locate(x, y, g) == Predicates.IN) {
        out(found) = Point(x, y)
        found += 1
      }
      attempt += 1
    }
    MultiPoint(out.take(found))
  }

  // ---------------------------------------------------------------- isCcw

  /** shapely is_ccw: true iff a closed ring (>= 4 points) winds
    * counterclockwise. Non-closed lines and non-lineal geometries are false.
    */
  def isCcw(g: Geometry): Boolean = g match {
    case l: LineString => l.isRing && Measures.signedRingArea(l.xy) > 0
    case _             => false
  }

  // ------------------------------------------------------------- normalize

  /** Canonical form (GEOS Normalize / shapely normalize): polygon shells
    * clockwise and holes counterclockwise, every ring rotated to start at
    * its lexicographically smallest vertex, holes sorted ascending, lines
    * directed so the start point is not greater than the end point (closed
    * lines rotate to their smallest vertex and wind counterclockwise), and
    * multi-part components sorted in GEOS's descending order.
    */
  def normalize(g: Geometry): Geometry = g match {
    case p: Point => p
    case l: LineString => normLine(l)
    case p: Polygon => normPolygon(p)
    case m: MultiPoint =>
      MultiPoint(sortDesc(m.pts.map(p => p: Geometry)).map(_.asInstanceOf[Point]))
    case m: MultiLineString =>
      MultiLineString(sortDesc(m.lines.map(normLine(_): Geometry))
        .map(_.asInstanceOf[LineString]))
    case m: MultiPolygon =>
      MultiPolygon(sortDesc(m.polys.map(normPolygon(_): Geometry))
        .map(_.asInstanceOf[Polygon]))
    case c: GeometryCollection =>
      GeometryCollection(sortDesc(c.geoms.map(normalize)))
  }

  private def normLine(l: LineString): LineString = {
    if (l.isEmpty) return l
    if (l.isRing) {
      val opened = l.xy.dropRight(2)
      val rot = rotateToMin(opened)
      val closed = rot ++ Array(rot(0), rot(1))
      LineString(if (Measures.signedRingArea(closed) < 0) reverseRing(closed) else closed)
    } else if (compareCoords(l.xy, reverseRing(l.xy)) > 0) reverseLine(l)
    else l
  }

  private def normPolygon(p: Polygon): Polygon = {
    if (p.isEmpty) return p
    def normRing(ring: Array[Double], cw: Boolean): Array[Double] = {
      val opened = ring.dropRight(2)
      val rot = rotateToMin(opened)
      val closed = rot ++ Array(rot(0), rot(1))
      val ccw = Measures.signedRingArea(closed) > 0
      if (ccw == cw) reverseRing(closed) else closed
    }
    val shell = normRing(p.rings(0), cw = true)
    val holes = p.rings.drop(1).map(normRing(_, cw = false))
      .sortWith(compareCoords(_, _) < 0)
    Polygon(shell +: holes)
  }

  /** Rotate an OPEN ring to start at the lexicographically smallest vertex. */
  private def rotateToMin(xy: Array[Double]): Array[Double] = {
    val n = xy.length / 2
    var best = 0
    var i = 1
    while (i < n) {
      val c = java.lang.Double.compare(xy(2 * i), xy(2 * best)) match {
        case 0 => java.lang.Double.compare(xy(2 * i + 1), xy(2 * best + 1))
        case d => d
      }
      if (c < 0) best = i
      i += 1
    }
    if (best == 0) xy
    else {
      val out = new Array[Double](xy.length)
      i = 0
      while (i < n) {
        val src = (best + i) % n
        out(2 * i) = xy(2 * src); out(2 * i + 1) = xy(2 * src + 1)
        i += 1
      }
      out
    }
  }

  private def compareCoords(a: Array[Double], b: Array[Double]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Double.compare(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def coordsOf(g: Geometry): Array[Double] = {
    val b = mutable.ArrayBuilder.make[Double]
    g.foreachCoord((x, y) => b += x += y)
    b.result()
  }

  /** GEOS GeometryCollection::normalize component order (descending). */
  private def sortDesc(gs: Array[Geometry]): Array[Geometry] =
    gs.sortWith((a, b) => compareCoords(coordsOf(a), coordsOf(b)) > 0)

  // ------------------------------------------------------------------ snap

  /** Snap vertices of `src` to `tgt` within `tol` (GEOS snap, JTS
    * GeometrySnapper semantics): every source vertex moves to the nearest
    * target vertex within tolerance; target vertices within tolerance of a
    * source segment (and not already present) are inserted into it.
    */
  def snap(src: Geometry, tgt: Geometry, tol: Double): Geometry = {
    require(tol >= 0, s"snap: negative tolerance $tol")
    if (tol == 0) return src
    val sp = coordsOf(tgt)
    if (sp.isEmpty) return src
    src match {
      case p: Point =>
        if (p.isEmpty) p
        else {
          val (nx, ny, d) = nearestSnapPoint(p.x, p.y, sp)
          if (d <= tol) Point(nx, ny) else p
        }
      case l: LineString => LineString(snapPath(l.xy, sp, tol))
      case p: Polygon => Polygon(p.rings.map(snapPath(_, sp, tol)))
      case m: MultiPoint =>
        MultiPoint(m.pts.map(p => snap(p, tgt, tol).asInstanceOf[Point]))
      case m: MultiLineString =>
        MultiLineString(m.lines.map(l => LineString(snapPath(l.xy, sp, tol))))
      case m: MultiPolygon =>
        MultiPolygon(m.polys.map(p => Polygon(p.rings.map(snapPath(_, sp, tol)))))
      case c: GeometryCollection =>
        GeometryCollection(c.geoms.map(snap(_, tgt, tol)))
    }
  }

  private def nearestSnapPoint(x: Double, y: Double,
      sp: Array[Double]): (Double, Double, Double) = {
    var bd = Double.PositiveInfinity; var bx = x; var by = y
    var i = 0
    while (i < sp.length) {
      val d = math.hypot(sp(i) - x, sp(i + 1) - y)
      if (d < bd) { bd = d; bx = sp(i); by = sp(i + 1) }
      i += 2
    }
    (bx, by, bd)
  }

  private def snapPath(xy: Array[Double], sp: Array[Double],
      tol: Double): Array[Double] = {
    val n = xy.length / 2
    // phase 1: vertex snap
    val snapped = new Array[Double](xy.length)
    var i = 0
    while (i < n) {
      val (nx, ny, d) = nearestSnapPoint(xy(2 * i), xy(2 * i + 1), sp)
      if (d <= tol) { snapped(2 * i) = nx; snapped(2 * i + 1) = ny }
      else { snapped(2 * i) = xy(2 * i); snapped(2 * i + 1) = xy(2 * i + 1) }
      i += 1
    }
    // phase 2: insert target vertices lying within tol of a segment
    val out = mutable.ArrayBuilder.make[Double]
    i = 0
    while (i < n - 1) {
      val ax = snapped(2 * i); val ay = snapped(2 * i + 1)
      val bx = snapped(2 * i + 2); val by = snapped(2 * i + 3)
      out += ax += ay
      // candidates: (t, x, y) of snap points projecting strictly inside
      val ins = mutable.ArrayBuffer.empty[(Double, Double, Double)]
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      if (len2 > 0) {
        var j = 0
        while (j < sp.length) {
          val px = sp(j); val py = sp(j + 1)
          if (!(px == ax && py == ay) && !(px == bx && py == by)) {
            val t = ((px - ax) * dx + (py - ay) * dy) / len2
            if (t > 0 && t < 1) {
              val qx = ax + t * dx; val qy = ay + t * dy
              if (math.hypot(px - qx, py - qy) <= tol) ins += ((t, px, py))
            }
          }
          j += 2
        }
      }
      ins.sortBy(_._1).foreach { case (_, px, py) => out += px += py }
      i += 1
    }
    out += snapped(2 * n - 2) += snapped(2 * n - 1)
    out.result()
  }

  // ----------------------------------------------------- minimumClearance

  /** shapely minimum_clearance (JTS MinimumClearance): the smallest distance
    * by which a vertex could be moved to produce an invalid geometry — the
    * minimum over (a) distances between distinct vertex positions and
    * (b) distances from each vertex to each segment not incident to it.
    * Infinity when no such distance exists (points, single segments).
    */
  def minimumClearance(g: Geometry): Double = {
    val xy = coordsOf(g)
    val n = xy.length / 2
    require(n <= 8192, s"minimum_clearance: $n vertices exceeds the 8192 guard")
    var best = Double.PositiveInfinity
    // (a) vertex-vertex over distinct positions
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = math.hypot(xy(2 * i) - xy(2 * j), xy(2 * i + 1) - xy(2 * j + 1))
        if (d > 0 && d < best) best = d
        j += 1
      }
      i += 1
    }
    // (b) vertex-segment for segments not incident to the vertex
    val segs = segmentsOf(g)
    i = 0
    while (i < n) {
      val px = xy(2 * i); val py = xy(2 * i + 1)
      var s = 0
      while (s < segs.length) {
        val ax = segs(s); val ay = segs(s + 1); val bx = segs(s + 2); val by = segs(s + 3)
        if (!(px == ax && py == ay) && !(px == bx && py == by)) {
          val d = pointSegDist(px, py, ax, ay, bx, by)
          if (d > 0 && d < best) best = d
        }
        s += 4
      }
      i += 1
    }
    best
  }

  private def segmentsOf(g: Geometry): Array[Double] = {
    val b = mutable.ArrayBuilder.make[Double]
    def path(xy: Array[Double]): Unit = {
      var i = 0
      while (i + 3 < xy.length) {
        b += xy(i) += xy(i + 1) += xy(i + 2) += xy(i + 3)
        i += 2
      }
    }
    def walk(g: Geometry): Unit = g match {
      case l: LineString => path(l.xy)
      case p: Polygon => p.rings.foreach(path)
      case m: MultiLineString => m.lines.foreach(walk)
      case m: MultiPolygon => m.polys.foreach(walk)
      case c: GeometryCollection => c.geoms.foreach(walk)
      case _ => ()
    }
    walk(g)
    b.result()
  }

  private def pointSegDist(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return math.hypot(px - ax, py - ay)
    val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    math.hypot(px - (ax + t * dx), py - (ay + t * dy))
  }

  // --------------------------------------------------------------- force3d

  /** shapely force_3d: give every coordinate a Z (constant fill for
    * coordinates without one). Polygon rings carry no Z in this model —
    * documented deviation: areal geometries pass through unchanged.
    */
  def force3d(g: Geometry, z: Double): Geometry = g match {
    case p: Point => if (p.isEmpty || p.hasZ) p else Point(p.x, p.y, z)
    case l: LineString =>
      if (l.zs != null) l else LineString(l.xy, Array.fill(l.size)(z))
    case m: MultiPoint =>
      MultiPoint(m.pts.map(p => force3d(p, z).asInstanceOf[Point]))
    case m: MultiLineString =>
      MultiLineString(m.lines.map(l => force3d(l, z).asInstanceOf[LineString]))
    case c: GeometryCollection => GeometryCollection(c.geoms.map(force3d(_, z)))
    case other => other // areal: rings are 2D in this model
  }

  // ----------------------------------------------------------- setPrecision

  /** shapely set_precision: snap every coordinate to the `grid` lattice
    * (round-half-away like GEOS's PrecisionModel), drop repeated points the
    * snap produced, and drop ring/line parts that collapse below their
    * minimum size. Self-intersections a snap can introduce are repaired via
    * makeValid for areal inputs (the GEOS default keep-valid policy).
    */
  def setPrecision(g: Geometry, grid: Double): Geometry = {
    require(grid > 0, s"set_precision: grid must be positive, got $grid")
    // GEOS PrecisionModel form: round against the inverse scale and divide,
    // which lands decimal grids on their representable doubles (1.2, not
    // 1.2000000000000002 from round(v/grid)*grid)
    val scale = 1.0 / grid
    @inline def snap(v: Double): Double = math.round(v * scale) / scale
    def snapPathDedup(xy: Array[Double]): Array[Double] = {
      val out = mutable.ArrayBuilder.make[Double]
      var px = Double.NaN; var py = Double.NaN
      var i = 0
      while (i < xy.length) {
        val x = snap(xy(i)); val y = snap(xy(i + 1))
        if (x != px || y != py) { out += x += y; px = x; py = y }
        i += 2
      }
      out.result()
    }
    g match {
      case p: Point => if (p.isEmpty) p else Point(snap(p.x), snap(p.y), p.z)
      case l: LineString =>
        val s = snapPathDedup(l.xy)
        if (s.length < 4) LineString(Array.empty) else LineString(s)
      case p: Polygon =>
        val rings = p.rings.flatMap { r =>
          val s = snapPathDedup(r)
          // re-close (first/last may have deduped apart) and size-check
          val closed =
            if (s.length >= 2 && (s(0) != s(s.length - 2) || s(1) != s(s.length - 1)))
              s ++ Array(s(0), s(1))
            else s
          if (closed.length < 8) None else Some(closed)
        }
        if (rings.isEmpty || rings(0).isEmpty) Polygon(Array.empty[Array[Double]])
        else Noding.makeValid(Polygon(rings)) match {
          case poly: Polygon => poly
          case other         => other
        }
      case m: MultiPoint =>
        MultiPoint(m.pts.map(p => setPrecision(p, grid).asInstanceOf[Point]))
      case m: MultiLineString =>
        MultiLineString(m.lines
          .map(l => setPrecision(l, grid).asInstanceOf[LineString])
          .filterNot(_.isEmpty))
      case m: MultiPolygon =>
        val ps = m.polys.map(p => setPrecision(p, grid)).filterNot(_.isEmpty)
        if (ps.forall(_.isInstanceOf[Polygon]))
          MultiPolygon(ps.map(_.asInstanceOf[Polygon]))
        else GeometryCollection(ps)
      case c: GeometryCollection =>
        GeometryCollection(c.geoms.map(setPrecision(_, grid)))
    }
  }

  // ------------------------------------------------------------ sharedPaths

  /** GEOS SharedPaths: GEOMETRYCOLLECTION(MULTILINESTRING same-direction,
    * MULTILINESTRING opposite-direction) of the collinear overlaps between
    * two lineal geometries. Overlap pieces are emitted per input segment
    * pair without cross-segment merging — identical coverage to GEOS on
    * noded inputs, where shared paths coincide segment-by-segment.
    */
  def sharedPaths(a: Geometry, b: Geometry): Geometry = {
    require(a.topoDim == 1 && b.topoDim == 1,
      s"shared_paths requires lineal inputs, got ${a.geometryType}/${b.geometryType}")
    val sa = segmentsOf(a); val sb = segmentsOf(b)
    val same = mutable.ArrayBuffer.empty[LineString]
    val opp = mutable.ArrayBuffer.empty[LineString]
    var i = 0
    while (i < sa.length) {
      val ax = sa(i); val ay = sa(i + 1); val bx = sa(i + 2); val by = sa(i + 3)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      if (len2 > 0) {
        val eps = 1e-9 * math.sqrt(len2)
        var j = 0
        while (j < sb.length) {
          val cx = sb(j); val cy = sb(j + 1); val ex = sb(j + 2); val ey = sb(j + 3)
          // both endpoints of B's segment on A's supporting line -> collinear
          val cr1 = dx * (cy - ay) - dy * (cx - ax)
          val cr2 = dx * (ey - ay) - dy * (ex - ax)
          if (math.abs(cr1) <= eps * math.hypot(dx, dy) &&
              math.abs(cr2) <= eps * math.hypot(dx, dy)) {
            val t1 = ((cx - ax) * dx + (cy - ay) * dy) / len2
            val t2 = ((ex - ax) * dx + (ey - ay) * dy) / len2
            val lo = math.max(0.0, math.min(t1, t2))
            val hi = math.min(1.0, math.max(t1, t2))
            if (hi - lo > 1e-12) {
              val piece = LineString(Array(
                ax + lo * dx, ay + lo * dy, ax + hi * dx, ay + hi * dy))
              if (t2 >= t1) same += piece else opp += piece
            }
          }
          j += 4
        }
      }
      i += 4
    }
    GeometryCollection(Array(
      MultiLineString(same.toArray), MultiLineString(opp.toArray)))
  }

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  @inline private def toUnit(r: Long): Double =
    (r >>> 11).toDouble / (1L << 53).toDouble
}
