package graft.geom

import scala.collection.mutable

/** Constrained polygon triangulation (PostGIS ST_TriangulatePolygon /
  * shapely 2.1 `triangulate_polygon`): ear clipping over a single vertex
  * loop produced by bridging each hole into the shell (the earcut
  * eliminate-holes construction: connect the hole's rightmost vertex to
  * a visible shell vertex found by a +x ray cast, splicing the hole into
  * the shell with the bridge edge doubled). Every triangle's interior
  * lies inside the polygon, triangles partition the area exactly, and a
  * polygon whose shell has n distinct vertices with h holes of m_i
  * vertices yields n + Σ(m_i + 2) − 2 triangles (each bridge adds two
  * vertices to the loop).
  *
  * Deterministic: holes are processed rightmost-first with coordinate
  * tie-breaks, and ears are clipped lowest-index-first, so output order
  * and geometry are bit-stable across runs and partition layouts.
  */
object Triangulate {

  /** Triangulate a (multi)polygon into a MultiPolygon of triangles.
    * Empty input → empty MultiPolygon; non-areal input throws.
    */
  def triangulatePolygon(g: Geometry): Geometry = g match {
    case p: Polygon if p.isEmpty => MultiPolygon(Array.empty)
    case p: Polygon => MultiPolygon(tri(p).toArray)
    case m: MultiPolygon => MultiPolygon(m.polys.flatMap(tri))
    case _ => throw new IllegalArgumentException(
      "st_triangulatepolygon expects a (multi)polygon input")
  }

  // ---- internals ----------------------------------------------------

  // vertex loop as growable parallel coords
  private def tri(p: Polygon): Seq[Polygon] = {
    // open each ring (drop the closing duplicate), orient shell CCW and
    // holes CW so the spliced loop stays consistently CCW
    def open(ring: Array[Double], wantCcw: Boolean): Array[Double] = {
      val ccw = Measures.signedRingArea(ring) > 0
      val o = if (ring.length >= 4 &&
          ring(0) == ring(ring.length - 2) && ring(1) == ring(ring.length - 1))
        ring.dropRight(2) else ring
      if (ccw == wantCcw) o
      else {
        val r = new Array[Double](o.length)
        var i = 0
        while (i < o.length) {
          r(i) = o(o.length - 2 - i); r(i + 1) = o(o.length - 1 - i); i += 2
        }
        r
      }
    }
    var loop = open(p.shell, wantCcw = true)
    val holes = (1 until p.rings.length).map(i => open(p.rings(i), wantCcw = false))
      .filter(_.length >= 6)
      // rightmost-first (max x, then max y) keeps every later ray cast
      // unobstructed by not-yet-spliced holes
      .sortBy { h =>
        var bx = Double.NegativeInfinity; var by = Double.NegativeInfinity
        var i = 0
        while (i < h.length) {
          if (h(i) > bx || (h(i) == bx && h(i + 1) > by)) { bx = h(i); by = h(i + 1) }
          i += 2
        }
        (-bx, -by)
      }
    holes.foreach { h => loop = splice(loop, h) }
    earClip(loop)
  }

  /** Bridge one hole into the loop: from the hole's rightmost vertex M
    * cast a ray toward +x, find the nearest loop edge it crosses, pick
    * the visible loop vertex (the crossed edge's right endpoint, unless a
    * reflex vertex sits inside triangle (M, I, P) — then the one of those
    * minimizing the angle to +x, ties by distance then index), and splice
    * `loop[0..P] + hole[M..M] + [M, P] + loop[P+1..]`.
    */
  private def splice(loop: Array[Double], hole: Array[Double]): Array[Double] = {
    val n = loop.length / 2
    // hole's rightmost vertex
    var mi = 0
    var i = 1
    while (i < hole.length / 2) {
      if (hole(2 * i) > hole(2 * mi) ||
        (hole(2 * i) == hole(2 * mi) && hole(2 * i + 1) > hole(2 * mi + 1))) mi = i
      i += 1
    }
    val mx = hole(2 * mi); val my = hole(2 * mi + 1)
    // nearest +x ray crossing over loop edges
    var bestX = Double.PositiveInfinity
    var bestEdge = -1
    i = 0
    while (i < n) {
      val j = (i + 1) % n
      val y0 = loop(2 * i + 1); val y1 = loop(2 * j + 1)
      if ((y0 > my) != (y1 > my) || y0 == my || y1 == my) {
        // x where the edge meets y = my (guard horizontal edges)
        if (y0 != y1) {
          val t = (my - y0) / (y1 - y0)
          if (t >= 0.0 && t <= 1.0) {
            val xInt = loop(2 * i) + t * (loop(2 * j) - loop(2 * i))
            if (xInt >= mx && xInt < bestX) { bestX = xInt; bestEdge = i }
          }
        }
      }
      i += 1
    }
    require(bestEdge >= 0, "triangulate: hole bridge ray found no shell edge")
    // candidate visible vertex: the crossed edge endpoint with larger x
    val e0 = bestEdge; val e1 = (bestEdge + 1) % n
    val p0 = if (loop(2 * e0) >= loop(2 * e1)) e0 else e1
    var pi = p0
    // reflex vertices inside the FIXED triangle (M, I, P0) steal
    // visibility (earcut's findHoleBridge rule)
    val ix = bestX; val iy = my
    val p0x = loop(2 * p0); val p0y = loop(2 * p0 + 1)
    def inTri(ax: Double, ay: Double, bx: Double, by: Double,
        cx: Double, cy: Double, px: Double, py: Double): Boolean = {
      val d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      val d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
      val d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
      (d1 >= 0 && d2 >= 0 && d3 >= 0) || (d1 <= 0 && d2 <= 0 && d3 <= 0)
    }
    var bestTan = Double.PositiveInfinity
    var bestD = Double.PositiveInfinity
    i = 0
    while (i < n) {
      if (i != p0) {
        val vx = loop(2 * i); val vy = loop(2 * i + 1)
        if (vx >= mx && vx <= math.max(ix, p0x) &&
            inTri(mx, my, ix, iy, p0x, p0y, vx, vy)) {
          val prev = (i + n - 1) % n; val nxt = (i + 1) % n
          val cross = (loop(2 * i) - loop(2 * prev)) *
            (loop(2 * nxt + 1) - loop(2 * i + 1)) -
            (loop(2 * i + 1) - loop(2 * prev + 1)) * (loop(2 * nxt) - loop(2 * i))
          if (cross < 0) { // reflex in a CCW loop
            val dx = vx - mx; val dy = math.abs(vy - my)
            val tan = if (dx == 0.0) Double.MaxValue else dy / dx
            val d = dx * dx + dy * dy
            if (tan < bestTan || (tan == bestTan && d < bestD)) {
              bestTan = tan; bestD = d; pi = i
            }
          }
        }
      }
      i += 1
    }
    // splice: loop[0..pi] + hole[mi, mi-1(CW order kept as stored)...] —
    // hole is stored CW; walking it from mi in storage order keeps the
    // combined loop CCW — + [M, P] closing pair
    val hn = hole.length / 2
    val out = mutable.ArrayBuilder.make[Double]
    out.sizeHint(loop.length + hole.length + 4)
    i = 0
    while (i <= pi) { out += loop(2 * i); out += loop(2 * i + 1); i += 1 }
    var k = 0
    while (k <= hn) { // hole loop INCLUDING the return to M
      val hi = (mi + k) % hn
      out += hole(2 * hi); out += hole(2 * hi + 1)
      k += 1
    }
    out += loop(2 * pi); out += loop(2 * pi + 1) // back to P
    i = pi + 1
    while (i < n) { out += loop(2 * i); out += loop(2 * i + 1); i += 1 }
    out.result()
  }

  /** Ear clipping over one CCW loop (may contain doubled bridge
    * vertices). Lowest-index ear first; collinear (zero-area) ears are
    * clipped for free.
    */
  private def earClip(loop: Array[Double]): Seq[Polygon] = {
    val n0 = loop.length / 2
    if (n0 < 3) return Seq.empty
    val idx = mutable.ArrayBuffer.tabulate(n0)(identity)
    val tris = mutable.ArrayBuffer.empty[Polygon]
    def x(i: Int) = loop(2 * idx(i))
    def y(i: Int) = loop(2 * idx(i) + 1)
    def cross(i: Int, j: Int, k: Int): Double =
      (x(j) - x(i)) * (y(k) - y(i)) - (y(j) - y(i)) * (x(k) - x(i))
    // blocking test is boundary-INCLUSIVE (earcut's rule): a vertex lying
    // exactly on the candidate diagonal must reject the ear — grid-aligned
    // polygons put reflex corners precisely on diagonals. Vertices that
    // coincide with an ear corner (bridge duplicates) never block.
    def blocks(i: Int, j: Int, k: Int, m: Int): Boolean = {
      val mx = x(m); val my = y(m)
      if ((mx == x(i) && my == y(i)) || (mx == x(j) && my == y(j)) ||
          (mx == x(k) && my == y(k))) return false
      cross(i, j, m) >= 0 && cross(j, k, m) >= 0 && cross(k, i, m) >= 0
    }
    var guard = 0
    val guardMax = 2 * n0 * n0 + 16
    while (idx.length > 3 && guard < guardMax) {
      val m = idx.length
      var ear = -1
      var i = 0
      while (i < m && ear < 0) {
        val p = (i + m - 1) % m; val q = (i + 1) % m
        val c = cross(p, i, q)
        if (c == 0.0) ear = i // degenerate ear: clip for free
        else if (c > 0) {
          // convex: an ear unless some other vertex lies strictly inside
          var bad = false
          var t = 0
          while (t < m && !bad) {
            if (t != p && t != i && t != q && blocks(p, i, q, t)) bad = true
            t += 1
          }
          if (!bad) ear = i
        }
        i += 1
      }
      if (ear < 0) ear = 0 // fallback: clip anyway (degenerate input)
      val p = (ear + idx.length - 1) % idx.length
      val q = (ear + 1) % idx.length
      if (cross(p, ear, q) != 0.0) {
        tris += Polygon(Array(Array(
          x(p), y(p), x(ear), y(ear), x(q), y(q), x(p), y(p))))
      }
      idx.remove(ear)
      guard += 1
    }
    if (idx.length == 3) {
      val c = cross(0, 1, 2)
      if (c != 0.0) {
        val t =
          if (c > 0) Array(x(0), y(0), x(1), y(1), x(2), y(2), x(0), y(0))
          else Array(x(0), y(0), x(2), y(2), x(1), y(1), x(0), y(0))
        tris += Polygon(Array(t))
      }
    }
    tris.toSeq
  }
}
