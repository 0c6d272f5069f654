package graft.geom

import scala.collection.mutable

/** Linework noding, polygonal validity and repair (shapely/GEOS node,
  * is_valid / is_valid_reason, make_valid with the GEOS "linework" method).
  *
  * Noding is the O(n^2) pairwise-split form (proper crossings, endpoint
  * touches and collinear overlaps all become shared vertices) — the right
  * cost model for per-row geometry kernels whose vertex counts are small;
  * a Bentley–Ottmann sweep would only matter for single geometries with
  * very large vertex counts, which the 16384-segment guard rejects.
  */
object Noding {

  /** Fully node lineal(-ized) input: every segment pair that crosses,
    * touches mid-segment, or overlaps collinearly is split at the shared
    * points. Returns the deduplicated segments as a MultiLineString.
    */
  def node(g: Geometry): Geometry = {
    val segs = collectSegments(g)
    val n = segs.length / 4
    require(n <= 16384, s"node: $n segments exceeds the 16384 guard")
    val out = mutable.LinkedHashSet.empty[(Double, Double, Double, Double)]
    nodedSegments(segs).foreach { case (x1, y1, x2, y2) =>
      // dedup undirected
      val k = if (x1 < x2 || (x1 == x2 && y1 <= y2)) (x1, y1, x2, y2)
        else (x2, y2, x1, y1)
      out += k
    }
    MultiLineString(out.toArray.map { case (x1, y1, x2, y2) =>
      LineString(Array(x1, y1, x2, y2))
    })
  }

  /** Split every input segment at its intersections with all others. */
  private def nodedSegments(
      segs: Array[Double]): Seq[(Double, Double, Double, Double)] = {
    val n = segs.length / 4
    val result = mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    var i = 0
    while (i < n) {
      val ax = segs(4 * i); val ay = segs(4 * i + 1)
      val bx = segs(4 * i + 2); val by = segs(4 * i + 3)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      if (len2 > 0) {
        // canonical crossing vertex for an unordered segment pair: always
        // computed from the LOWER-indexed segment's parametrization, so
        // both segments emit bit-identical coordinates — an ulp
        // difference here splits the shared vertex and silently breaks
        // polygonization of the noded arrangement
        def pairPoint(j: Int): (Double, Double) = {
          val m = math.min(i, j); val mm = math.max(i, j)
          val pax = segs(4 * m); val pay = segs(4 * m + 1)
          val pdx = segs(4 * m + 2) - pax; val pdy = segs(4 * m + 3) - pay
          val pcx = segs(4 * mm); val pcy = segs(4 * mm + 1)
          val pfx = segs(4 * mm + 2) - pcx; val pfy = segs(4 * mm + 3) - pcy
          val pden = pdx * pfy - pdy * pfx
          val pt = ((pcx - pax) * pfy - (pcy - pay) * pfx) / pden
          (pax + pt * pdx, pay + pt * pdy)
        }
        // split points strictly inside (0, 1), keyed by parameter, valued
        // by the canonical vertex to emit
        val ts = mutable.SortedMap.empty[Double, (Double, Double)]
        var j = 0
        while (j < n) {
          if (j != i) {
            val cx = segs(4 * j); val cy = segs(4 * j + 1)
            val ex = segs(4 * j + 2); val ey = segs(4 * j + 3)
            val fx = ex - cx; val fy = ey - cy
            val denom = dx * fy - dy * fx
            val c1 = dx * (cy - ay) - dy * (cx - ax)
            val c2 = dx * (ey - ay) - dy * (ex - ax)
            if (denom != 0) {
              // proper or touching crossing: solve for parameters on both
              val t = ((cx - ax) * fy - (cy - ay) * fx) / denom
              val u = ((cx - ax) * dy - (cy - ay) * dx) / denom
              if (t > 0 && t < 1 && u >= 0 && u <= 1) ts += t -> pairPoint(j)
            } else if (c1 == 0 && c2 == 0) {
              // collinear: other's endpoints (exact doubles both segments
              // share) projected into our interior
              val t1 = ((cx - ax) * dx + (cy - ay) * dy) / len2
              val t2 = ((ex - ax) * dx + (ey - ay) * dy) / len2
              if (t1 > 0 && t1 < 1) ts += t1 -> ((cx, cy))
              if (t2 > 0 && t2 < 1) ts += t2 -> ((ex, ey))
            } else {
              // parallel non-collinear: an endpoint may still touch ours?
              // (impossible: parallel disjoint lines share no point)
            }
          }
          j += 1
        }
        var px = ax; var py = ay
        ts.foreach { case (_, (qx, qy)) =>
          if (qx != px || qy != py) result += ((px, py, qx, qy))
          px = qx; py = qy
        }
        if (px != bx || py != by) result += ((px, py, bx, by))
      }
      i += 1
    }
    result.toSeq
  }

  private def collectSegments(g: Geometry): Array[Double] = {
    val b = mutable.ArrayBuilder.make[Double]
    def path(xy: Array[Double]): Unit = {
      var i = 0
      while (i + 3 < xy.length) {
        b += xy(i) += xy(i + 1) += xy(i + 2) += xy(i + 3)
        i += 2
      }
    }
    def walk(g: Geometry): Unit = g match {
      case l: LineString         => path(l.xy)
      case p: Polygon            => p.rings.foreach(path)
      case m: MultiLineString    => m.lines.foreach(walk)
      case m: MultiPolygon       => m.polys.foreach(walk)
      case c: GeometryCollection => c.geoms.foreach(walk)
      case _                     => ()
    }
    walk(g)
    b.result()
  }

  // ------------------------------------------------------------- validity

  /** Polygonal validity (OGC/GEOS): rings closed with >= 4 points, no ring
    * self-intersection or ring/ring crossing beyond finitely many touch
    * points, holes inside the shell. Non-polygonal geometries are valid
    * (as in GEOS, where lines and points are always valid).
    */
  def isValid(g: Geometry): Boolean = isValidReason(g) == "Valid Geometry"

  /** GEOS-style reason string; "Valid Geometry" when valid. */
  def isValidReason(g: Geometry): String = g match {
    case p: Polygon      => polygonReason(p)
    case m: MultiPolygon =>
      m.polys.iterator.map(polygonReason)
        .find(_ != "Valid Geometry")
        .orElse {
          // members may only touch at finitely many points: any positive
          // pairwise intersection area is a self-intersection
          var found: Option[String] = None
          var i = 0
          while (i < m.polys.length && found.isEmpty) {
            var j = i + 1
            while (j < m.polys.length && found.isEmpty) {
              if (m.polys(i).envelope.intersects(m.polys(j).envelope) &&
                  Measures.area(Overlay.intersection(m.polys(i), m.polys(j))) > 0)
                found = Some("Self-intersection[shells overlap]")
              j += 1
            }
            i += 1
          }
          found
        }
        .getOrElse("Valid Geometry")
    case c: GeometryCollection =>
      c.geoms.iterator.map(isValidReason)
        .find(_ != "Valid Geometry").getOrElse("Valid Geometry")
    case _ => "Valid Geometry"
  }

  private def polygonReason(p: Polygon): String = {
    if (p.isEmpty) return "Valid Geometry"
    p.rings.foreach { r =>
      if (r.length < 8) return "Too few points in geometry component"
      if (r(0) != r(r.length - 2) || r(1) != r(r.length - 1))
        return "Ring not closed"
    }
    // self/cross intersections: any two non-adjacent segments sharing a
    // non-endpoint point, or adjacent segments overlapping collinearly
    val segs = collectSegments(p)
    val n = segs.length / 4
    if (n > 16384) return "Valid Geometry" // guard: assume valid past the bound
    var i = 0
    while (i < n) {
      val ax = segs(4 * i); val ay = segs(4 * i + 1)
      val bx = segs(4 * i + 2); val by = segs(4 * i + 3)
      val dx = bx - ax; val dy = by - ay
      var j = i + 1
      while (j < n) {
        val cx = segs(4 * j); val cy = segs(4 * j + 1)
        val ex = segs(4 * j + 2); val ey = segs(4 * j + 3)
        val fx = ex - cx; val fy = ey - cy
        val denom = dx * fy - dy * fx
        val shared = ((ax == cx && ay == cy) || (ax == ex && ay == ey)
          || (bx == cx && by == cy) || (bx == ex && by == ey))
        if (denom != 0) {
          val t = ((cx - ax) * fy - (cy - ay) * fx) / denom
          val u = ((cx - ax) * dy - (cy - ay) * dx) / denom
          val interior = t > 0 && t < 1 && u > 0 && u < 1
          val touch = t >= 0 && t <= 1 && u >= 0 && u <= 1
          if (interior || (touch && !shared && (t > 0 && t < 1 || u > 0 && u < 1)))
            return f"Self-intersection[${ax + t * dx}%s ${ay + t * dy}%s]"
        } else {
          val c1 = dx * (cy - ay) - dy * (cx - ax)
          if (c1 == 0 && dx * dx + dy * dy > 0) {
            val len2 = dx * dx + dy * dy
            val t1 = ((cx - ax) * dx + (cy - ay) * dy) / len2
            val t2 = ((ex - ax) * dx + (ey - ay) * dy) / len2
            val lo = math.max(0.0, math.min(t1, t2))
            val hi = math.min(1.0, math.max(t1, t2))
            if (hi - lo > 0) return f"Self-intersection[${ax + lo * dx}%s ${ay + lo * dy}%s]"
          }
        }
        j += 1
      }
      i += 1
    }
    // holes inside shell
    val shell = Polygon(p.rings(0))
    var h = 1
    while (h < p.rings.length) {
      val r = p.rings(h)
      var k = 0
      var anyIn = false
      var allOut = true
      while (k + 1 < r.length) {
        val loc = Predicates.locate(r(k), r(k + 1), shell)
        if (loc == Predicates.IN) anyIn = true
        if (loc != Predicates.OUT) allOut = false
        k += 2
      }
      if (!anyIn && allOut) return "Hole lies outside shell"
      if (!anyIn && !allOut) { /* touching hole: accept */ }
      h += 1
    }
    "Valid Geometry"
  }

  // ------------------------------------------------------------ makeValid

  /** GEOS make_valid, "linework" method: valid input passes through;
    * invalid polygonal input has its boundary fully noded and polygonized,
    * and the faces whose interiors are covered an odd number of times by
    * the original rings (even-odd rule) are kept — the classic bowtie
    * becomes the two triangles. Lineal/puntal input is returned as-is.
    */
  def makeValid(g: Geometry): Geometry = g match {
    case p: Polygon =>
      if (isValid(p)) p else repairPolygon(p)
    case m: MultiPolygon =>
      if (isValid(m)) m
      else {
        // per-member repair, then union (overlapping members dissolve —
        // the GEOS multipolygon contract, not cross-member even-odd)
        val repaired = m.polys.map(p => if (isValid(p)) p: Geometry else repairPolygon(p))
          .filterNot(_.isEmpty)
        if (repaired.isEmpty) GeometryCollection(Array.empty)
        else repaired.reduce(Overlay.union)
      }
    case c: GeometryCollection => GeometryCollection(c.geoms.map(makeValid))
    case other => other
  }

  private def repairPolygon(p: Polygon): Geometry = {
    val noded = node(p)
    val faces = Polygonize.polygonize(noded) match {
      case gc: GeometryCollection => gc.geoms
      case other                  => Array(other)
    }
    val kept = faces.filter { f =>
      Constructive.pointOnSurface(f) match {
        case pt: Point => oddCrossings(pt.x, pt.y, p.rings)
        case _         => false
      }
    }
    if (kept.isEmpty) GeometryCollection(Array.empty)
    else if (kept.length == 1) kept(0)
    else kept.reduce(Overlay.union)
  }

  /** Even-odd crossing parity of a ray from (x, y) against all rings. */
  private def oddCrossings(x: Double, y: Double,
      rings: Array[Array[Double]]): Boolean = {
    var crossings = 0
    rings.foreach { r =>
      var i = 0
      while (i + 3 < r.length) {
        val x1 = r(i); val y1 = r(i + 1); val x2 = r(i + 2); val y2 = r(i + 3)
        if ((y1 > y) != (y2 > y)) {
          val xint = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
          if (xint > x) crossings += 1
        }
        i += 2
      }
    }
    (crossings & 1) == 1
  }
}
