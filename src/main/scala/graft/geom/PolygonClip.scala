package graft.geom

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** General boolean overlay (union / intersection / difference) of areal
  * geometries: arbitrary simple polygons with holes and multipolygons,
  * convex or concave, overlapping or not.
  *
  * Replaces the round-2 convex-only decomposition (the reference delegates
  * the same operator surface to GEOS overlay — see reference
  * `dask_geopandas/expr.py:1001-1013` for the binary ops and
  * `expr.py:33-41` for union_all). Algorithm: boundary fragment
  * classification, the planar form of Weiler–Atherton clipping:
  *
  *  1. split every boundary edge of A at its intersections with B's edges
  *     (proper crossings, T-junctions, collinear overlaps) and vice versa —
  *     each intersection point is computed ONCE per edge pair and shared by
  *     both sides, so fragment endpoints coincide bit-exactly;
  *  2. coincident (shared) fragments are paired exactly by endpoint key;
  *     non-shared fragments are classified by locating their midpoint in
  *     the other operand (strictly inside / outside after step 1);
  *  3. fragments kept by the op-specific rule (all directed with the result
  *     interior on their left) are stitched into rings, taking the most
  *     clockwise continuation at multi-degree nodes so pinch points split
  *     into separate simple rings;
  *  4. CCW rings become shells, CW rings holes; each hole attaches to the
  *     smallest enclosing shell.
  *
  * Shells are normalized CCW and holes CW on input, so "interior on the
  * left of a directed boundary edge" holds everywhere and the op rules are
  * orientation-local (no global point-in-polygon sampling on boundaries).
  */
object PolygonClip {

  sealed trait BoolOp
  case object OpUnion extends BoolOp
  case object OpIntersection extends BoolOp
  case object OpDifference extends BoolOp

  /** Relative snap tolerance: coordinates closer than SNAP_REL * magnitude
    * are treated as coincident. Real-world doubles (reprojected, averaged,
    * serialized) carry noise many decades above machine epsilon; GEOS
    * survives it via snap rounding — this is our equivalent. 1e-9 relative
    * is sub-micrometer at Earth scale: inputs whose boundaries genuinely
    * differ by less weld together (by design), inputs noisier than the
    * tolerance may drop rings — loudly, via [[droppedRingCount]]/log, never
    * silently. Exact-grid inputs are unaffected: their vertex gaps are
    * either 0 or far above the tolerance.
    */
  private val SNAP_REL = 1e-9

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val droppedRings = new java.util.concurrent.atomic.AtomicLong

  /** Rings silently discarded by degenerate walks since JVM start — nonzero
    * values indicate inputs beyond the snap tolerance (inspect/alert).
    */
  def droppedRingCount: Long = droppedRings.get

  private def ringDropped(reason: String): Unit = {
    val n = droppedRings.incrementAndGet()
    if (n <= 10 || n % 100000 == 0)
      log.warn(s"PolygonClip dropped a boundary ring ($reason; total=$n) — " +
        "input likely exceeds snap tolerance; result may under-cover")
  }

  /** Boolean overlay of the areal parts of `a` and `b`. Returns a Polygon,
    * MultiPolygon or empty GeometryCollection.
    */
  def overlay(a: Geometry, b: Geometry, op: BoolOp): Geometry = {
    val pa = arealParts(a)
    val pb = arealParts(b)
    if (pa.isEmpty) return op match {
      case OpUnion => Geometry.collect(pb.toIndexedSeq)
      case _       => GeometryCollection(Array.empty)
    }
    if (pb.isEmpty) return op match {
      case OpIntersection => GeometryCollection(Array.empty)
      case _              => Geometry.collect(pa.toIndexedSeq)
    }
    val envA = pa.foldLeft(Envelope.empty)((e, p) => e.union(p.envelope))
    val envB = pb.foldLeft(Envelope.empty)((e, p) => e.union(p.envelope))
    val tol = SNAP_REL * math.max(1.0,
      Seq(envA.minX, envA.minY, envA.maxX, envA.maxY,
        envB.minX, envB.minY, envB.maxX, envB.maxY).map(math.abs).max)
    // tolerance-expanded gate: operands within snap distance must reach the
    // weld+clip machinery, not the disjoint fast path
    val envDisjoint = envA.minX > envB.maxX + tol || envB.minX > envA.maxX + tol ||
      envA.minY > envB.maxY + tol || envB.minY > envA.maxY + tol
    if (envDisjoint) return op match {
      case OpUnion        => Geometry.collect((pa ++ pb).toIndexedSeq)
      case OpIntersection => GeometryCollection(Array.empty)
      case OpDifference   => Geometry.collect(pa.toIndexedSeq)
    }

    val na = pa.map(normalize)
    // weld B's vertices onto coincident-within-tolerance A vertices so
    // jittered shared boundaries regain bit-exact coincidence (the fragment
    // pairing and collinear-overlap machinery require it)
    val nb = weldVertices(pb.map(normalize), na, tol)
    val geomA: Geometry = if (na.length == 1) na(0) else MultiPolygon(na.toArray)
    val geomB: Geometry = if (nb.length == 1) nb(0) else MultiPolygon(nb.toArray)

    val edges = ArrayBuffer[Edge]()
    na.foreach(p => p.rings.foreach(r => ringEdges(r, 0, edges)))
    nb.foreach(p => p.rings.foreach(r => ringEdges(r, 1, edges)))

    // split every A edge against every B edge (envelope-prechecked)
    val aEdges = edges.filter(_.side == 0)
    val bEdges = edges.filter(_.side == 1)
    var i = 0
    while (i < aEdges.length) {
      val ea = aEdges(i)
      var j = 0
      while (j < bEdges.length) {
        val eb = bEdges(j)
        if (envOverlap(ea, eb, tol)) addSplits(ea, eb, tol)
        j += 1
      }
      i += 1
    }

    val fragsA = ArrayBuffer[Frag]()
    val fragsB = ArrayBuffer[Frag]()
    aEdges.foreach(e => explode(e, fragsA))
    bEdges.foreach(e => explode(e, fragsB))

    // pair exactly-coincident fragments across sides
    val bByKey = mutable.HashMap.empty[(Double, Double, Double, Double), ArrayBuffer[Int]]
    var k = 0
    while (k < fragsB.length) {
      bByKey.getOrElseUpdate(fragsB(k).undirectedKey, ArrayBuffer.empty) += k
      k += 1
    }
    val bConsumed = new Array[Boolean](fragsB.length)
    val kept = ArrayBuffer[Frag]()

    fragsA.foreach { fa =>
      val mates = bByKey.get(fa.undirectedKey)
      val mate = mates.flatMap(_.find(!bConsumed(_)))
      mate match {
        case Some(bi) =>
          bConsumed(bi) = true
          val sameDir = fragsB(bi).x1 == fa.x1 && fragsB(bi).y1 == fa.y1
          val keep = op match {
            case OpUnion | OpIntersection => sameDir
            case OpDifference             => !sameDir
          }
          if (keep) kept += fa
        case None =>
          val loc = classify(fa, geomB)
          val keep = op match {
            case OpUnion        => loc == Predicates.OUT
            case OpIntersection => loc == Predicates.IN
            case OpDifference   => loc == Predicates.OUT
          }
          if (keep) kept += fa
      }
    }
    k = 0
    while (k < fragsB.length) {
      if (!bConsumed(k)) {
        val fb = fragsB(k)
        val loc = classify(fb, geomA)
        op match {
          case OpUnion        => if (loc == Predicates.OUT) kept += fb
          case OpIntersection => if (loc == Predicates.IN) kept += fb
          case OpDifference   => if (loc == Predicates.IN) kept += fb.reversed
        }
      }
      k += 1
    }

    stitch(kept)
  }

  // -------------------------------------------------------------- plumbing

  private def arealParts(g: Geometry): Seq[Polygon] =
    Geometry.parts(g).collect { case p: Polygon if !p.isEmpty => p }

  /** Shell CCW, holes CW, degenerate rings dropped. */
  private[geom] def normalize(p: Polygon): Polygon = {
    val rings = ArrayBuffer[Array[Double]]()
    var r = 0
    while (r < p.rings.length) {
      val ring = p.rings(r)
      val sa = Measures.signedRingArea(ring)
      if (sa != 0) {
        val wantCcw = r == 0
        rings += (if ((sa > 0) == wantCcw) ring else reverseRing(ring))
      } else if (r == 0) rings += ring // keep degenerate shell (empty-ish)
      r += 1
    }
    Polygon(rings.toArray)
  }

  /** Replace every vertex of `subject` lying within `tol` of a `target`
    * vertex with that exact vertex (one-sided snap, GEOS-style). Restores
    * bit-exact coincidence on jittered shared boundaries; exact inputs are
    * untouched (gaps are 0 or far above tol).
    */
  private def weldVertices(subject: Seq[Polygon], target: Seq[Polygon],
      tol: Double): Seq[Polygon] = {
    if (tol <= 0) return subject
    val grid = mutable.HashMap.empty[(Long, Long), ArrayBuffer[(Double, Double)]]
    @inline def cx(v: Double): Long = math.floor(v / tol).toLong
    target.foreach(_.rings.foreach { r =>
      var i = 0
      while (i + 1 < r.length) {
        grid.getOrElseUpdate((cx(r(i)), cx(r(i + 1))), ArrayBuffer.empty) += ((r(i), r(i + 1)))
        i += 2
      }
    })
    if (grid.isEmpty) return subject
    val tol2 = tol * tol
    subject.map { p =>
      Polygon(p.rings.map { r =>
        val out = r.clone()
        var i = 0
        while (i + 1 < out.length) {
          val x = out(i); val y = out(i + 1)
          var bestX = x; var bestY = y; var bestD = tol2
          var gx = cx(x) - 1
          while (gx <= cx(x) + 1) {
            var gy = cx(y) - 1
            while (gy <= cx(y) + 1) {
              grid.get((gx, gy)).foreach(_.foreach { case (tx, ty) =>
                val d = (tx - x) * (tx - x) + (ty - y) * (ty - y)
                if (d < bestD) { bestD = d; bestX = tx; bestY = ty }
              })
              gy += 1
            }
            gx += 1
          }
          out(i) = bestX; out(i + 1) = bestY
          i += 2
        }
        out
      })
    }
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

  /** Directed boundary edge with its accumulated split points.
    * Split entries are (t, x, y) with the EXACT coordinates to use, shared
    * with the other edge of the intersecting pair.
    */
  private final class Edge(
      val x1: Double, val y1: Double, val x2: Double, val y2: Double, val side: Int) {
    var splits: ArrayBuffer[(Double, Double, Double)] = null
    def addSplit(t: Double, x: Double, y: Double): Unit = {
      if (splits == null) splits = ArrayBuffer.empty
      splits += ((t, x, y))
    }
    val minX: Double = math.min(x1, x2)
    val maxX: Double = math.max(x1, x2)
    val minY: Double = math.min(y1, y2)
    val maxY: Double = math.max(y1, y2)
  }

  private def envOverlap(a: Edge, b: Edge, tol: Double): Boolean =
    a.minX <= b.maxX + tol && b.minX <= a.maxX + tol &&
      a.minY <= b.maxY + tol && b.minY <= a.maxY + tol

  private def ringEdges(ring: Array[Double], side: Int, out: ArrayBuffer[Edge]): Unit = {
    var i = 0
    while (i + 3 < ring.length) {
      if (ring(i) != ring(i + 2) || ring(i + 1) != ring(i + 3))
        out += new Edge(ring(i), ring(i + 1), ring(i + 2), ring(i + 3), side)
      i += 2
    }
  }

  /** Record the intersection(s) of a cross-side edge pair on both edges,
    * computing each intersection point once so both sides split at
    * bit-identical coordinates.
    *
    * Robustness (snap rounding, lightweight form): intersection parameters
    * within `tol` (as a distance along the edge) of 0/1 snap to the exact
    * endpoint, so a near-T-junction nodes at the vertex itself instead of
    * two oh-so-slightly-different points (which would break fragment
    * pairing and silently drop rings); near-parallel edge pairs whose
    * endpoints sit within `tol` of the other's line are treated as
    * collinear overlaps, like GEOS does after snap rounding.
    */
  private def addSplits(ea: Edge, eb: Edge, tol: Double): Unit = {
    val d1x = ea.x2 - ea.x1; val d1y = ea.y2 - ea.y1
    val d2x = eb.x2 - eb.x1; val d2y = eb.y2 - eb.y1
    val denom = d1x * d2y - d1y * d2x
    val lenA = math.hypot(d1x, d1y)
    val lenB = math.hypot(d2x, d2y)
    // (near-)collinear first: |orient|/len is the perpendicular distance of
    // a point from the edge's line, so this asks "do the segments deviate
    // from one common line by more than tol anywhere?" — the parametric
    // path is hopelessly ill-conditioned exactly in this regime
    val collinearish = lenA > 0 && lenB > 0 &&
      math.abs(Predicates.orient(ea.x1, ea.y1, ea.x2, ea.y2, eb.x1, eb.y1)) <= tol * lenA &&
      math.abs(Predicates.orient(ea.x1, ea.y1, ea.x2, ea.y2, eb.x2, eb.y2)) <= tol * lenA &&
      math.abs(Predicates.orient(eb.x1, eb.y1, eb.x2, eb.y2, ea.x1, ea.y1)) <= tol * lenB &&
      math.abs(Predicates.orient(eb.x1, eb.y1, eb.x2, eb.y2, ea.x2, ea.y2)) <= tol * lenB
    if (collinearish) {
      // (near-)collinear overlap: split each edge at the other's interior
      // endpoints
      addCollinearSplit(ea, eb.x1, eb.y1, d1x, d1y)
      addCollinearSplit(ea, eb.x2, eb.y2, d1x, d1y)
      addCollinearSplit(eb, ea.x1, ea.y1, d2x, d2y)
      addCollinearSplit(eb, ea.x2, ea.y2, d2x, d2y)
    } else if (denom != 0) {
      val ex = eb.x1 - ea.x1; val ey = eb.y1 - ea.y1
      var t = (ex * d2y - ey * d2x) / denom
      var u = (ex * d1y - ey * d1x) / denom
      // snap parameters to endpoints within tol of travel distance
      val tEps = if (lenA > 0) tol / lenA else 0.0
      val uEps = if (lenB > 0) tol / lenB else 0.0
      if (t > -tEps && t < tEps) t = 0 else if (t > 1 - tEps && t < 1 + tEps) t = 1
      if (u > -uEps && u < uEps) u = 0 else if (u > 1 - uEps && u < 1 + uEps) u = 1
      if (t >= 0 && t <= 1 && u >= 0 && u <= 1) {
        // canonical point: exact endpoints first, else axis-exact coordinates
        var px = 0.0; var py = 0.0
        if (t == 0) { px = ea.x1; py = ea.y1 }
        else if (t == 1) { px = ea.x2; py = ea.y2 }
        else if (u == 0) { px = eb.x1; py = eb.y1 }
        else if (u == 1) { px = eb.x2; py = eb.y2 }
        else {
          px = if (d1x == 0) ea.x1 else if (d2x == 0) eb.x1 else ea.x1 + t * d1x
          py = if (d1y == 0) ea.y1 else if (d2y == 0) eb.y1 else ea.y1 + t * d1y
        }
        if (t > 0 && t < 1) ea.addSplit(t, px, py)
        if (u > 0 && u < 1) eb.addSplit(u, px, py)
      }
    }
  }

  private def addCollinearSplit(e: Edge, px: Double, py: Double,
      dx: Double, dy: Double): Unit = {
    val t =
      if (math.abs(dx) >= math.abs(dy)) (px - e.x1) / dx
      else (py - e.y1) / dy
    if (t > 0 && t < 1) e.addSplit(t, px, py)
  }

  /** Directed fragment (post-split sub-edge). */
  private final case class Frag(
      x1: Double, y1: Double, x2: Double, y2: Double, side: Int) {
    def reversed: Frag = Frag(x2, y2, x1, y1, side)
    def undirectedKey: (Double, Double, Double, Double) = {
      val ax = x1 + 0.0; val ay = y1 + 0.0; val bx = x2 + 0.0; val by = y2 + 0.0
      if (ax < bx || (ax == bx && ay <= by)) (ax, ay, bx, by) else (bx, by, ax, ay)
    }
  }

  private def explode(e: Edge, out: ArrayBuffer[Frag]): Unit = {
    if (e.splits == null) {
      out += Frag(e.x1, e.y1, e.x2, e.y2, e.side)
      return
    }
    val pts = ArrayBuffer[(Double, Double)]((e.x1, e.y1))
    e.splits.sortBy(_._1).foreach { case (_, x, y) =>
      val last = pts.last
      if (last._1 != x || last._2 != y) pts += ((x, y))
    }
    val last = pts.last
    if (last._1 != e.x2 || last._2 != e.y2) pts += ((e.x2, e.y2))
    var i = 0
    while (i + 1 < pts.length) {
      out += Frag(pts(i)._1, pts(i)._2, pts(i + 1)._1, pts(i + 1)._2, e.side)
      i += 1
    }
  }

  /** Locate a (non-shared) fragment relative to the other operand by its
    * midpoint; after splitting, midpoints are strictly interior/exterior
    * except for inexact collinear overlaps, where quarter points decide.
    */
  private def classify(f: Frag, other: Geometry): Int = {
    val loc = Predicates.locate((f.x1 + f.x2) / 2, (f.y1 + f.y2) / 2, other)
    if (loc != Predicates.ON) return loc
    val l1 = Predicates.locate(f.x1 + 0.25 * (f.x2 - f.x1), f.y1 + 0.25 * (f.y2 - f.y1), other)
    if (l1 != Predicates.ON) return l1
    Predicates.locate(f.x1 + 0.75 * (f.x2 - f.x1), f.y1 + 0.75 * (f.y2 - f.y1), other)
  }

  // -------------------------------------------------------------- stitching

  private def stitch(frags: ArrayBuffer[Frag]): Geometry = {
    if (frags.isEmpty) return GeometryCollection(Array.empty)
    val byStart = mutable.HashMap.empty[(Double, Double), ArrayBuffer[Int]]
    var i = 0
    while (i < frags.length) {
      val f = frags(i)
      byStart.getOrElseUpdate((f.x1 + 0.0, f.y1 + 0.0), ArrayBuffer.empty) += i
      i += 1
    }
    val used = new Array[Boolean](frags.length)
    val rings = ArrayBuffer[Array[Double]]()

    i = 0
    while (i < frags.length) {
      if (!used(i)) {
        val ring = walkRing(frags, byStart, used, i)
        if (ring != null) rings += ring
      }
      i += 1
    }

    // shells CCW / holes CW; attach each hole to smallest enclosing shell
    val shells = ArrayBuffer[(Array[Double], Double)]()
    val holes = ArrayBuffer[Array[Double]]()
    rings.foreach { r =>
      val sa = Measures.signedRingArea(r)
      if (sa > 0) shells += ((r, sa))
      else if (sa < 0) holes += r
    }
    if (shells.isEmpty) return GeometryCollection(Array.empty)
    val shellHoles = Array.fill(shells.length)(ArrayBuffer[Array[Double]]())
    holes.foreach { h =>
      var best = -1
      var bestArea = Double.PositiveInfinity
      var s = 0
      while (s < shells.length) {
        val (ring, area) = shells(s)
        if (area < bestArea && holeInShell(h, ring)) { best = s; bestArea = area }
        s += 1
      }
      if (best >= 0) shellHoles(best) += h
    }
    val polys = shells.indices.map { s =>
      Polygon((canonical(shells(s)._1) +: shellHoles(s).map(canonical).toSeq).toArray)
    }
    if (polys.length == 1) polys(0) else MultiPolygon(polys.toArray)
  }

  /** Walk one ring starting at fragment `start`, taking the most clockwise
    * continuation at every node (splits pinch points into simple rings).
    * Returns the closed ring, or null for degenerate walks.
    */
  private def walkRing(frags: ArrayBuffer[Frag],
      byStart: mutable.HashMap[(Double, Double), ArrayBuffer[Int]],
      used: Array[Boolean], start: Int): Array[Double] = {
    val pts = ArrayBuffer[Double]()
    var cur = start
    var guard = 0
    val limit = frags.length + 2
    while (guard <= limit) {
      val f = frags(cur)
      used(cur) = true
      pts += f.x1; pts += f.y1
      val node = (f.x2 + 0.0, f.y2 + 0.0)
      val cands = byStart.get(node) match {
        case Some(cs) => cs
        case None     => ringDropped("dangling fragment"); return null
      }
      // candidates: unused fragments, plus the start fragment (to close)
      var best = -1
      var bestAngle = Double.NegativeInfinity
      val inDx = f.x2 - f.x1; val inDy = f.y2 - f.y1
      var ci = 0
      while (ci < cands.length) {
        val c = cands(ci)
        if (!used(c) || c == start) {
          val g = frags(c)
          val a = ccwAngle(-inDx, -inDy, g.x2 - g.x1, g.y2 - g.y1)
          if (a > bestAngle) { bestAngle = a; best = c }
        }
        ci += 1
      }
      if (best == -1) { ringDropped("dead-end node"); return null }
      if (best == start) {
        // close ring
        pts += frags(start).x1; pts += frags(start).y1
        val ring = pts.toArray
        return if (math.abs(Measures.signedRingArea(ring)) > 0) ring else null
      }
      cur = best
      guard += 1
    }
    ringDropped("runaway walk")
    null
  }

  /** CCW angle from direction (rx,ry) to (cx,cy), in (0, 2*Pi]; the maximum
    * is the first direction hit when rotating clockwise from (rx,ry).
    */
  private def ccwAngle(rx: Double, ry: Double, cx: Double, cy: Double): Double = {
    val a = math.atan2(ry, rx)
    val b = math.atan2(cy, cx)
    var d = b - a
    if (d <= 0) d += 2 * math.Pi
    d
  }

  /** Drop repeated and collinear interior vertices; rotate to start at the
    * lexicographically smallest vertex (deterministic output).
    */
  private[geom] def canonical(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2 - 1 // distinct vertices (ring closed)
    if (n < 3) return ring
    val xs = ArrayBuffer[Double]()
    val ys = ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val px = ring(2 * ((i + n - 1) % n)); val py = ring(2 * ((i + n - 1) % n) + 1)
      val cx = ring(2 * i); val cy = ring(2 * i + 1)
      val nx = ring(2 * ((i + 1) % n)); val ny = ring(2 * ((i + 1) % n) + 1)
      val dup = cx == px && cy == py
      val collinear = !dup && Predicates.orient(px, py, nx, ny, cx, cy) == 0 &&
        cx >= math.min(px, nx) && cx <= math.max(px, nx) &&
        cy >= math.min(py, ny) && cy <= math.max(py, ny)
      if (!dup && !collinear) { xs += cx; ys += cy }
      i += 1
    }
    val m = xs.length
    if (m < 3) return ring
    var startIdx = 0
    var k = 1
    while (k < m) {
      if (xs(k) < xs(startIdx) || (xs(k) == xs(startIdx) && ys(k) < ys(startIdx))) startIdx = k
      k += 1
    }
    val out = new Array[Double]((m + 1) * 2)
    i = 0
    while (i < m) {
      val src = (startIdx + i) % m
      out(2 * i) = xs(src); out(2 * i + 1) = ys(src)
      i += 1
    }
    out(2 * m) = out(0); out(2 * m + 1) = out(1)
    out
  }

  private def holeInShell(hole: Array[Double], shell: Array[Double]): Boolean = {
    var i = 0
    while (i + 1 < hole.length) {
      val loc = Predicates.pointInRing(hole(i), hole(i + 1), shell)
      if (loc == Predicates.IN) return true
      if (loc == Predicates.OUT) return false
      i += 2
    }
    // all vertices on the shell boundary: test an edge midpoint
    if (hole.length >= 4) {
      val mx = (hole(0) + hole(2)) / 2; val my = (hole(1) + hole(3)) / 2
      return Predicates.pointInRing(mx, my, shell) == Predicates.IN
    }
    false
  }
}
