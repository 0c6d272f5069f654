package graft.geom

import scala.collection.mutable

/** Coverage-aware simplification (the PostGIS 3.4 `ST_CoverageSimplify`
  * surface): treat a set of edge-matched, non-overlapping polygons as ONE
  * topology — cut every ring into arcs at junctions (the same cut rule
  * `TopoJsonIO.topologyDoc` applies in quantized space, here on exact
  * coordinate bits), Douglas–Peucker-simplify each arc ONCE anchored at
  * its endpoints, and rebuild every polygon from the shared simplified
  * arcs. A shared boundary is a single arc, so both neighbors receive the
  * bit-identical simplified edge — per-feature `simplify` would tear the
  * coverage into slivers and gaps exactly there.
  *
  * Junction rule: a vertex is a junction when two traversals see it with
  * different unordered neighbor pairs (three-country corners, T-joints,
  * self-touches). Shared-edge interiors see identical neighbors from both
  * sides and stay junction-free, so whole shared boundaries dedup into
  * one arc.
  */
object Coverage {

  private type PtKey = (Long, Long)
  @inline private def keyOf(x: Double, y: Double): PtKey =
    // +0.0 folds -0.0 into +0.0 so both sides of an axis-seam edge agree
    (java.lang.Double.doubleToLongBits(x + 0.0),
      java.lang.Double.doubleToLongBits(y + 0.0))

  /** Simplify a polygonal coverage in one pass. Non-polygonal members pass
    * through untouched (PostGIS restricts the window to polygons too).
    * Order-preserving: `out(i)` is the simplified `geoms(i)`.
    */
  def simplifyCoverage(geoms: IndexedSeq[Geometry], tol: Double): IndexedSeq[Geometry] = {
    require(tol >= 0, s"coverageSimplify: tolerance >= 0 (got $tol)")

    // ---- pass 1: junction detection over exact coordinate keys
    val neighborOf = mutable.HashMap.empty[PtKey, (PtKey, PtKey)]
    val junctions = mutable.HashSet.empty[PtKey]
    def visitRing(xy: Array[Double]): Unit = {
      val n = xy.length / 2
      if (n < 3) return
      val m = n - 1 // closed: last == first
      var i = 0
      while (i < m) {
        val p = keyOf(xy(2 * i), xy(2 * i + 1))
        val pi = if (i == 0) m - 1 else i - 1
        val ni = if (i == m - 1) 0 else i + 1
        val prev = keyOf(xy(2 * pi), xy(2 * pi + 1))
        val next = keyOf(xy(2 * ni), xy(2 * ni + 1))
        val nb = if (implicitly[Ordering[PtKey]].lteq(prev, next)) (prev, next)
                 else (next, prev)
        neighborOf.get(p) match {
          case None => neighborOf(p) = nb
          case Some(x) => if (x != nb) junctions += p
        }
        i += 1
      }
    }
    def eachRing(g: Geometry)(f: Array[Double] => Unit): Unit = g match {
      case p: Polygon => p.rings.foreach(f)
      case m: MultiPolygon => m.polys.foreach(_.rings.foreach(f))
      case gc: GeometryCollection => gc.geoms.foreach(eachRing(_)(f))
      case _ => ()
    }
    geoms.foreach(g => eachRing(g)(visitRing))

    // ---- pass 2: arc table. Open arcs key on their exact coordinate-bit
    // sequence (forward or reversed → same arc); junction-free rings
    // canonicalize by rotation to the minimal vertex and a fixed
    // direction, so an island shell and the lake hole around it share one
    // closed arc.
    val arcSimplified = mutable.ArrayBuffer.empty[Array[Double]]
    val arcOriginal = mutable.ArrayBuffer.empty[Array[Double]]
    // arcs whose simplification would collapse some ring below a valid
    // polygon: REVERTED on every ring that shares them (both sides of the
    // seam stay bit-identical — the whole point of the coverage contract)
    val reverted = mutable.HashSet.empty[Int]
    val arcIndex = mutable.HashMap.empty[String, Int]
    def seqKey(xy: Array[Double], from: Int, to: Int, rev: Boolean): String = {
      val sb = new StringBuilder
      var i = from
      val step = if (rev) -1 else 1
      while (i != to + step) {
        val k = keyOf(xy(2 * i), xy(2 * i + 1))
        sb.append(k._1).append(',').append(k._2).append(';')
        i += step
      }
      sb.result()
    }
    def sliceXy(xy: Array[Double], from: Int, to: Int): Array[Double] =
      xy.slice(2 * from, 2 * to + 2)

    /** Register the open arc xy[from..to]; returns (arcId, reversedFlag). */
    def openArc(xy: Array[Double], from: Int, to: Int): (Int, Boolean) = {
      val fk = seqKey(xy, from, to, rev = false)
      arcIndex.get(fk) match {
        case Some(i) => (i, false)
        case None =>
          val rk = seqKey(xy, to, from, rev = true)
          arcIndex.get(rk) match {
            case Some(i) => (i, true)
            case None =>
              val orig = sliceXy(xy, from, to)
              arcSimplified += Constructive.simplifyLineXy(orig, tol)
              arcOriginal += orig
              arcIndex(fk) = arcSimplified.length - 1
              (arcSimplified.length - 1, false)
          }
      }
    }

    /** Canonical form of a junction-free closed ring: rotate so the
      * minimal vertex key leads, direction so the second key is <= the
      * last interior key. Returns (arcId, reversedFlag) — the flag says
      * the ORIGINAL direction was opposite the canonical one.
      */
    def closedArc(xy: Array[Double]): (Int, Boolean) = {
      val m = xy.length / 2 - 1
      val keys = Array.tabulate(m)(i => keyOf(xy(2 * i), xy(2 * i + 1)))
      val ord = implicitly[Ordering[PtKey]]
      var rot = 0
      var i = 1
      while (i < m) { if (ord.lt(keys(i), keys(rot))) rot = i; i += 1 }
      val nextK = keys((rot + 1) % m)
      val prevK = keys((rot + m - 1) % m)
      val reversed = ord.lt(prevK, nextK) // canonical walks toward min side
      // build the canonical closed sequence
      val canon = new Array[Double](2 * (m + 1))
      var k = 0
      while (k <= m) {
        val src = if (!reversed) (rot + k) % m else ((rot - k) % m + m) % m
        canon(2 * k) = xy(2 * src); canon(2 * k + 1) = xy(2 * src + 1)
        k += 1
      }
      val fk = seqKey(canon, 0, m, rev = false)
      arcIndex.get(fk) match {
        case Some(idx) => (idx, reversed)
        case None =>
          arcSimplified += Constructive.simplifyRingXy(canon, tol)
          arcOriginal += canon
          arcIndex(fk) = arcSimplified.length - 1
          (arcSimplified.length - 1, reversed)
      }
    }
    def arcCoords(idx: Int): Array[Double] =
      if (reverted(idx)) arcOriginal(idx) else arcSimplified(idx)

    // ---- pass 3: rebuild each ring from its (simplified) arcs; returns
    // the rebuilt coordinates AND the arc ids it consumed so the caller
    // can revert those arcs when the ring collapses
    def rebuildRing(xy: Array[Double]): (Array[Double], Seq[Int]) = {
      val n = xy.length / 2
      if (n < 4) return (xy, Nil)
      val m = n - 1
      val js = (0 until m).filter(i => junctions.contains(keyOf(xy(2 * i), xy(2 * i + 1))))
      if (js.isEmpty) {
        val (idx, reversed) = closedArc(xy)
        val simp = arcCoords(idx)
        val out = if (!reversed) simp else {
          val c = simp.length / 2
          val r = new Array[Double](simp.length)
          var i = 0
          while (i < c) {
            r(2 * i) = simp(2 * (c - 1 - i)); r(2 * i + 1) = simp(2 * (c - 1 - i) + 1)
            i += 1
          }
          r
        }
        (out, Seq(idx))
      } else {
        // rotate to the first junction, then cut at every junction
        val rot = js.head
        val rxy = new Array[Double](2 * (m + 1))
        var k = 0
        while (k <= m) {
          val src = (rot + k) % m
          rxy(2 * k) = xy(2 * src); rxy(2 * k + 1) = xy(2 * src + 1)
          k += 1
        }
        val cuts = (0 to m).filter(k => k == 0 || k == m ||
          junctions.contains(keyOf(rxy(2 * k), rxy(2 * k + 1))))
        val arcIds = mutable.ArrayBuffer.empty[Int]
        val parts = cuts.sliding(2).map { w =>
          val (idx, reversed) = openArc(rxy, w(0), w(1))
          arcIds += idx
          val simp = arcCoords(idx)
          if (!reversed) simp else {
            val c = simp.length / 2
            val r = new Array[Double](simp.length)
            var i = 0
            while (i < c) {
              r(2 * i) = simp(2 * (c - 1 - i)); r(2 * i + 1) = simp(2 * (c - 1 - i) + 1)
              i += 1
            }
            r
          }
        }.toIndexedSeq
        // concatenate, dropping each arc's duplicated first point
        val total = parts.map(_.length - 2).sum + 2
        val out = new Array[Double](total)
        out(0) = parts(0)(0); out(1) = parts(0)(1)
        var pos = 2
        parts.foreach { a =>
          System.arraycopy(a, 2, out, pos, a.length - 2)
          pos += a.length - 2
        }
        (out, arcIds.toSeq)
      }
    }

    // a collapsed rebuild (< 4 points) must not revert just ITS ring —
    // that would tear the seam against neighbors still using the
    // simplified arcs. Instead the offending ring's ARCS are reverted and
    // everything is rebuilt, so both sides of every seam keep choosing
    // the same coordinates. Terminates: the reverted set only grows, and
    // with all of a ring's arcs reverted the rebuild reproduces the
    // original ring (>= 4 points).
    var marked = true
    var result: IndexedSeq[Geometry] = null
    while (marked) {
      marked = false
      def ring(xy: Array[Double]): Array[Double] = {
        val (out, arcs) = rebuildRing(xy)
        if (out.length < 8) {
          val fresh = arcs.filterNot(reverted)
          if (fresh.nonEmpty) { reverted ++= fresh; marked = true }
          xy // placeholder; the re-pass recomputes with reverted arcs
        } else out
      }
      def rebuild(g: Geometry): Geometry = g match {
        case p: Polygon => Polygon(p.rings.map(ring))
        case mp: MultiPolygon =>
          MultiPolygon(mp.polys.map(p => Polygon(p.rings.map(ring))))
        case gc: GeometryCollection => GeometryCollection(gc.geoms.map(rebuild))
        case other => other
      }
      result = geoms.map(rebuild)
    }
    result
  }

  /** Coverage validity witnesses (the practical core of PostGIS
    * `ST_CoverageInvalidEdges`): per input polygon, a human-readable
    * reason when it breaks the edge-matched/non-overlapping contract that
    * [[unionCoverage]] and [[simplifyCoverage]] assume. Detects:
    *   - an edge traversed by THREE or more ring sides (impossible in a
    *     valid planar coverage — a duplicated polygon or a fold);
    *   - interior overlap: a vertex of one polygon strictly inside
    *     another, or one polygon's interior containing another entirely
    *     (checked both ways via containsProperly on a sample vertex and
    *     the envelope-candidate pairs of an STR-style bucket pass);
    *   - T-nodes: a vertex of one polygon lying in the INTERIOR of a
    *     neighbor's edge with no matching vertex in that neighbor — the
    *     seam-mismatch class [[simplifyCoverage]] corrupts silently
    *     (its junction-bounded arcs cannot pair up across the seam).
    *     The member whose edge is missing the node is flagged.
    * NOT detected (needs full noding): crossing edges whose intersection
    * point is a vertex of neither side. Empty result = "no witness
    * found", not a proof of validity — same contract as GEOS's
    * validator, which also only reports the edges it can see.
    */
  def invalidWitnesses(geoms: IndexedSeq[Geometry]): Seq[(Int, String)] = {
    val out = mutable.ArrayBuffer.empty[(Int, String)]
    // (a) edge multiplicity >= 3
    val edgeCount = mutable.HashMap.empty[(PtKey, PtKey), Int]
    val edgeOwner = mutable.HashMap.empty[(PtKey, PtKey), Int]
    def ringsOf(g: Geometry): Seq[Array[Double]] = g match {
      case p: Polygon => p.rings.toSeq
      case m: MultiPolygon => m.polys.toSeq.flatMap(_.rings)
      case gc: GeometryCollection => gc.geoms.toSeq.flatMap(ringsOf)
      case _ => Nil
    }
    val ord = implicitly[Ordering[PtKey]]
    geoms.zipWithIndex.foreach { case (g, gi) =>
      ringsOf(g).foreach { xy =>
        val n = xy.length / 2
        var i = 0
        while (i < n - 1) {
          val a = keyOf(xy(2 * i), xy(2 * i + 1))
          val b = keyOf(xy(2 * i + 2), xy(2 * i + 3))
          if (a != b) {
            val k = if (ord.lteq(a, b)) (a, b) else (b, a)
            val c = edgeCount.getOrElse(k, 0) + 1
            edgeCount(k) = c
            if (c == 1) edgeOwner(k) = gi
            else if (c == 3) {
              out += gi -> "edge traversed 3+ times (duplicate polygon or fold)"
              out += edgeOwner(k) -> "edge traversed 3+ times (duplicate polygon or fold)"
            }
          }
          i += 1
        }
      }
    }
    // (b) interior overlap: envelope-bucketed candidate pairs, then a
    // strict vertex-inside probe each way + whole-containment check
    val envs = geoms.map(_.envelope)
    val cands = mutable.ArrayBuffer.empty[(Int, Int)]
    val cell = {
      val ws = envs.filter(!_.isEmpty)
      if (ws.isEmpty) 1.0
      else math.max(1e-9, ws.map(e => math.max(e.width, e.height)).max)
    }
    val buckets = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
    envs.zipWithIndex.foreach { case (e, i) =>
      if (!e.isEmpty) {
        var bx = math.floor(e.minX / cell).toLong
        while (bx <= math.floor(e.maxX / cell).toLong) {
          var by = math.floor(e.minY / cell).toLong
          while (by <= math.floor(e.maxY / cell).toLong) {
            val b = buckets.getOrElseUpdate((bx, by), mutable.ArrayBuffer.empty)
            b.foreach { j => if (envs(j).intersects(e)) cands += ((j, i)) }
            b += i
            by += 1
          }
          bx += 1
        }
      }
    }
    def firstVertexInside(a: Geometry, b: Geometry): Boolean = {
      // strict-interior probe on a's shell vertices AND edge midpoints
      // (bounded sample): grid-aligned overlaps put vertices ON the other
      // boundary where only the midpoints fall strictly inside
      val pts = mutable.ArrayBuffer.empty[(Double, Double)]
      def collect(g: Geometry): Unit = g match {
        case p: Polygon =>
          val r = p.rings(0)
          var i = 0
          while (i < r.length / 2 - 1 && pts.length < 32) {
            pts += ((r(2 * i), r(2 * i + 1)))
            pts += (((r(2 * i) + r(2 * i + 2)) / 2.0,
              (r(2 * i + 1) + r(2 * i + 3)) / 2.0))
            i += 1
          }
        case m: MultiPolygon => m.polys.foreach(collect)
        case gc: GeometryCollection => gc.geoms.foreach(collect)
        case _ => ()
      }
      collect(a)
      pts.exists { case (x, y) => Predicates.containsProperly(b, Point(x, y)) }
    }
    cands.distinct.foreach { case (i, j) =>
      if (firstVertexInside(geoms(i), geoms(j)) ||
          firstVertexInside(geoms(j), geoms(i)) ||
          Predicates.containsProperly(geoms(i), geoms(j)) ||
          Predicates.containsProperly(geoms(j), geoms(i))) {
        out += i -> s"interior overlap with member $j"
        out += j -> s"interior overlap with member $i"
      }
    }
    // (c) T-nodes: a vertex of one member lying strictly inside a
    // neighbor's edge, with no matching vertex in that neighbor. Uniform
    // grid over edges (cell ~ max edge extent, same trick as the envelope
    // pass) so each foreign vertex probes only nearby edges: O(V + E).
    val vertKeys = geoms.map { g =>
      val s = mutable.HashSet.empty[PtKey]
      ringsOf(g).foreach { xy =>
        var i = 0
        while (i < xy.length / 2) { s += keyOf(xy(2 * i), xy(2 * i + 1)); i += 1 }
      }
      s
    }
    val edges = mutable.ArrayBuffer.empty[(Int, Double, Double, Double, Double)]
    geoms.zipWithIndex.foreach { case (g, gi) =>
      ringsOf(g).foreach { xy =>
        var i = 0
        while (i < xy.length / 2 - 1) {
          edges += ((gi, xy(2 * i), xy(2 * i + 1), xy(2 * i + 2), xy(2 * i + 3)))
          i += 1
        }
      }
    }
    if (edges.nonEmpty) {
      val ecell = math.max(1e-9, edges.iterator.map { case (_, ax, ay, bx, by) =>
        math.max(math.abs(bx - ax), math.abs(by - ay)) }.max)
      val egrid = mutable.HashMap.empty[(Long, Long), mutable.ArrayBuffer[Int]]
      edges.zipWithIndex.foreach { case ((_, ax, ay, bx, by), ei) =>
        var cx = math.floor(math.min(ax, bx) / ecell).toLong
        while (cx <= math.floor(math.max(ax, bx) / ecell).toLong) {
          var cy = math.floor(math.min(ay, by) / ecell).toLong
          while (cy <= math.floor(math.max(ay, by) / ecell).toLong) {
            egrid.getOrElseUpdate((cx, cy), mutable.ArrayBuffer.empty) += ei
            cy += 1
          }
          cx += 1
        }
      }
      val flagged = mutable.HashSet.empty[(Int, Int)] // (edgeOwner, vertexOwner)
      geoms.zipWithIndex.foreach { case (g, gi) =>
        val probed = mutable.HashSet.empty[PtKey]
        ringsOf(g).foreach { xy =>
          var i = 0
          while (i < xy.length / 2 - 1) { // last coord repeats the first
            val vx = xy(2 * i); val vy = xy(2 * i + 1)
            val vk = keyOf(vx, vy)
            if (probed.add(vk)) {
              val cellKey = (math.floor(vx / ecell).toLong,
                math.floor(vy / ecell).toLong)
              egrid.getOrElse(cellKey, mutable.ArrayBuffer.empty).foreach { ei =>
                val (gj, ax, ay, bx, by) = edges(ei)
                if (gj != gi && !flagged.contains((gj, gi)) &&
                    !vertKeys(gj).contains(vk) &&
                    vk != keyOf(ax, ay) && vk != keyOf(bx, by) &&
                    Predicates.nearlyCollinear(ax, ay, bx, by, vx, vy) &&
                    vx >= math.min(ax, bx) - 1e-12 && vx <= math.max(ax, bx) + 1e-12 &&
                    vy >= math.min(ay, by) - 1e-12 && vy <= math.max(ay, by) + 1e-12) {
                  flagged += ((gj, gi))
                  out += gj -> s"edge missing node at a vertex of member $gi (T-node)"
                }
              }
            }
            i += 1
          }
        }
      }
    }
    out.distinct.toSeq
  }

  /** Coverage union (the PostGIS `ST_CoverageUnion` surface): dissolve an
    * edge-matched coverage by DROPPING interior boundaries instead of
    * running the general overlay — every edge segment used by two ring
    * traversals is interior, the remaining segments stitch into the union
    * rings. O(total vertices), no intersection tests: the fast dissolve
    * path for admin/tile coverages where general `unionAll` would pay the
    * full overlay machinery. Like GEOS's CoverageUnion, validity is the
    * caller's contract — overlapping or seam-mismatched input produces a
    * wrong union silently (GEOS ships a separate validator for that);
    * boundaries that cannot close at all still throw.
    */
  def unionCoverage(geoms: Seq[Geometry]): Geometry = {
    // vertices intern to dense int ids once; every hot structure after
    // that is primitive (LongMap / int arrays), keeping the stitch at
    // true O(vertices) without tuple boxing
    val vertIdx = mutable.HashMap.empty[PtKey, Int]
    val vx = mutable.ArrayBuffer.empty[Double]
    val vy = mutable.ArrayBuffer.empty[Double]
    def vid(x: Double, y: Double): Int =
      vertIdx.getOrElseUpdate(keyOf(x, y), { vx += x; vy += y; vx.length - 1 })
    def ringsOf(g: Geometry): Seq[Array[Double]] = g match {
      case p: Polygon => p.rings.toSeq
      case m: MultiPolygon => m.polys.toSeq.flatMap(_.rings)
      case gc: GeometryCollection => gc.geoms.toSeq.flatMap(ringsOf)
      case _ => Nil
    }
    // intern each ring to id sequences (consecutive duplicates dropped)
    val idRings = geoms.flatMap(ringsOf).map { xy =>
      val n = xy.length / 2
      val ids = new Array[Int](n)
      var m = 0
      var i = 0
      while (i < n) {
        val id = vid(xy(2 * i), xy(2 * i + 1))
        if (m == 0 || ids(m - 1) != id) { ids(m) = id; m += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(ids, m)
    }
    // undirected edge multiset: an interior edge appears once per side.
    // Keys are splitmix64-mixed (a BIJECTION — no collisions) because
    // scala LongMap's open addressing degrades catastrophically on the
    // clustered sequential keys that dense vertex ids produce (measured:
    // 2.4 s for 90k raw-key updates vs ~5 ms mixed).
    @inline def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    @inline def pack(a: Int, b: Int): Long = mix(
      if (a < b) (a.toLong << 32) | (b.toLong & 0xffffffffL)
      else (b.toLong << 32) | (a.toLong & 0xffffffffL))
    val edgeCount = mutable.LongMap.empty[Int]
    idRings.foreach { ids =>
      var i = 0
      while (i < ids.length - 1) {
        val k = pack(ids(i), ids(i + 1))
        edgeCount(k) = edgeCount.getOrElse(k, 0) + 1
        i += 1
      }
    }
    // boundary runs in ORIGINAL direction; stitch runs end-to-start
    val runs = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
    idRings.foreach { ids =>
      var cur: mutable.ArrayBuffer[Int] = null
      var i = 0
      while (i < ids.length - 1) {
        if (edgeCount(pack(ids(i), ids(i + 1))) == 1) {
          if (cur == null) { cur = mutable.ArrayBuffer(ids(i), ids(i + 1)); runs += cur }
          else cur += ids(i + 1)
        } else cur = null
        i += 1
      }
    }
    if (runs.isEmpty) return GeometryCollection(Array.empty)
    val byStart = mutable.LongMap.empty[mutable.ArrayBuffer[Int]]
    runs.zipWithIndex.foreach { case (r, i) =>
      byStart.getOrElseUpdate(mix(r.head.toLong), mutable.ArrayBuffer.empty) += i
    }
    val used = new Array[Boolean](runs.length)
    val outRings = mutable.ArrayBuffer.empty[Array[Double]]
    var ri = 0
    while (ri < runs.length) {
      if (!used(ri)) {
        val path = mutable.ArrayBuffer.empty[Int]
        path ++= runs(ri); used(ri) = true
        var guard = runs.length + 1
        while (path.head != path.last && guard > 0) {
          val nexts = byStart.getOrElse(mix(path.last.toLong), mutable.ArrayBuffer.empty)
            .filter(j => !used(j))
          require(nexts.nonEmpty,
            "coverageUnion: boundary does not close — input is not a valid " +
              "edge-matched coverage (overlaps or vertex mismatches)")
          // valid coverages usually have exactly one continuation; at a
          // point-touch junction (two components meeting only at a vertex,
          // 4+ boundary edges) pick the planar-face continuation — the
          // sharpest clockwise turn from the incoming direction — so each
          // loop closes as a SIMPLE ring instead of a figure-eight
          val j = if (nexts.length == 1) nexts.head else {
            val at = path.last; val from = path(path.length - 2)
            val inAng = math.atan2(vy(at) - vy(from), vx(at) - vx(from))
            nexts.minBy { cand =>
              val nxt = runs(cand)(1)
              val outAng = math.atan2(vy(nxt) - vy(at), vx(nxt) - vx(at))
              // clockwise angle from the REVERSED incoming edge to the
              // outgoing edge, in (0, 2π] — the rotational-order rule that
              // traces planar faces
              val rev = inAng + math.Pi
              val d = (rev - outAng) % (2 * math.Pi)
              val cw = if (d <= 0) d + 2 * math.Pi else d
              cw
            }
          }
          used(j) = true
          path ++= runs(j).drop(1)
          guard -= 1
        }
        require(path.head == path.last,
          "coverageUnion: unclosed boundary ring — invalid coverage")
        val xy = new Array[Double](2 * path.length)
        var k = 0
        path.foreach { p =>
          xy(2 * k) = vx(p); xy(2 * k + 1) = vy(p); k += 1
        }
        if (path.length >= 4) outRings += xy
      }
      ri += 1
    }
    // classify shells vs holes by even-odd nesting depth, assign each hole
    // to its immediate parent shell
    def signedArea(xy: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < xy.length - 2) {
        s += xy(i) * xy(i + 3) - xy(i + 2) * xy(i + 1)
        i += 2
      }
      s / 2.0
    }
    def inRing(px: Double, py: Double, xy: Array[Double]): Boolean = {
      var in = false
      var i = 0
      val n = xy.length / 2
      var j = n - 1
      var ii = 0
      while (ii < n) {
        val xi = xy(2 * ii); val yi = xy(2 * ii + 1)
        val xj = xy(2 * j); val yj = xy(2 * j + 1)
        if (((yi > py) != (yj > py)) &&
          (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) in = !in
        j = ii; ii += 1
        i += 1
      }
      in
    }
    val ringSeq = outRings.toIndexedSeq
    val depth = ringSeq.indices.map { i =>
      val xy = ringSeq(i)
      // a vertex of i strictly inside ring j (vertices ON j's boundary
      // would be shared junctions — probe the edge midpoint instead)
      val px = (xy(0) + xy(2)) / 2.0; val py = (xy(1) + xy(3)) / 2.0
      ringSeq.indices.count(j => j != i && inRing(px, py, ringSeq(j)))
    }
    val shells = ringSeq.indices.filter(i => depth(i) % 2 == 0)
    val polys = shells.map { si =>
      val holes = ringSeq.indices.filter { hi =>
        depth(hi) == depth(si) + 1 && {
          val xy = ringSeq(hi)
          val px = (xy(0) + xy(2)) / 2.0; val py = (xy(1) + xy(3)) / 2.0
          inRing(px, py, ringSeq(si))
        }
      }
      // normalize winding: shell CCW, holes CW (the kernel convention)
      def oriented(xy: Array[Double], ccw: Boolean): Array[Double] =
        if ((signedArea(xy) > 0) == ccw) xy
        else {
          val n = xy.length / 2
          val r = new Array[Double](xy.length)
          var i = 0
          while (i < n) {
            r(2 * i) = xy(2 * (n - 1 - i)); r(2 * i + 1) = xy(2 * (n - 1 - i) + 1)
            i += 1
          }
          r
        }
      Polygon((Array(oriented(ringSeq(si), ccw = true)) ++
        holes.map(h => oriented(ringSeq(h), ccw = false))).toArray)
    }
    if (polys.length == 1) polys(0) else MultiPolygon(polys.toArray)
  }
}
