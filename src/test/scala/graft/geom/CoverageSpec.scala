package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class CoverageSpec extends AnyFunSuite {

  private def poly(wkt: String): Polygon = Wkt.read(wkt).asInstanceOf[Polygon]
  private def ringPts(p: Geometry): Seq[(Double, Double)] = {
    val r = p.asInstanceOf[Polygon].rings(0)
    (0 until r.length / 2).map(i => (r(2 * i), r(2 * i + 1)))
  }

  test("collinear midpoints drop; shared edge stays bit-identical") {
    // two rects sharing x=4, extra collinear vertices on every edge
    val a = poly("POLYGON ((0 0, 2 0, 4 0, 4 1.5, 4 3, 2 3, 0 3, 0 1.5, 0 0))")
    val b = poly("POLYGON ((4 0, 6 0, 8 0, 8 1.5, 8 3, 6 3, 4 3, 4 1.5, 4 0))")
    val out = Coverage.simplifyCoverage(IndexedSeq(a, b), 0.01)
    assert(ringPts(out(0)).length == 5, ringPts(out(0)).toString)
    assert(ringPts(out(1)).length == 5, ringPts(out(1)).toString)
    assert(Measures.area(out(0)) == 12.0 && Measures.area(out(1)) == 12.0)
    // shared edge coordinates agree exactly on both sides
    val ea = ringPts(out(0)).filter(_._1 == 4.0).toSet
    val eb = ringPts(out(1)).filter(_._1 == 4.0).toSet
    assert(ea == Set((4.0, 0.0), (4.0, 3.0)) && ea == eb)
  }

  test("sub-tolerance zigzag on a shared edge straightens identically — no sliver") {
    // shared boundary wiggles by 0.01 << tol; per-feature simplify would
    // keep each side's own wiggle only if tolerances differed — here the
    // single shared arc guarantees both sides get the SAME line
    val a = poly("POLYGON ((0 0, 4 0, 4.01 1, 3.99 2, 4 3, 0 3, 0 0))")
    val b = poly("POLYGON ((4 0, 8 0, 8 3, 4 3, 3.99 2, 4.01 1, 4 0))")
    val out = Coverage.simplifyCoverage(IndexedSeq(a, b), 0.1)
    val sa = ringPts(out(0)).toSet
    val sb = ringPts(out(1)).toSet
    assert(!sa.exists(p => p._1 == 4.01 || p._1 == 3.99), sa.toString)
    assert(!sb.exists(p => p._1 == 4.01 || p._1 == 3.99), sb.toString)
    // union area = sum of areas exactly when the seam matches
    val total = Measures.area(out(0)) + Measures.area(out(1))
    val union = Overlay.unionAll(IndexedSeq(out(0), out(1)))
    assert(math.abs(Measures.area(union) - total) < 1e-9,
      s"union ${Measures.area(union)} vs sum $total")
  }

  test("three-way junction is pinned; per-arc simplification stays local") {
    // three boxes meeting at (2,2): junction must survive any tolerance
    val a = poly("POLYGON ((0 0, 2 0, 2 1, 2 2, 0 2, 0 0))")
    val b = poly("POLYGON ((2 0, 4 0, 4 2, 3 2, 2 2, 2 1, 2 0))")
    val c = poly("POLYGON ((0 2, 2 2, 3 2, 4 2, 4 4, 0 4, 0 2))")
    // huge tolerance: junctions still pin every meeting point (real
    // corners may legitimately drop — DP semantics)
    Coverage.simplifyCoverage(IndexedSeq(a, b, c), 10.0).foreach { g =>
      assert(ringPts(g).contains((2.0, 2.0)), s"junction lost: ${ringPts(g)}")
    }
    // collinear-only tolerance: the shared-edge midpoints (2,1)/(3,2)
    // drop, all corners and areas survive
    val out = Coverage.simplifyCoverage(IndexedSeq(a, b, c), 0.01)
    assert(Measures.area(out(0)) == 4.0)
    assert(Measures.area(out(1)) == 4.0)
    assert(Measures.area(out(2)) == 8.0)
    assert(!ringPts(out(0)).contains((2.0, 1.0)))
    assert(!ringPts(out(2)).contains((3.0, 2.0)))
  }

  test("junction-free island shell and lake hole share one closed arc") {
    val lake = poly(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 5, 6 6, 4 6, 4 4))")
    // island traverses the same ring in the OPPOSITE direction, different
    // start vertex — canonicalization must still dedup to one arc
    val island = poly("POLYGON ((6 5, 6 4, 4 4, 4 6, 6 6, 6 5))")
    val out = Coverage.simplifyCoverage(IndexedSeq(lake, island), 0.01)
    val hole = {
      val r = out(0).asInstanceOf[Polygon].rings(1)
      (0 until r.length / 2).map(i => (r(2 * i), r(2 * i + 1))).toSet
    }
    val shell = ringPts(out(1)).toSet
    assert(hole == shell, s"hole $hole vs island $shell")
    assert(hole == Set((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)))
    assert(Measures.area(out(1)) == 4.0)
  }

  test("unionCoverage: interior seam drops, outer boundary stitches") {
    val a = poly("POLYGON ((0 0, 2 0, 4 0, 4 1.5, 4 3, 2 3, 0 3, 0 1.5, 0 0))")
    val b = poly("POLYGON ((4 0, 6 0, 8 0, 8 1.5, 8 3, 6 3, 4 3, 4 1.5, 4 0))")
    val u = Coverage.unionCoverage(Seq(a, b))
    assert(u.isInstanceOf[Polygon], u.getClass.toString)
    assert(Measures.area(u) == 24.0)
    val pts = ringPts(u).toSet
    // interior midpoint of the seam is gone; corners of the union remain
    assert(!pts.contains((4.0, 1.5)), pts.toString)
    assert(Set((0.0, 0.0), (8.0, 0.0), (8.0, 3.0), (0.0, 3.0)).subsetOf(pts))
  }

  test("unionCoverage: island fills its lake hole; separate parts stay multi") {
    val lake = poly(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val island = poly("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    val u1 = Coverage.unionCoverage(Seq(lake, island))
    assert(Measures.area(u1) == 100.0, Measures.area(u1).toString)
    assert(u1.asInstanceOf[Polygon].rings.length == 1, "hole filled")

    // lake alone + a detached square → MultiPolygon, hole preserved
    val far = poly("POLYGON ((20 0, 22 0, 22 2, 20 2, 20 0))")
    val u2 = Coverage.unionCoverage(Seq(lake, far))
    assert(u2.isInstanceOf[MultiPolygon], u2.getClass.toString)
    assert(math.abs(Measures.area(u2) - (96.0 + 4.0)) < 1e-12)
    val ringCounts = u2.asInstanceOf[MultiPolygon].polys.map(_.rings.length).sorted
    assert(ringCounts.toSeq == Seq(1, 2), ringCounts.mkString(","))
  }

  test("collapsing ring reverts its ARCS on both sides — seam never tears") {
    // thin sliver B shares the (10,4)-(10,5)-(10,6) boundary with big A;
    // tol=1 would collapse B to a 2-point ring. The fix reverts B's arcs
    // — INCLUDING the shared one — so A must also keep the (10,5)
    // midpoint; reverting only B's ring would leave A's side of the seam
    // simplified and open a sliver
    val a = poly("POLYGON ((0 0, 10 0, 10 4, 10 5, 10 6, 10 10, 0 10, 0 0))")
    val b = poly("POLYGON ((10 4, 10 5, 10 6, 10.3 5, 10 4))")
    val out = Coverage.simplifyCoverage(IndexedSeq(a, b), 1.0)
    val aPts = ringPts(out(0)).toSet
    val bPts = ringPts(out(1)).toSet
    assert(bPts == Set((10.0, 4.0), (10.0, 5.0), (10.0, 6.0), (10.3, 5.0)),
      s"B must survive via arc revert: $bPts")
    assert(aPts.contains((10.0, 5.0)),
      s"A must keep the reverted shared-arc midpoint: $aPts")
    // seam exactness: union area == sum of areas
    val total = Measures.area(out(0)) + Measures.area(out(1))
    val union = Overlay.unionAll(IndexedSeq(out(0), out(1)))
    assert(math.abs(Measures.area(union) - total) < 1e-9)
  }

  test("unionCoverage: point-touching components trace as two simple rings") {
    // two 2-triangle components meeting ONLY at (0,0): four boundary
    // edges at that vertex — naive continuation picking stitches a
    // figure-eight; rotational-order tracing must yield two simple polys
    val a1 = poly("POLYGON ((-2 -1, 0 0, -2 0, -2 -1))")
    val a2 = poly("POLYGON ((-2 0, 0 0, -2 1, -2 0))")
    val b1 = poly("POLYGON ((0 0, 2 -1, 2 0, 0 0))")
    val b2 = poly("POLYGON ((0 0, 2 0, 2 1, 0 0))")
    val u = Coverage.unionCoverage(Seq(a1, a2, b1, b2))
    assert(math.abs(Measures.area(u) - 4.0) < 1e-12, Measures.area(u).toString)
    val parts = u match {
      case mp: MultiPolygon => mp.polys.toSeq
      case p: Polygon => Seq(p)
      case other => fail(s"unexpected ${other.getClass}")
    }
    assert(parts.length == 2, s"expected two simple parts, got $parts")
    parts.foreach { p =>
      assert(p.rings.length == 1)
      assert(math.abs(Measures.area(p) - 2.0) < 1e-12)
      // simple ring: no repeated vertex except the closure
      val pts = ringPts(p)
      assert(pts.dropRight(1).distinct.length == pts.length - 1,
        s"self-touching ring: $pts")
    }
  }

  test("unionCoverage: grid of rects equals the general overlay union") {
    val cells = for (i <- 0 until 4; j <- 0 until 3) yield poly(
      s"POLYGON ((${i} ${j}, ${i + 1} ${j}, ${i + 1} ${j + 1}, ${i} ${j + 1}, ${i} ${j}))")
    val u = Coverage.unionCoverage(cells)
    assert(Measures.area(u) == 12.0)
    assert(u.isInstanceOf[Polygon] && u.asInstanceOf[Polygon].rings.length == 1)
    // contract check on a valid coverage: union area == sum of parts, and
    // the grid result matches the general overlay union exactly
    val viaOverlay = Overlay.unionAll(cells.toIndexedSeq)
    assert(math.abs(Measures.area(viaOverlay) - Measures.area(u)) < 1e-12)
  }

  test("fuzz: random subdivided grids — simplify keeps the seam exact, union matches overlay") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 20) {
      val nx = 2 + rnd.nextInt(3); val ny = 2 + rnd.nextInt(3)
      // per-cell rings with randomly subdivided edges: neighbors must
      // subdivide the SHARED edge identically for a valid coverage, so
      // the split points are a function of the edge, not the cell
      def splits(a: Double, b: Double, seed: Long): Seq[Double] = {
        val r2 = new scala.util.Random(seed)
        val k = r2.nextInt(3)
        val ts = Seq.fill(k)(0.1 + 0.8 * r2.nextDouble()).sorted
        ts.map(t => a + (b - a) * t)
      }
      def edgeSeed(x0: Double, y0: Double, x1: Double, y1: Double): Long =
        java.util.Objects.hash(trial: Integer, x0: java.lang.Double,
          y0: java.lang.Double, x1: java.lang.Double, y1: java.lang.Double).toLong
      def edgePts(x0: Double, y0: Double, x1: Double, y1: Double): Seq[(Double, Double)] = {
        val s = edgeSeed(math.min(x0, x1), math.min(y0, y1),
          math.max(x0, x1), math.max(y0, y1))
        val mids =
          if (y0 == y1) splits(math.min(x0, x1), math.max(x0, x1), s).map(x => (x, y0))
          else splits(math.min(y0, y1), math.max(y0, y1), s).map(y => (x0, y))
        val ordered = if (x0 < x1 || y0 < y1) mids else mids.reverse
        (x0, y0) +: ordered
      }
      val cells = for (i <- 0 until nx; j <- 0 until ny) yield {
        val (x0, y0, x1, y1) = (i.toDouble, j.toDouble, i + 1.0, j + 1.0)
        val pts = edgePts(x0, y0, x1, y0) ++ edgePts(x1, y0, x1, y1) ++
          edgePts(x1, y1, x0, y1) ++ edgePts(x0, y1, x0, y0) :+ ((x0, y0))
        val xy = pts.flatMap(p => Seq(p._1, p._2)).toArray
        Polygon(Array(xy))
      }
      // simplify: all collinear split points drop, every cell back to a
      // unit square; total area invariant
      val simp = Coverage.simplifyCoverage(cells.toIndexedSeq, 0.01)
      simp.foreach { g =>
        assert(math.abs(Measures.area(g) - 1.0) < 1e-12, s"trial $trial")
        assert(ringPts(g).length == 5, s"trial $trial: ${ringPts(g)}")
      }
      // union before simplify == overlay union == nx*ny
      val u = Coverage.unionCoverage(cells)
      assert(math.abs(Measures.area(u) - nx * ny) < 1e-12, s"trial $trial")
      val u2 = Coverage.unionCoverage(simp.toSeq)
      assert(math.abs(Measures.area(u2) - nx * ny) < 1e-12, s"trial $trial")
    }
  }

  test("invalidWitnesses: overlaps and triple edges flagged, valid coverages clean") {
    // valid grid (incl. shared edges) and lake+island (hole containment)
    // produce NO witnesses
    val grid = for (i <- 0 until 3; j <- 0 until 3) yield poly(
      s"POLYGON (($i $j, ${i + 1} $j, ${i + 1} ${j + 1}, $i ${j + 1}, $i $j))")
    assert(Coverage.invalidWitnesses(grid.toIndexedSeq).isEmpty)
    val lake = poly(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val island = poly("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(Coverage.invalidWitnesses(IndexedSeq(lake, island)).isEmpty)

    // interior overlap: both members flagged (plus T-node witnesses —
    // each member's corner lands mid-edge on the other)
    val a = poly("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = poly("POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))")
    val w1 = Coverage.invalidWitnesses(IndexedSeq(a, b))
    assert(w1.map(_._1).toSet == Set(0, 1), w1.toString)
    val ov = w1.filter(_._2.contains("overlap"))
    assert(ov.map(_._1).toSet == Set(0, 1), w1.toString)

    // duplicate polygon: its edges are traversed 3+ times once a shared
    // neighbor also uses one (dup of a alone = every edge twice → catch
    // via overlap instead: identical polygons contain each other's verts?
    // vertices lie ON the boundary, not strictly inside — so a triple
    // traversal is the witness: a, a-dup, and the neighbor sharing an edge)
    val neighbor = poly("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")
    val w2 = Coverage.invalidWitnesses(IndexedSeq(a, a, neighbor))
    assert(w2.exists(_._2.contains("3+")), w2.toString)
  }

  test("fuzz: dropping one seam vertex from a valid grid yields a T-node witness") {
    val rnd = new scala.util.Random(4321)
    var exercised = 0
    for (trial <- 0 until 20) {
      val nx = 2 + rnd.nextInt(3); val ny = 2 + rnd.nextInt(3)
      def splits(a: Double, b: Double, seed: Long): Seq[Double] = {
        val r2 = new scala.util.Random(seed)
        val k = r2.nextInt(3)
        val ts = Seq.fill(k)(0.1 + 0.8 * r2.nextDouble()).sorted
        ts.map(t => a + (b - a) * t)
      }
      def edgeSeed(x0: Double, y0: Double, x1: Double, y1: Double): Long =
        java.util.Objects.hash(trial: Integer, x0: java.lang.Double,
          y0: java.lang.Double, x1: java.lang.Double, y1: java.lang.Double).toLong
      def edgePts(x0: Double, y0: Double, x1: Double, y1: Double): Seq[(Double, Double)] = {
        val s = edgeSeed(math.min(x0, x1), math.min(y0, y1),
          math.max(x0, x1), math.max(y0, y1))
        val mids =
          if (y0 == y1) splits(math.min(x0, x1), math.max(x0, x1), s).map(x => (x, y0))
          else splits(math.min(y0, y1), math.max(y0, y1), s).map(y => (x0, y))
        val ordered = if (x0 < x1 || y0 < y1) mids else mids.reverse
        (x0, y0) +: ordered
      }
      val cells = (for (i <- 0 until nx; j <- 0 until ny) yield {
        val (x0, y0, x1, y1) = (i.toDouble, j.toDouble, i + 1.0, j + 1.0)
        val pts = edgePts(x0, y0, x1, y0) ++ edgePts(x1, y0, x1, y1) ++
          edgePts(x1, y1, x0, y1) ++ edgePts(x0, y1, x0, y0) :+ ((x0, y0))
        val xy = pts.flatMap(p => Seq(p._1, p._2)).toArray
        Polygon(Array(xy))
      }).toIndexedSeq
      assert(Coverage.invalidWitnesses(cells).forall(!_._2.contains("T-node")),
        s"trial $trial: valid grid must have no T-node witness")
      // corrupt: drop one split vertex from an INTERIOR vertical seam of
      // one cell (the neighbor keeps it -> classic T-node)
      val victim = (0 until nx * ny).find { idx =>
        val i = idx / ny
        i < nx - 1 && {
          val xy = cells(idx).rings(0)
          (0 until xy.length / 2).exists { p =>
            xy(2 * p) == i + 1.0 && xy(2 * p + 1) > idx % ny &&
              xy(2 * p + 1) < idx % ny + 1
          }
        }
      }
      victim.foreach { idx =>
        val i = idx / ny; val j = idx % ny
        val xy = cells(idx).rings(0)
        val drop = (0 until xy.length / 2).find { p =>
          xy(2 * p) == i + 1.0 && xy(2 * p + 1) > j && xy(2 * p + 1) < j + 1
        }.get
        val corrupted = xy.zipWithIndex
          .filterNot { case (_, k) => k == 2 * drop || k == 2 * drop + 1 }
          .map(_._1)
        val mutated = cells.updated(idx, Polygon(Array(corrupted)))
        val w = Coverage.invalidWitnesses(mutated)
        assert(w.exists { case (m, r) => m == idx && r.contains("T-node") },
          s"trial $trial: dropped seam vertex of member $idx not reported: $w")
        exercised += 1
      }
    }
    assert(exercised >= 10, s"only $exercised trials had a splittable seam")
  }

  test("invalidWitnesses: T-node seam mismatch reported, noded seam clean") {
    // B spans half of A's right edge: B's corner (2,1) sits in the
    // INTERIOR of A's edge (2,0)-(2,2) with no matching vertex in A —
    // the seam-mismatch class coverageSimplify corrupts silently. No
    // overlap anywhere, so the T-node is the only witness; the member
    // whose edge is missing the node (A) is flagged.
    val a = poly("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val half = poly("POLYGON ((2 0, 4 0, 4 1, 2 1, 2 0))")
    val w = Coverage.invalidWitnesses(IndexedSeq(a, half))
    assert(w == Seq(0 -> "edge missing node at a vertex of member 1 (T-node)"), w)

    // same geometry with A's seam edge noded at (2,1): valid, no witness
    val noded = poly("POLYGON ((0 0, 2 0, 2 1, 2 2, 0 2, 0 0))")
    assert(Coverage.invalidWitnesses(IndexedSeq(noded, half)).isEmpty)

    // midpoint-decorated seam where BOTH sides carry the vertex: clean
    val l = poly("POLYGON ((0 0, 2 0, 2 1, 2 2, 0 2, 0 0))")
    val r = poly("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 1, 2 0))")
    assert(Coverage.invalidWitnesses(IndexedSeq(l, r)).isEmpty)
  }

  test("non-polygonal members and tiny rings pass through") {
    val ln = Wkt.read("LINESTRING (0 0, 1 1)")
    val tri = poly("POLYGON ((0 0, 1 0, 0 1, 0 0))")
    val out = Coverage.simplifyCoverage(IndexedSeq(ln, tri), 5.0)
    assert(Wkt.write(out(0)) == "LINESTRING (0 0, 1 1)")
    assert(Measures.area(out(1)) == 0.5) // triangle survives the guard
  }
}
