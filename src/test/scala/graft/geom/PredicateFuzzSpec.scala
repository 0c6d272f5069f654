package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial randomized sweep over the PREDICATE kernels, the dual of
  * OverlayFuzzSpec: where that spec verifies overlay results against the
  * predicate kernels, this one verifies the predicates against three
  * INDEPENDENT code paths —
  *
  *   1. distance algebra: intersects(a,b) ⇔ distance(a,b) == 0 (the
  *      distance kernel is segment-pairwise, sharing nothing with the
  *      boundary-walk predicates);
  *   2. overlay areas: contains ⇒ area(A∩B)=area(B); touches ⇒
  *      area(A∩B)=0; overlaps ⇒ all three of area(A∩B), area(A\B),
  *      area(B\A) strictly positive;
  *   3. DE-9IM self-consistency: relate(a,b) is the transpose of
  *      relate(b,a), and the standard named-predicate patterns evaluated
  *      over the matrix agree with the predicate functions (catches
  *      derivation bugs in individual matrix cells).
  *
  * Same lattice-biased generator families as OverlayFuzzSpec (rect,
  * triangle, convex radial, concave star, sliver, L-shape; paired as
  * independent / translated copy / jittered copy / same-anchor / exact
  * copy) so collinear edges, shared vertices and whole shared boundaries
  * occur constantly.
  */
class PredicateFuzzSpec extends AnyFunSuite {

  private var state = 0x12345678AL
  private def nextLong(): Long = {
    state = graft.sql.TextKernel.mix64(state + 0x9e3779b97f4a7c15L)
    state
  }
  private def nextInt(n: Int): Int = ((nextLong() >>> 33) % n).toInt
  private def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble

  private def genPoly(kind: Int, cx: Double, cy: Double): Polygon = {
    def lat(v: Double): Double = math.rint(v * 2.0) / 2.0
    kind match {
      case 0 =>
        val w = 1.0 + nextInt(8); val h = 1.0 + nextInt(8)
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + h, cx, cy + h, cx, cy)))
      case 1 =>
        val w = 1.0 + nextInt(8); val h = 1.0 + nextInt(8)
        val ax = lat(cx + nextDouble() * w)
        Polygon(Array(Array(cx, cy, cx + w, cy, ax, cy + h, cx, cy)))
      case 2 =>
        val n = 5 + nextInt(5)
        val r = 2.0 + nextInt(4)
        val pts = (0 until n).map { i =>
          val th = 2.0 * math.Pi * i / n
          (lat(cx + r * math.cos(th)), lat(cy + r * math.sin(th)))
        }
        val d = pts.zipWithIndex.filter { case (p, i) => p != pts((i + 1) % n) }.map(_._1)
        if (d.size < 3) genPoly(0, cx, cy)
        else Polygon(Array(d.flatMap(p => Seq(p._1, p._2)).toArray ++ Array(d.head._1, d.head._2)))
      case 3 =>
        val n = 4 + nextInt(4)
        val pts = (0 until 2 * n).map { i =>
          val th = math.Pi * i / n
          val r = if (i % 2 == 0) 3.0 + nextInt(3) else 1.0 + nextInt(2)
          (lat(cx + r * math.cos(th)), lat(cy + r * math.sin(th)))
        }
        val d = pts.zipWithIndex.filter { case (p, i) => p != pts((i + 1) % (2 * n)) }.map(_._1)
        if (d.size < 3) genPoly(0, cx, cy)
        else Polygon(Array(d.flatMap(p => Seq(p._1, p._2)).toArray ++ Array(d.head._1, d.head._2)))
      case 4 =>
        val w = 1.0 + nextInt(6)
        val eps = math.pow(10.0, -(3 + nextInt(5)))
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + eps, cx, cy + eps, cx, cy)))
      case 5 =>
        val w = 2.0 + nextInt(6)
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + w / 2, cx + w / 2, cy + w / 2,
          cx + w / 2, cy + w, cx, cy + w, cx, cy)))
      case _ =>
        // square with a hole: the family that catches hole-ring-only
        // contacts (a polygonsIntersect defect hid here — shell-only ring
        // crossing tests never see an operand poking into the hole)
        val w = 3.0 + nextInt(6)
        val h1 = 0.5 + nextInt(2) * 0.5
        Polygon(Array(
          Array(cx, cy, cx + w, cy, cx + w, cy + w, cx, cy + w, cx, cy),
          Array(cx + h1, cy + h1, cx + h1, cy + w - h1,
            cx + w - h1, cy + w - h1, cx + w - h1, cy + h1, cx + h1, cy + h1)))
    }
  }

  private def translate(p: Polygon, dx: Double, dy: Double): Polygon =
    Polygon(p.rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0
      while (i < r.length) { out(i) = r(i) + dx; out(i + 1) = r(i + 1) + dy; i += 2 }
      out
    })

  private def jitter(p: Polygon, scale: Double): Polygon =
    Polygon(p.rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0
      while (i + 1 < r.length - 2) {
        out(i) = r(i) + (nextDouble() - 0.5) * scale
        out(i + 1) = r(i + 1) + (nextDouble() - 0.5) * scale
        i += 2
      }
      out(r.length - 2) = out(0); out(r.length - 1) = out(1)
      out
    })

  private def transpose(m: String): String =
    Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8)).mkString

  test("seeded predicate sweep: distance, overlay-area, and DE-9IM consistency") {
    val pairs = 900
    var i = 0
    var distChecks = 0
    var areaChecks = 0
    while (i < pairs) {
      val a = genPoly(nextInt(7), nextInt(5).toDouble, nextInt(5).toDouble)
      val b = nextInt(5) match {
        case 0 => genPoly(nextInt(7), nextInt(5).toDouble, nextInt(5).toDouble)
        case 1 => translate(a, nextInt(4) * 0.5, nextInt(4) * 0.5)
        case 2 => jitter(a, 1e-12)
        case 3 => genPoly(nextInt(7), a.rings(0)(0), a.rings(0)(1))
        case _ => a.copy()
      }
      def ctx = s"pair $i:\n  A=${Wkt.write(a)}\n  B=${Wkt.write(b)}"

      // 1. distance differential (independent kernel)
      val inter = Predicates.intersects(a, b)
      val d = Measures.distance(a, b)
      assert(inter == (d == 0.0), s"intersects=$inter but distance=$d $ctx")
      distChecks += 1

      // 2. overlay-area differentials (independent kernel). Sliver areas
      // sit at fp noise, so area implications gate on a scale-aware tol.
      val aA = Measures.area(a); val aB = Measures.area(b)
      val tol = 1e-9 * math.max(1.0, math.max(aA, aB))
      lazy val aI = Measures.area(Overlay.intersection(a, b))
      if (Predicates.contains(a, b)) {
        assert(math.abs(aI - aB) <= tol, s"contains but area(A∩B)=$aI != area(B)=$aB $ctx")
        areaChecks += 1
      }
      if (Predicates.touches(a, b)) {
        assert(aI <= tol, s"touches but area(A∩B)=$aI > 0 $ctx")
        assert(d == 0.0, s"touches but distance=$d $ctx")
        areaChecks += 1
      }
      if (Predicates.overlaps(a, b)) {
        val dab = Measures.area(Overlay.difference(a, b))
        val dba = Measures.area(Overlay.difference(b, a))
        assert(aI > -tol && dab > -tol && dba > -tol,
          s"overlaps but a piece is empty: ∩=$aI A\\B=$dab B\\A=$dba $ctx")
        // strictly-positive with fp slack: interiors intersect and neither
        // covers the other, so no piece may vanish beyond noise
        assert(aI + tol >= 0 && dab + tol >= 0 && dba + tol >= 0, ctx)
        areaChecks += 1
      }

      // 3. DE-9IM: transpose symmetry + named patterns vs predicates
      val m = Predicates.relate(a, b)
      val mT = Predicates.relate(b, a)
      assert(transpose(m) == mT, s"relate not transpose-symmetric: $m vs $mT $ctx")
      assert(Predicates.relatePattern(a, b, "FF*FF****") == !inter,
        s"disjoint pattern vs intersects: $m $ctx")
      assert(Predicates.relatePattern(a, b, "T*****FF*") == Predicates.contains(a, b),
        s"contains pattern vs kernel: $m $ctx")
      assert(Predicates.relatePattern(a, b, "T*F**F***") == Predicates.within(a, b),
        s"within pattern vs kernel: $m $ctx")
      assert((inter && m(0) == 'F') == Predicates.touches(a, b),
        s"touches (II=F ∧ intersects) vs kernel: $m $ctx")
      assert(Predicates.relatePattern(a, b, "T*T***T**") == Predicates.overlaps(a, b),
        s"overlaps pattern vs kernel: $m $ctx")
      assert(Predicates.relatePattern(a, b, "T*F**FFF*") == Predicates.geomEquals(a, b),
        s"equals pattern vs kernel: $m $ctx")
      i += 1
    }
    info(s"$pairs pairs, $distChecks distance checks, $areaChecks area-implication checks")
    assert(areaChecks > 100, s"only $areaChecks area implications fired — pairing mix too disjoint")
  }

  test("mixed-dimension relate: transpose symmetry and canonical point/line matrices") {
    var i = 0
    var inside = 0; var onB = 0; var outside = 0
    while (i < 500) {
      val a = genPoly(nextInt(7), nextInt(5).toDouble, nextInt(5).toDouble)
      // bias points onto vertices (boundary) half the time
      val p =
        if (nextInt(2) == 0) Point(a.rings(0)(0), a.rings(0)(1))
        else Point(nextDouble() * 14 - 2, nextDouble() * 14 - 2)
      val loc = Predicates.pointInPolygon(p.x, p.y, a)
      val m = Predicates.relate(p, a)
      val mT = Predicates.relate(a, p)
      assert(transpose(m) == mT, s"p/poly transpose: $m vs $mT at (${p.x},${p.y}) A=${Wkt.write(a)}")
      // canonical DE-9IM for point vs area (GEOS): inside 0FFFFF212,
      // boundary F0FFFF212, outside FF0FFF212
      val want =
        if (loc == Predicates.IN) { inside += 1; "0FFFFF212" }
        else if (loc == Predicates.ON) { onB += 1; "F0FFFF212" }
        else { outside += 1; "FF0FFF212" }
      assert(m == want, s"point/poly matrix $m != $want at (${p.x},${p.y}) A=${Wkt.write(a)}")

      // line vs polygon: transpose symmetry + pattern/kernel agreement
      val l = LineString(Array(nextDouble() * 14 - 2, nextDouble() * 14 - 2,
        nextDouble() * 14 - 2, nextDouble() * 14 - 2))
      val lm = Predicates.relate(l, a)
      assert(transpose(lm) == Predicates.relate(a, l),
        s"line/poly transpose: $lm L=${Wkt.write(l)} A=${Wkt.write(a)}")
      assert(Predicates.relatePattern(l, a, "FF*FF****") == !Predicates.intersects(l, a),
        s"line/poly disjoint pattern $lm")
      assert(Predicates.relatePattern(l, a, "T*F**F***") == Predicates.within(l, a),
        s"line/poly within pattern $lm L=${Wkt.write(l)} A=${Wkt.write(a)}")

      // multipoint vs polygon: matrix cells straight from per-point
      // classification (fuzzes the pointish construction's aggregation)
      val mp = MultiPoint(Array.fill(1 + nextInt(4))(
        if (nextInt(3) == 0) Point(a.rings(0)(0), a.rings(0)(1))
        else Point(nextDouble() * 14 - 2, nextDouble() * 14 - 2)).distinct)
      val mpm = Predicates.relate(mp, a)
      assert(transpose(mpm) == Predicates.relate(a, mp),
        s"mp/poly transpose: $mpm MP=${Wkt.write(mp)} A=${Wkt.write(a)}")
      val locs = mp.pts.map(q => Predicates.pointInPolygon(q.x, q.y, a))
      assert((mpm(0) == '0') == locs.contains(Predicates.IN),
        s"mp II cell: $mpm MP=${Wkt.write(mp)} A=${Wkt.write(a)}")
      assert((mpm(1) == '0') == locs.contains(Predicates.ON),
        s"mp IB cell: $mpm MP=${Wkt.write(mp)} A=${Wkt.write(a)}")
      assert((mpm(2) == '0') == locs.contains(Predicates.OUT),
        s"mp IE cell: $mpm MP=${Wkt.write(mp)} A=${Wkt.write(a)}")
      assert(mpm.substring(3, 6) == "FFF" && mpm(6) == '2' && mpm(8) == '2',
        s"mp fixed cells: $mpm")

      // line vs line: transpose + named predicates against the matrix
      val l2 = LineString(Array(nextDouble() * 14 - 2, nextDouble() * 14 - 2,
        nextDouble() * 14 - 2, nextDouble() * 14 - 2))
      val ll = Predicates.relate(l, l2)
      def llctx = s"$ll L1=${Wkt.write(l)} L2=${Wkt.write(l2)}"
      assert(transpose(ll) == Predicates.relate(l2, l), s"line/line transpose: $llctx")
      val cr = Predicates.crosses(l, l2)
      val to = Predicates.touches(l, l2)
      assert(!(cr && to), s"crosses and touches both true: $llctx")
      if (cr || to) assert(Predicates.intersects(l, l2), s"cr/to imply intersects: $llctx")
      // GEOS: lines cross iff their interiors meet in a POINT
      assert(cr == (ll(0) == '0'), s"crosses vs II cell: $llctx")
      assert(to == (Predicates.intersects(l, l2) && ll(0) == 'F'),
        s"touches vs II cell: $llctx")
      assert(Predicates.relatePattern(l, l2, "1*T***T**") == Predicates.overlaps(l, l2),
        s"line overlaps pattern: $llctx")
      assert(Predicates.relatePattern(l, l2, "T*F**F***") == Predicates.within(l, l2),
        s"line within pattern: $llctx")
      // line vs polygon crosses: interior meets interior AND exits
      assert(Predicates.crosses(l, a) ==
        (Predicates.relatePattern(l, a, "T*T******")),
        s"line/poly crosses pattern: ${Predicates.relate(l, a)} L=${Wkt.write(l)} A=${Wkt.write(a)}")
      i += 1
    }
    info(s"point classifications: $inside inside, $onB boundary, $outside outside")
    assert(inside >= 10 && onB > 100 && outside > 100, "classification mix degenerate")
  }

  test("point and line predicates against distance and containment sampling") {
    var i = 0
    while (i < 400) {
      val a = genPoly(nextInt(7), nextInt(5).toDouble, nextInt(5).toDouble)
      val px = nextDouble() * 14.0 - 2.0
      val py = nextDouble() * 14.0 - 2.0
      val p = Point(px, py)
      val d = Measures.distance(a, p)
      assert(Predicates.intersects(a, p) == (d == 0.0),
        s"point-in-poly vs distance at ($px,$py): d=$d A=${Wkt.write(a)}")
      assert(Predicates.covers(a, p) == Predicates.intersects(a, p),
        s"covers(poly,point) must equal intersects A=${Wkt.write(a)} p=($px,$py)")
      // a chord between two interior points stays within a CONVEX polygon
      val l = LineString(Array(px, py, px + nextDouble() * 4 - 2, py + nextDouble() * 4 - 2))
      val dl = Measures.distance(a, l)
      assert(Predicates.intersects(a, l) == (dl == 0.0),
        s"line-poly intersects vs distance: d=$dl A=${Wkt.write(a)} L=${Wkt.write(l)}")
      i += 1
    }
  }
}
