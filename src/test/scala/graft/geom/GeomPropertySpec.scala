package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests over the pure kernels — the cheap wins the
  * reference lacks (SURVEY §5): predicate algebra, SFC bijectivity, and
  * roundtrip stability under seeded random inputs.
  */
class GeomPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def coord(): Double = rnd.nextDouble() * 2000.0 - 1000.0
  private def smallPos(): Double = rnd.nextDouble() * 49.5 + 0.5
  private def box(): Polygon = {
    val x = coord(); val y = coord()
    Polygon.box(x, y, x + smallPos(), y + smallPos())
  }
  private def point(): Point = Point(coord(), coord())
  private val N = 300

  test("intersects and disjoint are symmetric and complementary") {
    (1 to N).foreach { _ =>
      val a = box(); val b = box()
      assert(Predicates.intersects(a, b) == Predicates.intersects(b, a))
      assert(Predicates.disjoint(a, b) == !Predicates.intersects(a, b))
    }
  }

  test("contains/within duality and covers implication") {
    (1 to N).foreach { _ =>
      val a = box(); val b = box()
      assert(Predicates.contains(a, b) == Predicates.within(b, a))
      assert(Predicates.covers(a, b) == Predicates.coveredBy(b, a))
      if (Predicates.contains(a, b)) assert(Predicates.covers(a, b))
      if (Predicates.containsProperly(a, b)) assert(Predicates.contains(a, b))
    }
  }

  test("touches and overlaps are mutually exclusive and imply intersects") {
    (1 to N).foreach { _ =>
      val a = box(); val b = box()
      val t = Predicates.touches(a, b)
      val o = Predicates.overlaps(a, b)
      assert(!(t && o), s"touches and overlaps both true for $a / $b")
      if (t || o) assert(Predicates.intersects(a, b))
    }
  }

  test("overlay areas respect inclusion-exclusion for boxes") {
    (1 to N).foreach { _ =>
      val a = box(); val b = box()
      val ia = Measures.area(a); val ib = Measures.area(b)
      val inter = Measures.area(Overlay.intersection(a, b))
      val uni = Measures.area(Overlay.union(a, b))
      assert(math.abs(uni - (ia + ib - inter)) < 1e-6 * math.max(1.0, ia + ib),
        s"union area inclusion-exclusion failed for $a / $b")
      val diff = Measures.area(Overlay.difference(a, b))
      assert(math.abs(diff - (ia - inter)) < 1e-6 * math.max(1.0, ia))
    }
  }

  test("distance is symmetric, non-negative, zero iff intersecting (boxes)") {
    (1 to N).foreach { _ =>
      val a = box(); val b = box()
      val d = Measures.distance(a, b)
      assert(d >= 0)
      assert(math.abs(d - Measures.distance(b, a)) < 1e-9)
      if (Predicates.intersects(a, b)) assert(d == 0.0)
      else assert(d > 0.0)
    }
  }

  test("hilbert and morton are bijective on the level-5 grid") {
    val n = 1 << 5
    val hs = for (x <- 0 until n; y <- 0 until n) yield Sfc.hilbertXY2D(5, x, y)
    assert(hs.distinct.length == n * n)
    assert(hs.min == 0 && hs.max == n * n - 1)
    val ms = for (x <- 0 until n; y <- 0 until n) yield Sfc.mortonXY(x, y)
    assert(ms.distinct.length == n * n)
  }

  test("wkt roundtrip is identity across all geometry types with random coords") {
    def rc(): Double = math.rint(coord() * 1e6) / 1e6 // wkt prints 6+ sig figs exactly
    (1 to 100).foreach { _ =>
      val geoms: Seq[Geometry] = Seq(
        Point(rc(), rc()),
        LineString(Array(rc(), rc(), rc(), rc(), rc(), rc())),
        { val x = rc(); val y = rc(); Polygon.box(x, y, x + smallPos(), y + smallPos()) },
        MultiPoint(Array(Point(rc(), rc()), Point(rc(), rc()))),
        MultiLineString(Array(
          LineString(Array(rc(), rc(), rc(), rc())),
          LineString(Array(rc(), rc(), rc(), rc())))),
        { val x = rc(); val y = rc()
          MultiPolygon(Array(Polygon.box(x, y, x + 1, y + 1),
            Polygon.box(x + 5, y + 5, x + 6, y + 6))) },
        GeometryCollection(Array(Point(rc(), rc()),
          LineString(Array(rc(), rc(), rc(), rc())))))
      geoms.foreach { g =>
        val back = Wkt.read(Wkt.write(g))
        assert(Predicates.geomEqualsExact(back, g, 0.0),
          s"wkt roundtrip changed ${Wkt.write(g)} -> ${Wkt.write(back)}")
      }
    }
  }

  test("wkb roundtrip is identity for random points and boxes") {
    (1 to N).foreach { _ =>
      val p = point()
      assert(Predicates.geomEqualsExact(Wkb.read(Wkb.write(p)), p, 0.0))
      val b = box()
      assert(Predicates.geomEqualsExact(Wkb.read(Wkb.write(b)), b, 0.0))
    }
  }

  test("affine roundtrip: rotate +a then -a preserves coordinates") {
    (1 to N).foreach { _ =>
      val p = point()
      val ang = rnd.nextDouble() * 360.0 - 180.0
      val back = Constructive.rotate(Constructive.rotate(p, ang, 0, 0), -ang, 0, 0)
      assert(Predicates.geomEqualsExact(back, p, 1e-6))
    }
  }

  test("overlay inclusion-exclusion holds on random rectangle pairs under jitter") {
    def jitterRing(r: Array[Double], scale: Double): Array[Double] = {
      val out = new Array[Double](r.length)
      var i = 0
      while (i + 1 < r.length - 2) {
        out(i) = r(i) + (rnd.nextDouble() * 2 - 1) * scale
        out(i + 1) = r(i + 1) + (rnd.nextDouble() * 2 - 1) * scale
        i += 2
      }
      out(r.length - 2) = out(0); out(r.length - 1) = out(1)
      out
    }
    (1 to 200).foreach { k =>
      val a0 = box()
      // half the pairs overlap/touch a0's neighborhood, half are anywhere
      val b0 = if (k % 2 == 0) box() else {
        val e = a0.envelope
        val x0 = e.minX + rnd.nextDouble() * 20 - 10
        val x1 = e.maxX + rnd.nextDouble() * 20 - 10
        val y0 = e.minY + rnd.nextDouble() * 20 - 10
        val y1 = e.maxY + rnd.nextDouble() * 20 - 10
        Polygon.box(math.min(x0, x1), math.min(y0, y1),
          math.max(x0, x1) + 0.1, math.max(y0, y1) + 0.1)
      }
      val a = Polygon(a0.rings.map(jitterRing(_, 1e-12)))
      val b = Polygon(b0.rings.map(jitterRing(_, 1e-12)))
      val ia = Measures.area(a); val ib = Measures.area(b)
      val int = Measures.area(Overlay.intersection(a, b))
      val un = Measures.area(Overlay.union(a, b))
      val da = Measures.area(Overlay.difference(a, b))
      val db = Measures.area(Overlay.difference(b, a))
      val tol = 1e-6 * math.max(1.0, ia + ib)
      assert(math.abs(un - (ia + ib - int)) < tol, s"union i-e: $un vs ${ia + ib - int}")
      assert(math.abs(da - (ia - int)) < tol, s"difference i-e: $da vs ${ia - int}")
      assert(math.abs(db - (ib - int)) < tol, s"reverse difference i-e")
      assert(int >= -tol && int <= math.min(ia, ib) + tol, s"intersection bounds")
    }
  }

  test("split polygon by random line conserves area (arbitrary float coords)") {
    (1 to N).foreach { k =>
      val b = box()
      val e = b.envelope
      // a random line guaranteed to span the box horizontally, with
      // arbitrary (non-round) endpoints and slope
      val y1 = e.minY + rnd.nextDouble() * e.height
      val y2 = e.minY + rnd.nextDouble() * e.height
      val cut = LineString(Array(e.minX - 1.0 - rnd.nextDouble(), y1,
        e.maxX + 1.0 + rnd.nextDouble(), y2))
      val parts = Constructive.split(b, cut)
      val sum = parts.geoms.map(Measures.area).sum
      val tol = 1e-6 * Measures.area(b)
      assert(math.abs(sum - Measures.area(b)) < tol,
        s"iter $k: parts ${parts.geoms.length}, area $sum != ${Measures.area(b)}")
      assert(parts.geoms.length == 2, s"iter $k: expected 2 parts, got ${parts.geoms.length}")
      parts.geoms.foreach { p =>
        val ip = Constructive.pointOnSurface(p)
        assert(Predicates.within(ip, b), s"iter $k: part interior escapes the input")
      }
    }
  }

  test("lineSubstring: length proportional, endpoints = interpolate, composition") {
    (1 to N).foreach { _ =>
      val nPts = 2 + rnd.nextInt(8)
      val xy = Array.fill(nPts * 2)(coord())
      val l = LineString(xy)
      val total = Measures.pathLength(xy)
      if (total > 0) {
        val a = rnd.nextDouble(); val b = rnd.nextDouble()
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        Constructive.lineSubstring(l, lo, hi) match {
          case sub: LineString if !sub.isEmpty =>
            val tol = 1e-6 * total
            assert(math.abs(Measures.pathLength(sub.xy) - (hi - lo) * total) < tol,
              s"substring length != (hi-lo)*total for [$lo,$hi]")
            val s = Constructive.lineInterpolatePoint(l, lo, normalized = true)
            val e = Constructive.lineInterpolatePoint(l, hi, normalized = true)
            assert(math.hypot(sub.xy(0) - s.x, sub.xy(1) - s.y) < tol, "start")
            assert(math.hypot(sub.xy(sub.xy.length - 2) - e.x,
              sub.xy(sub.xy.length - 1) - e.y) < tol, "end")
          case p: Point =>
            // degenerate window (lo == hi up to fp) collapses to a point
            assert(hi - lo < 1e-12)
          case other => fail(s"unexpected $other")
        }
      }
    }
  }
}
