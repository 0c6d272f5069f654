package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomKernelSpec extends AnyFunSuite {

  private val tri = Wkt.read("POLYGON ((0 0, 4 0, 0 4, 0 0))")
  private val sq = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
  private val donut = Wkt.read(
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")

  test("wkt roundtrip") {
    val samples = Seq(
      "POINT (1 2)", "POINT EMPTY", "POINT Z (1 2 3)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
      "GEOMETRYCOLLECTION EMPTY")
    samples.foreach { s => assert(Wkt.write(Wkt.read(s)) == s, s"roundtrip of $s") }
  }

  test("wkb roundtrip preserves wkt") {
    val samples = Seq(
      "POINT (1.5 -2.25)", "POINT Z (1 2 3)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    samples.foreach { s =>
      assert(Wkt.write(Wkb.read(Wkb.write(Wkt.read(s)))) == s)
    }
  }

  test("geojson roundtrip preserves wkt across all types") {
    val samples = Seq(
      "POINT (1.5 -2.25)", "POINT Z (1 2 3)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (-5 2, 3 -4))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
      "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    samples.foreach { s =>
      assert(Wkt.write(GeoJson.read(GeoJson.write(Wkt.read(s)))) == s, s)
    }
    // empty point: empty coordinates array both ways
    assert(GeoJson.write(Point.empty) == """{"type":"Point","coordinates":[]}""")
    assert(GeoJson.read("""{"type":"Point","coordinates":[]}""").isEmpty)
    // standard external form parses
    val g = GeoJson.read("""{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}""")
    assert(Measures.area(g) == 16.0)
  }

  test("wkb envelopeOf matches read().envelope for every geometry shape") {
    val samples = Seq(
      "POINT (1.5 -2.25)", "POINT Z (1 2 3)",
      "LINESTRING (0 0, 1 1, 2 0)",
      // hole coords outside the gather: envelope must come from the shell
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 9, 5 9, 5 5)))",
      "MULTILINESTRING ((0 0, 1 1), (-5 2, 3 -4))",
      "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
    samples.foreach { s =>
      val bytes = Wkb.write(Wkt.read(s))
      assert(Wkb.envelopeOf(bytes) == Wkb.read(bytes).envelope, s)
    }
    // empty point contributes nothing (empty envelope)
    val emptyPt = Wkb.write(Point.empty)
    assert(Wkb.envelopeOf(emptyPt).isEmpty)
    // random property sweep
    val rnd = new scala.util.Random(17)
    (1 to 200).foreach { _ =>
      val n = 2 * (2 + rnd.nextInt(8))
      val l = LineString(Array.fill(n)(rnd.nextDouble() * 2e6 - 1e6))
      val bytes = Wkb.write(l)
      assert(Wkb.envelopeOf(bytes) == Wkb.read(bytes).envelope)
    }
  }

  test("wkb roundtrip property (random lines)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 2 * (1 + rnd.nextInt(8))
      val l = LineString(Array.fill(n)(rnd.nextDouble() * 2e6 - 1e6))
      val back = Wkb.read(Wkb.write(l)).asInstanceOf[LineString]
      assert(back.xy.sameElements(l.xy))
    }
  }

  test("area / perimeter / length") {
    assert(Measures.area(tri) == 8.0)
    assert(Measures.area(sq) == 4.0)
    assert(Measures.area(donut) == 96.0)
    assert(Measures.perimeter(sq) == 8.0)
    assert(Measures.length(Wkt.read("LINESTRING (0 0, 3 4)")) == 5.0)
  }

  test("centroid") {
    val c = Constructive.centroid(tri)
    assert(math.abs(c.x - 4.0 / 3) < 1e-12 && math.abs(c.y - 4.0 / 3) < 1e-12)
    val c2 = Constructive.centroid(Wkt.read("MULTIPOINT ((0 0), (2 0), (1 3))"))
    assert(c2.x == 1.0 && c2.y == 1.0)
    // donut centroid stays at center
    val c3 = Constructive.centroid(donut)
    assert(math.abs(c3.x - 5.0) < 1e-12 && math.abs(c3.y - 5.0) < 1e-12)
  }

  test("point in polygon incl. holes and boundary") {
    assert(Predicates.pointInPolygon(1, 1, tri.asInstanceOf[Polygon]) == Predicates.IN)
    assert(Predicates.pointInPolygon(2, 2, tri.asInstanceOf[Polygon]) == Predicates.ON)
    assert(Predicates.pointInPolygon(3, 3, tri.asInstanceOf[Polygon]) == Predicates.OUT)
    val d = donut.asInstanceOf[Polygon]
    assert(Predicates.pointInPolygon(5, 5, d) == Predicates.OUT) // in hole
    assert(Predicates.pointInPolygon(2, 2, d) == Predicates.IN)
    assert(Predicates.pointInPolygon(4, 5, d) == Predicates.ON) // hole boundary
  }

  test("predicates: intersects/contains/within/touches/overlaps/crosses") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = Wkt.read("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    val c = Wkt.read("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))") // shares edge with a
    val inner = Wkt.read("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(Predicates.intersects(a, b))
    assert(Predicates.overlaps(a, b))
    assert(!Predicates.contains(a, b))
    assert(Predicates.contains(a, inner))
    assert(Predicates.within(inner, a))
    assert(Predicates.covers(a, inner))
    assert(Predicates.touches(a, c))
    assert(!Predicates.overlaps(a, c))
    val line = Wkt.read("LINESTRING (-1 2, 5 2)")
    assert(Predicates.crosses(line, a))
    assert(!Predicates.crosses(line, Wkt.read("LINESTRING (-1 3, 5 3)")))
    assert(Predicates.crosses(line, Wkt.read("LINESTRING (2 -1, 2 5)")))
    // point predicates
    val p = Point(2, 2)
    assert(Predicates.intersects(p, a))
    assert(Predicates.contains(a, p))
    assert(Predicates.touches(Point(0, 0), a))
    assert(!Predicates.contains(a, Point(0, 0))) // on boundary
    assert(Predicates.covers(a, Point(0, 0)))
  }

  test("multi-part line covers/contains: mod-2 chaining rule and union spans") {
    // two parts chained at (2,0): the chain point is INTERIOR by the DE-9IM
    // mod-2 boundary rule (even endpoint multiplicity), so contains holds
    val chained = Wkt.read("MULTILINESTRING ((0 0, 2 0), (2 0, 4 0))")
    assert(Predicates.covers(chained, Point(2, 0)))
    assert(Predicates.contains(chained, Point(2, 0)))
    // true endpoints stay boundary: covered but not contained
    assert(Predicates.covers(chained, Point(0, 0)))
    assert(!Predicates.contains(chained, Point(0, 0)))
    // a span covered only by the UNION of the touching parts (no single
    // part covers it alone)
    val span = Wkt.read("LINESTRING (1 0, 3 0)")
    assert(Predicates.covers(chained, span))
    assert(Predicates.contains(chained, span))
    // and a span escaping the union is rejected
    assert(!Predicates.covers(chained, Wkt.read("LINESTRING (3 0, 5 0)")))
    // gap between parts: midpoint of the covering sample is off both parts
    val gapped = Wkt.read("MULTILINESTRING ((0 0, 1.5 0), (2.5 0, 4 0))")
    assert(!Predicates.covers(gapped, Wkt.read("LINESTRING (1 0, 3 0)")))
  }

  test("randomized: multi-part line covers agrees with lineMinusLine emptiness") {
    // cross-kernel consistency: if the union of a's chained parts covers
    // span b, then b \ a must be empty — and vice versa. Exercises the r8
    // union-sampling covers path against the exact interval-merge
    // difference kernel on 200 random chain/span configurations.
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      // a: a chain of 2-4 collinear parts along y=0 with random breakpoints,
      // adjacent (sharing endpoints) or gapped
      val nParts = 2 + rnd.nextInt(3)
      var cursor = rnd.nextInt(5).toDouble
      val parts = (0 until nParts).map { _ =>
        val len = 1 + rnd.nextInt(4)
        val s = cursor
        cursor += len
        if (rnd.nextBoolean()) cursor += rnd.nextInt(2) // maybe a gap after
        LineString(Array(s, 0.0, s + len, 0.0))
      }
      val a: Geometry = MultiLineString(parts.toArray)
      val s0 = rnd.nextInt(14).toDouble
      val b = LineString(Array(s0, 0.0, s0 + 1 + rnd.nextInt(3), 0.0))
      val covered = Predicates.covers(a, b)
      val residue = Measures.length(Overlay.difference(b, a))
      if (covered)
        assert(residue < 1e-9, s"covers=$covered but |b\\a|=$residue for a=$a b=$b")
      else
        assert(residue > 1e-9, s"covers=$covered but |b\\a|=$residue for a=$a b=$b")
    }
  }

  test("single-part a covers multi-part b; GC-of-lines geomEquals not vacuous") {
    // decompose-b mirror: every part of b on a
    val a = Wkt.read("LINESTRING (0 0, 3 0)")
    assert(Predicates.covers(a, Wkt.read("MULTILINESTRING ((0 0, 1 0), (2 0, 3 0))")))
    assert(!Predicates.covers(a, Wkt.read("MULTILINESTRING ((0 0, 1 0), (2 0, 4 0))")))
    assert(Predicates.covers(a, Wkt.read("MULTIPOINT (0 0, 1.5 0, 3 0)")))
    assert(Predicates.contains(a, Wkt.read("MULTIPOINT (1 0, 1.5 0)")))
    // GEOS semantics: one member on the boundary + one in the interior IS
    // contained (covers everywhere + interior contact somewhere)
    assert(Predicates.contains(a, Wkt.read("MULTIPOINT (0 0, 1.5 0)")))
    // boundary-only contact is covered but NOT contained
    assert(Predicates.covers(a, Wkt.read("MULTIPOINT (0 0, 3 0)")))
    assert(!Predicates.contains(a, Wkt.read("MULTIPOINT (0 0, 3 0)")))
    // geomEquals over collections of lines must compare paths, not pass
    // vacuously on empty ring sets
    val gc1 = Wkt.read("GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1))")
    val gc2 = Wkt.read("GEOMETRYCOLLECTION (LINESTRING (0 0, 1 0, 1 1))")
    assert(!Predicates.geomEquals(gc1, gc2))
    assert(Predicates.geomEquals(gc1,
      Wkt.read("GEOMETRYCOLLECTION (LINESTRING (0 0, 0.5 0.5), LINESTRING (0.5 0.5, 1 1))")))
    // point members participate as point sets: on-path = redundant,
    // off-path breaks equality
    assert(Predicates.geomEquals(
      Wkt.read("GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1), POINT (0.5 0.5))"),
      Wkt.read("LINESTRING (0 0, 1 1)")))
    assert(!Predicates.geomEquals(
      Wkt.read("GEOMETRYCOLLECTION (LINESTRING (0 0, 1 1), POINT (1 0))"),
      Wkt.read("LINESTRING (0 0, 1 1)")))
  }

  test("randomized: line intersection/difference conserve length") {
    // |a ∩ b| + |a \ b| = |a| for random collinear multi-part families —
    // catches interval-merge/emission defects (the r8 duplicate-span bug
    // would double-count the intersection side and break this exactly)
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 200) {
      def randomChain(): Geometry = {
        val n = 1 + rnd.nextInt(3)
        val parts = (0 until n).map { _ =>
          val s = rnd.nextInt(12).toDouble
          LineString(Array(s, 0.0, s + 1 + rnd.nextInt(5), 0.0))
        }
        if (parts.length == 1) parts.head else MultiLineString(parts.toArray)
      }
      val a = randomChain()
      val b = randomChain()
      val la = Measures.length(a)
      val li = Measures.length(Overlay.intersection(a, b))
      val ld = Measures.length(Overlay.difference(a, b))
      // overlapping parts WITHIN a would make |a| itself double-counted —
      // normalize expectation via a's own self-union length
      val laSelf = Measures.length(Overlay.intersection(a, a))
      assert(math.abs((li + ld) - laSelf) < 1e-9 || math.abs((li + ld) - la) < 1e-9,
        s"trial $trial: |a∩b|=$li + |a\\b|=$ld vs |a|=$la/self=$laSelf  a=$a b=$b")
    }
  }

  test("randomized: polygon clip ops conserve area") {
    // area(a∩b) + area(a\b) = area(a) for random axis-boxes and triangles
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 150) {
      def randomPoly(): Geometry = {
        if (rnd.nextBoolean()) {
          val x0 = rnd.nextInt(10).toDouble; val y0 = rnd.nextInt(10).toDouble
          Polygon.box(x0, y0, x0 + 1 + rnd.nextInt(6), y0 + 1 + rnd.nextInt(6))
        } else {
          val x0 = rnd.nextInt(10).toDouble; val y0 = rnd.nextInt(10).toDouble
          val w = 1 + rnd.nextInt(6); val h = 1 + rnd.nextInt(6)
          Polygon(Array(Array(x0, y0, x0 + w, y0, x0 + w / 2.0, y0 + h, x0, y0)))
        }
      }
      val a = randomPoly(); val b = randomPoly()
      val ai = Measures.area(Overlay.intersection(a, b))
      val ad = Measures.area(Overlay.difference(a, b))
      assert(math.abs(ai + ad - Measures.area(a)) < 1e-6,
        s"trial $trial: ${Measures.area(a)} != $ai + $ad  a=$a b=$b")
    }
  }

  test("curve x curve intersection: collinear spans from multiple parts are noded") {
    // two b parts overlap the SAME stretch of a: the result must not
    // contain duplicate spans (length would inflate)
    val a = Wkt.read("LINESTRING (0 0, 10 0)")
    val b = Wkt.read("MULTILINESTRING ((1 0, 6 0), (3 0, 8 0))")
    val got = Overlay.intersection(a, b)
    // union of [1,6] and [3,8] = [1,8]: total length exactly 7
    val len = Measures.length(got)
    assert(math.abs(len - 7.0) < 1e-9, s"length $len != 7 (duplicate spans?)")
  }

  test("distance") {
    assert(Measures.distance(Point(0, 0), Point(3, 4)) == 5.0)
    assert(Measures.distance(Point(5, 5), sq) == math.sqrt(18))
    assert(Measures.distance(sq, Wkt.read("POLYGON ((5 0, 6 0, 6 1, 5 1, 5 0))")) == 3.0)
    assert(Measures.distance(Point(1, 1), sq) == 0.0) // inside
    val l = Wkt.read("LINESTRING (0 0, 10 0)")
    assert(Measures.distance(Point(5, 3), l) == 3.0)
  }

  test("convex hull") {
    val mp = Wkt.read("MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2), (1 1))")
    val hull = Constructive.convexHull(mp)
    assert(Measures.area(hull) == 16.0)
    assert(hull.isInstanceOf[Polygon])
  }

  test("simplify collinear") {
    val l = Wkt.read("LINESTRING (0 0, 1 0.01, 2 0, 4 0)")
    val s = Constructive.simplify(l, 0.1).asInstanceOf[LineString]
    assert(s.size == 2)
  }

  test("negative buffer: convex erosion, collapse, and lower-dim empty") {
    val box = Wkt.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val shrunk = Constructive.buffer(box, -2)
    assert(math.abs(Measures.area(shrunk) - 36.0) < 1e-9) // 6x6
    assert(Constructive.buffer(box, -6).isEmpty) // beyond inradius 5
    // triangle erosion: area shrinks, stays inside
    val eroded = Constructive.buffer(tri, -0.5)
    assert(Measures.area(eroded) > 0 && Measures.area(eroded) < Measures.area(tri))
    assert(Predicates.contains(tri, eroded))
    assert(Constructive.buffer(Wkt.read("POINT (1 1)"), -1).isEmpty)
  }

  test("buffer point area converges to circle") {
    val b = Constructive.buffer(Point(0, 0), 2.0, 16)
    val expected = 32 * 4.0 * math.sin(math.Pi / 32) // n/2 r^2 sin(2pi/n), n=64
    assert(math.abs(Measures.area(b) - expected) < 1e-9)
    assert(Predicates.contains(b, Point(1.9, 0)))
  }

  test("sutherland-hodgman rect clip") {
    val clipped = Overlay.clipByRect(tri, 0, 0, 2, 2)
    // triangle (0,0)(4,0)(0,4) clipped to [0,2]^2: area = 4 - 0.5*2*2/2... compute:
    // region = x>=0,y>=0,x<=2,y<=2,x+y<=4 -> full square minus corner above x+y=4: none (2+2=4 on line)
    assert(math.abs(Measures.area(clipped) - 4.0) < 1e-12)
    val clipped2 = Overlay.clipByRect(tri, 1, 1, 5, 5)
    // triangle x+y<=4, x>=1,y>=1: vertices (1,1),(3,1),(1,3) area=2
    assert(math.abs(Measures.area(clipped2) - 2.0) < 1e-12)
  }

  test("line clip to polygon") {
    val l = Wkt.read("LINESTRING (-2 1, 6 1)")
    val res = Overlay.intersection(l, sq)
    assert(math.abs(Measures.length(res) - 2.0) < 1e-12)
    val diff = Overlay.difference(l, sq)
    assert(math.abs(Measures.length(diff) - 6.0) < 1e-12)
  }

  test("polygon difference: decomposed pieces have exact total area") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = Wkt.read("POLYGON ((2 -1, 6 -1, 6 5, 2 5, 2 -1))") // right half cut
    val d = Overlay.difference(a, b)
    assert(math.abs(Measures.area(d) - 8.0) < 1e-9) // left 2x4 strip
    // overlap corner cut: 1x1 notch
    val c = Wkt.read("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))")
    val d2 = Overlay.difference(a, c)
    assert(math.abs(Measures.area(d2) - 15.0) < 1e-9)
    // subtrahend covers subject -> empty
    assert(Overlay.difference(sq, Wkt.read("POLYGON ((-1 -1, 3 -1, 3 3, -1 3, -1 -1))")).isEmpty)
    // disjoint -> unchanged
    assert(math.abs(Measures.area(Overlay.difference(sq,
      Wkt.read("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"))) - 4.0) < 1e-9)
  }

  test("polygon union/symdifference: inclusion-exclusion areas") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = Wkt.read("POLYGON ((2 0, 6 0, 6 4, 2 4, 2 0))") // overlap area 8
    assert(math.abs(Measures.area(Overlay.union(a, b)) - 24.0) < 1e-9)
    assert(math.abs(Measures.area(Overlay.symDifference(a, b)) - 16.0) < 1e-9)
    // equal-height offset squares: interiors overlap even though no vertex
    // is strictly inside the other (regression for touches/overlaps)
    assert(Predicates.overlaps(a, b))
    assert(!Predicates.touches(a, b))
    val t = Wkt.read("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))") // shares edge x=4
    assert(Predicates.touches(a, t))
    assert(!Predicates.overlaps(a, t))
  }

  test("union of points dedups and sorts") {
    val u = Overlay.unionAll(Seq(Point(1, 1), Point(0, 0), Point(1, 1)))
    assert(Wkt.write(u) == "MULTIPOINT ((0 0), (1 1))")
  }

  test("geom equals") {
    val sq2 = Wkt.read("POLYGON ((2 0, 2 2, 0 2, 0 0, 2 0))") // rotated start
    assert(Predicates.geomEquals(sq, sq2))
    assert(!Predicates.geomEquals(sq, tri))
  }

  test("hilbert golden values (reference tests/test_hilbert_distance.py:19-36)") {
    // level=2, bounds (0,0,1,1): POINT(0 0)->0, POINT(1 1)->10, POINT(1 0)->15,
    // unit-square bbox midpoint (0.5,0.5) -> 2
    def h(g: Geometry) = Sfc.hilbert(g, 2, 0, 0, 1, 1)
    assert(h(Point(0, 0)) == 0)
    assert(h(Point(1, 1)) == 10)
    assert(h(Point(1, 0)) == 15)
    assert(h(Wkt.read("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) == 2)
  }

  test("hilbert is a bijection on the grid (level 4)") {
    val seen = scala.collection.mutable.Set[Long]()
    for (x <- 0 until 16; y <- 0 until 16) seen += Sfc.hilbertXY2D(4, x, y)
    assert(seen.size == 256 && seen.min == 0 && seen.max == 255)
  }

  test("hilbert locality: adjacent cells differ by 1 along the curve") {
    // walking the curve d=0..255 yields adjacent grid cells; verify via inverse walk
    // cheap check: consecutive d values map to cells at L1 distance 1
    val cells = (0 until 256).map { d =>
      // invert by brute force (small grid)
      (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
        .find { case (x, y) => Sfc.hilbertXY2D(4, x, y) == d }.get
    }
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("morton interleave") {
    assert(Sfc.mortonXY(0, 0) == 0)
    assert(Sfc.mortonXY(1, 0) == 1)
    assert(Sfc.mortonXY(0, 1) == 2)
    assert(Sfc.mortonXY(3, 3) == 15)
    assert(Sfc.mortonXY(0xffffffffL, 0) == 0x5555555555555555L)
  }

  test("geohash golden values (public test vectors)") {
    // canonical: geohash.org examples
    assert(Sfc.geohash(-5.6, 42.6, 5) == "ezs42")
    assert(Sfc.geohash(112.5584, 37.8324, 9) == "ww8p1r4t8")
    assert(Sfc.geohash(0, 0, 1) == "s")
  }

  test("UTM forward/inverse: known invariants and roundtrip") {
    import graft.sql.Crs
    // central meridian, equator -> false easting exactly, northing 0
    val (x0, y0) = Crs.utmForward(15.0, 0.0, 33, southern = false)
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
    // 3 degrees east at the equator: ~333.9 km scaled by k0
    val (x3, _) = Crs.utmForward(18.0, 0.0, 33, southern = false)
    assert(math.abs((x3 - 500000.0) - 333978.0 * 0.9996) < 200.0)
    // east/west symmetry about the central meridian
    val (xe, _) = Crs.utmForward(16.0, 40.0, 33, southern = false)
    val (xw, _) = Crs.utmForward(14.0, 40.0, 33, southern = false)
    assert(math.abs((xe - 500000.0) + (xw - 500000.0)) < 1e-6)
    // southern hemisphere false northing
    val (_, ys) = Crs.utmForward(15.0, -10.0, 33, southern = true)
    assert(ys > 8000000.0 && ys < 10000000.0)
    // roundtrip accuracy near the zone: sub-millimeter in degrees
    for (lon <- Seq(13.5, 15.0, 17.9); lat <- Seq(-35.0, 0.0, 48.1)) {
      val (x, y) = Crs.utmForward(lon, lat, 33, southern = false)
      val (lon2, lat2) = Crs.utmInverse(x, y, 33, southern = false)
      // series truncation allows ~mm-scale error at the zone edge
      assert(math.abs(lon2 - lon) < 1e-8, s"lon roundtrip $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat roundtrip $lat -> $lat2")
    }
  }

  test("affine family") {
    val p = Point(1, 2)
    val t = Constructive.translate(p, 10, 20).asInstanceOf[Point]
    assert(t.x == 11 && t.y == 22)
    val r = Constructive.rotate(p, 90, 0, 0).asInstanceOf[Point]
    assert(math.abs(r.x - (-2.0)) < 1e-12 && math.abs(r.y - 1.0) < 1e-12)
    val s = Constructive.scale(p, 2, 3, 0, 0).asInstanceOf[Point]
    assert(s.x == 2 && s.y == 6)
  }

  test("line interpolate / locate") {
    val l = Wkt.read("LINESTRING (0 0, 10 0)")
    val i1 = Constructive.lineInterpolatePoint(l, 4); assert(i1.x == 4 && i1.y == 0)
    val i2 = Constructive.lineInterpolatePoint(l, 0.5, normalized = true); assert(i2.x == 5 && i2.y == 0)
    assert(Constructive.lineLocatePoint(l, Point(7, 3)) == 7.0)
  }

  test("boundary") {
    assert(Wkt.write(Constructive.boundary(sq)) == "LINESTRING (0 0, 2 0, 2 2, 0 2, 0 0)")
    val l = Wkt.read("LINESTRING (0 0, 1 1)")
    assert(Wkt.write(Constructive.boundary(l)) == "MULTIPOINT ((0 0), (1 1))")
  }

  test("pointOnSurface always inside") {
    Seq(tri, sq, donut).foreach { g =>
      val p = Constructive.pointOnSurface(g)
      assert(Predicates.locate(p.x, p.y, g) == Predicates.IN)
    }
  }

  test("multi-line overlay paths: intersection crossings and minus-area") {
    val ml = Wkt.read("MULTILINESTRING ((0 0, 4 0), (0 2, 4 2))")
    val l = Wkt.read("LINESTRING (2 -1, 2 3)")
    // crossings of the vertical with both horizontals
    val inter = Overlay.intersection(ml, l)
    assert(Geometry.parts(inter).count(_.topoDim == 0) == 2, Wkt.write(inter))
    // multi-line minus a polygon keeps only the outside spans
    val poly = Wkt.read("POLYGON ((1 -1, 3 -1, 3 3, 1 3, 1 -1))")
    val diff = Overlay.difference(ml, poly)
    val len = Geometry.parts(diff).collect { case s: LineString => Measures.length(s) }.sum
    assert(math.abs(len - 4.0) < 1e-9, Wkt.write(diff)) // 2x (1 + 1) outside
    // line minus a point is the line
    assert(Overlay.difference(l, Point(2, 0)) == l)
  }

  test("covers/contains with multi-part and collection first operands") {
    val mp = Wkt.read("MULTIPOINT ((0 0), (1 1))")
    assert(Predicates.covers(mp, Point(0, 0)))
    assert(!Predicates.covers(mp, Point(2, 2)))
    val ml = Wkt.read("MULTILINESTRING ((0 0, 1 1), (5 5, 6 6))")
    assert(Predicates.covers(ml, Point(0.5, 0.5)))
    assert(Predicates.contains(ml, Point(0.5, 0.5)))
    assert(!Predicates.covers(ml, Point(3, 3)))
    assert(Predicates.covers(ml, Wkt.read("LINESTRING (0.2 0.2, 0.8 0.8)")))
    val gc = Wkt.read("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), POINT (10 10))")
    assert(Predicates.covers(gc, Point(2, 2)))
    assert(Predicates.covers(gc, Point(10, 10)))
    assert(!Predicates.covers(gc, Point(7, 7)))
    // within/coveredBy are the converses
    assert(Predicates.within(Point(0.5, 0.5), ml))
    assert(Predicates.coveredBy(Point(10, 10), gc))
  }

  test("touches/crosses at a shared interior vertex (vertex-noded X crossing)") {
    val a = Wkt.read("LINESTRING (-1 0, 0 0, 1 0)")
    val b = Wkt.read("LINESTRING (0 -1, 0 0, 0 1)")
    assert(Predicates.crosses(a, b), "vertex-noded crossing must be crosses")
    assert(!Predicates.touches(a, b), "interior-interior contact is not touches")
    // endpoint contact stays touches, not crosses
    val c = Wkt.read("LINESTRING (0 0, 0 1)")
    assert(Predicates.touches(a, c))
    assert(!Predicates.crosses(a, c))
    // two parts chaining at a point make it INTERIOR (mod-2 boundary rule):
    // an endpoint contact from the other line onto that chain point is
    // boundary-vs-interior -> touches
    val chained = Wkt.read("MULTILINESTRING ((-1 0, 0 0), (0 0, 1 0))")
    assert(!Predicates.touches(chained, b) && Predicates.crosses(chained, b))
  }

  test("line/line difference and collinear intersection") {
    val a = Wkt.read("LINESTRING (0 0, 2 0)")
    val bOverlap = Wkt.read("LINESTRING (1 0, 3 0)")
    // intersection of collinear overlap = the shared span
    val inter = Overlay.intersection(a, bOverlap)
    assert(inter.topoDim == 1, Wkt.write(inter))
    val interLen = Geometry.parts(inter).collect { case l: LineString => Measures.length(l) }.sum
    assert(math.abs(interLen - 1.0) < 1e-9, Wkt.write(inter))
    // difference removes exactly the shared span
    val diff = Overlay.difference(a, bOverlap)
    val diffLen = Geometry.parts(diff).collect { case l: LineString => Measures.length(l) }.sum
    assert(math.abs(diffLen - 1.0) < 1e-9, Wkt.write(diff))
    // crossing lines: difference keeps the full line (measure-zero cut),
    // and does NOT throw (regression: UnsupportedOperationException)
    val x = Wkt.read("LINESTRING (0 2, 2 0)")
    val a2 = Wkt.read("LINESTRING (0 0, 2 2)")
    val dCross = Overlay.difference(a2, x)
    val dLen = Geometry.parts(dCross).collect { case l: LineString => Measures.length(l) }.sum
    assert(math.abs(dLen - Measures.length(a2)) < 1e-9, Wkt.write(dCross))
    // symmetric difference of intersecting lines also survives
    assert(!Overlay.symDifference(a, bOverlap).isEmpty)
  }

  test("line overlay property sweep: inter + diff partition the line (100 random cases)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 100) {
      // random collinear pair on a random (non-axis-aligned) carrier line:
      // a spans t in [0,2], b spans a random [u1,u2] of the same carrier
      val x0 = rnd.nextDouble() * 100 - 50
      val y0 = rnd.nextDouble() * 100 - 50
      val dx = rnd.nextDouble() * 10 + 0.5
      val dy = rnd.nextDouble() * 10 - 5
      def pt(t: Double) = (x0 + t * dx, y0 + t * dy)
      val (ax0, ay0) = pt(0); val (ax1, ay1) = pt(2)
      val u1 = rnd.nextDouble() * 4 - 1
      val u2 = u1 + rnd.nextDouble() * 2
      val (bx0, by0) = pt(u1); val (bx1, by1) = pt(u2)
      val a = Wkt.read(s"LINESTRING ($ax0 $ay0, $ax1 $ay1)")
      val b = Wkt.read(s"LINESTRING ($bx0 $by0, $bx1 $by1)")
      val segLen = math.hypot(2 * dx, 2 * dy)
      def lenOf(g: Geometry): Double =
        Geometry.parts(g).collect { case l: LineString => Measures.length(l) }.sum
      val interLen = lenOf(Overlay.intersection(a, b))
      val diffLen = lenOf(Overlay.difference(a, b))
      val expInter = math.max(0.0, math.min(2.0, u2) - math.max(0.0, u1)) / 2.0 * segLen
      assert(math.abs(interLen - expInter) < 1e-6,
        s"inter $interLen vs $expInter for u=[$u1,$u2] d=($dx,$dy)")
      // the overlap and the remainder partition a exactly
      assert(math.abs((interLen + diffLen) - segLen) < 1e-6,
        s"partition: $interLen + $diffLen != $segLen")
    }
    // random transversal crossings: intersection is a point, difference
    // keeps the full length
    for (_ <- 0 until 100) {
      val cx = rnd.nextDouble() * 10 - 5
      val cy = rnd.nextDouble() * 10 - 5
      val ang = rnd.nextDouble() * math.Pi
      val ang2 = ang + 0.3 + rnd.nextDouble() * (math.Pi - 0.6)
      def ray(an: Double, r: Double) = (cx + r * math.cos(an), cy + r * math.sin(an))
      val (p1x, p1y) = ray(ang, -3); val (p2x, p2y) = ray(ang, 2)
      val (q1x, q1y) = ray(ang2, -2); val (q2x, q2y) = ray(ang2, 3)
      val a = Wkt.read(s"LINESTRING ($p1x $p1y, $p2x $p2y)")
      val b = Wkt.read(s"LINESTRING ($q1x $q1y, $q2x $q2y)")
      val inter = Overlay.intersection(a, b)
      assert(inter.topoDim == 0 && !inter.isEmpty, Wkt.write(inter))
      val diffLen = Geometry.parts(Overlay.difference(a, b))
        .collect { case l: LineString => Measures.length(l) }.sum
      assert(math.abs(diffLen - Measures.length(a.asInstanceOf[LineString])) < 1e-9)
      assert(Predicates.crosses(a, b) && !Predicates.touches(a, b))
    }
  }

  test("WKT Z/M edge cases stay well-formed") {
    // 2-D coordinate inside a Z-tagged geometry: z arrays stay aligned and
    // the geometry still writes (regression: ArrayIndexOutOfBounds)
    val mixed = Wkt.read("LINESTRING Z (0 0 1, 2 2)")
    assert(Wkt.write(mixed).nonEmpty)
    // an explicit M third coordinate is a measure, not elevation
    val m = Wkt.read("POINT M (1 2 3)")
    assert(!m.asInstanceOf[Point].hasZ, Wkt.write(m))
    // untagged 3-coordinate point still reads as Z
    assert(Wkt.read("POINT (1 2 3)").asInstanceOf[Point].hasZ)
  }

  test("pointOnSurface of a collection skips empty highest-dim children") {
    val gc = GeometryCollection(Array(
      Polygon(Array.empty[Array[Double]]), Wkt.read("LINESTRING (0 0, 1 1)")))
    val p = Constructive.pointOnSurface(gc)
    assert(!p.isEmpty, "empty polygon child must not win over a real line")
  }

  test("conic projections: origin, standard-parallel scale, roundtrip") {
    import graft.sql.Crs
    // the projection natural origin maps to (false easting, false northing)
    val (ax0, ay0) = Crs.conusAlbers.forward(-96.0, 23.0)
    assert(math.abs(ax0) < 1e-6 && math.abs(ay0) < 1e-6, (ax0, ay0))
    val (lx0, ly0) = Crs.statCanLambert.forward(-(91.0 + 52.0 / 60.0), 63.390675)
    assert(math.abs(lx0 - 6200000.0) < 1e-6 && math.abs(ly0 - 3000000.0) < 1e-6, (lx0, ly0))
    // scale factor ~= 1 along each standard parallel: projected distance of
    // a small lon step matches the ellipsoidal parallel arc a*m(phi)*dlam
    def parallelScale(fwd: (Double, Double) => (Double, Double), latSp: Double): Double = {
      val dLonDeg = 0.01
      val (x1, y1) = fwd(-80.0, latSp)
      val (x2, y2) = fwd(-80.0 + dLonDeg, latSp)
      val projected = math.hypot(x2 - x1, y2 - y1)
      val e2 = {  val f = 1.0 / 298.257222101; f * (2.0 - f) }
      val s = math.sin(math.toRadians(latSp))
      val arc = 6378137.0 * math.cos(math.toRadians(latSp)) /
        math.sqrt(1.0 - e2 * s * s) * math.toRadians(dLonDeg)
      projected / arc
    }
    for (sp <- Seq(29.5, 45.5))
      assert(math.abs(parallelScale(Crs.conusAlbers.forward, sp) - 1.0) < 1e-6, sp)
    for (sp <- Seq(49.0, 77.0))
      assert(math.abs(parallelScale(Crs.statCanLambert.forward, sp) - 1.0) < 1e-6, sp)
    // off the standard parallels the scale must NOT be 1 (distinguishes a
    // real conic from a pass-through)
    assert(math.abs(parallelScale(Crs.conusAlbers.forward, 37.0) - 1.0) > 1e-4)
    // forward∘inverse identity to well under 1e-9 degrees across the domain
    for (lonI <- -130 to -60 by 7; latI <- 20 to 75 by 5) {
      val lon = lonI.toDouble; val lat = latI.toDouble
      val (ax, ay) = Crs.conusAlbers.forward(lon, lat)
      val (alon, alat) = Crs.conusAlbers.inverse(ax, ay)
      assert(math.abs(alon - lon) < 1e-9 && math.abs(alat - lat) < 1e-9, (lon, lat))
      val (lx, ly) = Crs.statCanLambert.forward(lon, lat)
      val (llon, llat) = Crs.statCanLambert.inverse(lx, ly)
      assert(math.abs(llon - lon) < 1e-9 && math.abs(llat - lat) < 1e-9, (lon, lat))
    }
  }

  test("EPSG table projections: natural origins, published values, roundtrip") {
    import graft.sql.Crs
    // every projection's natural origin maps to (FE, FN); 27700's check
    // runs on the projection HALF (its datum is shifted, so the WGS84
    // origin no longer lands on FE/FN — that's the point of r9)
    val origins = Seq(
      ("EPSG:2154", 3.0, 46.5, 700000.0, 6600000.0),
      ("EPSG:25832", 9.0, 0.0, 500000.0, 0.0),
      ("EPSG:3035", 10.0, 52.0, 4321000.0, 3210000.0))
    origins.foreach { case (code, lon0, lat0, fe, fn) =>
      val (x, y) = Crs.byEpsg(code).forward(lon0, lat0)
      assert(math.abs(x - fe) < 1e-6 && math.abs(y - fn) < 1e-6, s"$code origin ($x,$y)")
    }
    val (box, boy) = Crs.bngProjection.forward(-2.0, 49.0)
    assert(math.abs(box - 400000.0) < 1e-6 && math.abs(boy + 100000.0) < 1e-6)
    // OSGB worked example (OS "A guide to coordinate systems in Great
    // Britain", Annex C): OSGB36 52°39'27.2531"N 1°43'4.5177"E ->
    // E 651409.903, N 313177.270 (pure Airy-ellipsoid projection math —
    // the input is OSGB36-native, so it drives the projection half only)
    val lat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
    val lon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0
    val (e27700, n27700) = Crs.bngProjection.forward(lon, lat)
    assert(math.abs(e27700 - 651409.903) < 0.005, s"E $e27700")
    assert(math.abs(n27700 - 313177.270) < 0.005, s"N $n27700")
    // ETRS UTM twin: 25832 must agree with WGS84 UTM zone 32N to <1 m
    // (GRS80 vs WGS84 ellipsoids differ in 1/f by ~1e-9)
    val (ex, ey) = Crs.byEpsg("EPSG:25832").forward(9.5, 48.0)
    val (ux, uy) = Crs.utmForward(9.5, 48.0, 32, southern = false)
    assert(math.hypot(ex - ux, ey - uy) < 1.0, s"$ex,$ey vs $ux,$uy")
    // LAEA equal-area property: a small lon x lat cell keeps its
    // ellipsoidal area through the projection (equal-area to ~1e-6)
    val laea = Crs.byEpsg("EPSG:3035")
    val (p1x, p1y) = laea.forward(15.0, 50.0)
    val (p2x, p2y) = laea.forward(15.01, 50.0)
    val (p3x, p3y) = laea.forward(15.0, 50.01)
    val projArea = math.abs((p2x - p1x) * (p3y - p1y) - (p3x - p1x) * (p2y - p1y))
    val f = 1.0 / 298.257222101
    val e2 = f * (2.0 - f)
    val s = math.sin(math.toRadians(50.0))
    val mRad = 6378137.0 * (1.0 - e2) / math.pow(1.0 - e2 * s * s, 1.5)
    val nRad = 6378137.0 / math.sqrt(1.0 - e2 * s * s)
    val ellArea = (nRad * math.cos(math.toRadians(50.0)) * math.toRadians(0.01)) *
      (mRad * math.toRadians(0.01))
    assert(math.abs(projArea / ellArea - 1.0) < 1e-5, projArea / ellArea)
    // roundtrip over each projection's service domain. TM codes get 5e-7
    // deg (~5 cm): the 6th-order series truncates at ~2e-7 deg when 5+
    // degrees from the central meridian (UTM zones only ever span +-3).
    def rt(code: String, lons: Range, lats: Range, tol: Double): Unit = {
      val p = Crs.byEpsg(code)
      for (lonI <- lons; latI <- lats) {
        val (x, y) = p.forward(lonI.toDouble, latI.toDouble)
        val (lo, la) = p.inverse(x, y)
        assert(math.abs(lo - lonI) < tol && math.abs(la - latI) < tol,
          s"$code roundtrip at ($lonI,$latI): ($lo,$la)")
      }
    }
    rt("EPSG:27700", -7 to 2, 50 to 59, 5e-7)
    rt("EPSG:2154", -5 to 9, 41 to 51, 1e-8)
    rt("EPSG:25832", 5 to 13, 38 to 60, 5e-7)
    rt("EPSG:3035", -10 to 30 by 4, 35 to 65 by 3, 1e-8)
    rt("EPSG:23032", 6 to 12, 40 to 55, 5e-7)
  }

  test("Helmert datum shifts: OSGB36 + ED50 (r9)") {
    import graft.sql.Crs
    // Full WGS84 -> EPSG:27700 chain (Helmert + TM on Airy) against
    // ground truth computed with an INDEPENDENT implementation (python,
    // different code path) of the same OS-published position-vector
    // parameters (tx -446.448, ty 125.157, tz -542.060, rx -0.1502",
    // ry -0.2470", rz -0.8421", s 20.4894 ppm). 1 cm tolerance: these
    // values only reproduce with the datum shift applied — the projection
    // alone is ~110 m off (asserted below).
    val cases = Seq(
      ((-0.1278, 51.5074), (530028.7458, 180380.0954)), // London
      ((-3.1883, 55.9533), (325897.2180, 674001.2020))) // Edinburgh
    val bng = Crs.byEpsg("EPSG:27700")
    cases.foreach { case ((lon, lat), (we, wn)) =>
      val (e, n) = bng.forward(lon, lat)
      assert(math.hypot(e - we, n - wn) < 0.01, s"($lon,$lat) -> ($e,$n) want ($we,$wn)")
      // identity-datum (projection-only) misses by the ~100 m OSGB36
      // offset: the <1 m agreement above exists ONLY via the Helmert
      val (pe, pn) = Crs.bngProjection.forward(lon, lat)
      assert(math.hypot(pe - we, pn - wn) > 50.0, s"no-datum too close: ($pe,$pn)")
      // exact-matrix inverse roundtrips to well under 1e-8 degrees
      val (lo, la) = bng.inverse(e, n)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7)
    }
    // ED50/UTM32 (3-parameter shift on International 1924) sits the
    // documented ~216 m NE of the WGS84 UTM32 result in central Europe
    val (ex, ey) = Crs.byEpsg("EPSG:23032").forward(9.5, 48.0)
    val (ux, uy) = Crs.utmForward(9.5, 48.0, 32, southern = false)
    val off = math.hypot(ex - ux, ey - uy)
    assert(off > 150.0 && off < 300.0, s"ED50 offset $off m")
    assert(ex - ux > 0 && ey - uy > 0, "ED50 grid coordinates shift north-east")
  }

  test("r10 grids: Swiss somerc, MGA/NZTM/UTM15N/Albers-AU, proj records") {
    import graft.sql.Crs
    // Swiss projection center maps exactly to the LV95 false origin (the
    // double projection's K constant is constructed to guarantee it)
    val bernLon = 7.0 + 26.0 / 60.0 + 22.5 / 3600.0
    val bernLat = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0
    val (ce, cn) = Crs.lv95Projection.forward(bernLon, bernLat)
    assert(math.abs(ce - 2600000.0) < 1e-6 && math.abs(cn - 1200000.0) < 1e-6,
      s"LV95 center ($ce,$cn)")
    // swisstopo worked example ("Formulas and constants for the
    // calculation of the Swiss conformal cylindric projection",
    // numerical example): WGS84 46°02'38.87"N 8°43'49.79"E ->
    // LV95 (2700000.00, 1100000.00). Reproduced to < 5 cm by the
    // rigorous double projection behind the 3-parameter CH translation —
    // the datum shift is load-bearing (without it the miss is > 100 m).
    val exLon = 8.0 + 43.0 / 60.0 + 49.79 / 3600.0
    val exLat = 46.0 + 2.0 / 60.0 + 38.87 / 3600.0
    val lv95 = Crs.byEpsg("EPSG:2056")
    val (we, wn) = lv95.forward(exLon, exLat)
    assert(math.abs(we - 2700000.0) < 0.05 && math.abs(wn - 1100000.0) < 0.05,
      s"LV95 worked example ($we,$wn)")
    val (pe, pn) = Crs.lv95Projection.forward(exLon, exLat)
    assert(math.hypot(pe - 2700000.0, pn - 1100000.0) > 100.0,
      "no-datum somerc should miss by the CH1903 offset")
    // LV03 is the same projection at the legacy false origin
    val (oe, on) = Crs.byEpsg("EPSG:21781").forward(exLon, exLat)
    assert(math.abs(we - oe - 2000000.0) < 1e-6 && math.abs(wn - on - 1000000.0) < 1e-6)
    // roundtrip across the Swiss service domain
    for (lonI <- 6 to 10; latI <- 46 to 47) {
      val (x, y) = lv95.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = lv95.inverse(x, y)
      // 5e-8 deg (~5 mm): the Helmert hub roundtrip at h=0 contributes
      // ~1e-8 deg on top of the projection's machine-precision roundtrip
      assert(math.abs(lo - lonI) < 5e-8 && math.abs(la - latI) < 5e-8,
        s"LV95 roundtrip at ($lonI,$latI): ($lo,$la)")
    }
    // GDA94 technical manual worked example (Alice Springs): GDA94
    // 23°40'12.446020"S 133°53'7.84784"E -> MGA zone 53
    // E 386352.397753 N 7381850.768886. GDA94 is WGS84-equivalent at
    // this tolerance; reached through the proj-record parser.
    val mga53 = Crs.parseProj("+proj=utm +zone=53 +south +ellps=GRS80").get
    val (ae, an) = mga53.forward(133.0 + 53.0 / 60.0 + 7.84784 / 3600.0,
      -(23.0 + 40.0 / 60.0 + 12.446020 / 3600.0))
    assert(math.abs(ae - 386352.398) < 0.01 && math.abs(an - 7381850.769) < 0.01,
      s"MGA53 Alice Springs ($ae,$an)")
    // new table rows: natural origins land on (FE, FN), roundtrips hold
    val origins = Seq(
      ("EPSG:28355", 147.0, 0.0, 500000.0, 10000000.0),
      ("EPSG:2193", 173.0, 0.0, 1600000.0, 10000000.0),
      ("EPSG:26915", -93.0, 0.0, 500000.0, 0.0),
      ("EPSG:3577", 132.0, 0.0, 0.0, 0.0))
    origins.foreach { case (code, lon0, lat0, fe, fn) =>
      val p = Crs.byEpsg(code)
      val (x, y) = p.forward(lon0, lat0)
      assert(math.abs(x - fe) < 1e-6 && math.abs(y - fn) < 1e-6, s"$code origin ($x,$y)")
    }
    for (lonI <- 144 to 150; latI <- -44 to -20 by 4) {
      val p = Crs.byEpsg("EPSG:28355")
      val (x, y) = p.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lonI) < 5e-7 && math.abs(la - latI) < 5e-7, s"28355 ($lonI,$latI)")
    }
    // NZTM is a single nationwide TM spanning +-7 degrees of lon0 — the
    // 6th-order series truncation grows to ~6e-7 deg at the domain edge
    for (lonI <- 167 to 178; latI <- -46 to -35 by 2) {
      val p = Crs.byEpsg("EPSG:2193")
      val (x, y) = p.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lonI) < 2e-6 && math.abs(la - latI) < 2e-6, s"2193 ($lonI,$latI)")
    }
    for (lonI <- 114 to 152 by 4; latI <- -42 to -12 by 4) {
      val p = Crs.byEpsg("EPSG:3577")
      val (x, y) = p.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lonI) < 1e-8 && math.abs(la - latI) < 1e-8, s"3577 ($lonI,$latI)")
    }
  }

  test("polar stereographic: EPSG worked examples, poles, scale, roundtrip") {
    import graft.sql.Crs
    // EPSG Guidance Note 7-2, Polar Stereographic Variant A example
    // (UPS North, k0=0.994, FE=FN=2000000): 73N 44E ->
    // E 3320416.75, N 632668.43
    val ups = Crs.parseProj("+proj=stere +lat_0=90 +k=0.994 " +
      "+x_0=2000000 +y_0=2000000 +ellps=WGS84").get
    val (ux, uy) = ups.forward(44.0, 73.0)
    assert(math.abs(ux - 3320416.75) < 0.01 && math.abs(uy - 632668.43) < 0.01,
      s"UPS North ($ux,$uy)")
    // Variant B example (EPSG:3032 Australian Antarctic, lat_ts=-71,
    // lon0=70, FE=FN=6000000): 75S 120E -> E 7255380.79, N 7053389.56
    val aaps = Crs.parseProj("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 " +
      "+x_0=6000000 +y_0=6000000 +ellps=WGS84").get
    val (bx, by) = aaps.forward(120.0, -75.0)
    assert(math.abs(bx - 7255380.79) < 0.01 && math.abs(by - 7053389.56) < 0.01,
      s"3032 example ($bx,$by)")
    // table rows: pole lands exactly on the false origin; the scale factor
    // is true (1) at the standard parallel; roundtrips hold over the
    // service domains
    val a = 6378137.0; val fl = 1.0 / 298.257223563; val e2 = fl * (2.0 - fl)
    def scaleAt(p: Crs.Projection, lon: Double, lat: Double): Double = {
      val (x1, y1) = p.forward(lon, lat); val (x2, y2) = p.forward(lon, lat + 0.001)
      val s = math.sin(math.toRadians(lat))
      val mRad = a * (1.0 - e2) / math.pow(1.0 - e2 * s * s, 1.5)
      math.hypot(x2 - x1, y2 - y1) / (mRad * math.toRadians(0.001))
    }
    val n3413 = Crs.byEpsg("EPSG:3413")
    assert(n3413.forward(-45.0, 90.0) == ((0.0, 0.0)))
    assert(math.abs(scaleAt(n3413, -45.0, 70.0) - 1.0) < 1e-4)
    val s3031 = Crs.byEpsg("EPSG:3031")
    assert(s3031.forward(0.0, -90.0) == ((0.0, 0.0)))
    assert(math.abs(scaleAt(s3031, 0.0, -71.0) - 1.0) < 1e-4)
    val s3976 = Crs.byEpsg("EPSG:3976")
    assert(math.abs(scaleAt(s3976, 0.0, -70.0) - 1.0) < 1e-4)
    for (lonI <- -180 to 180 by 30; latI <- 55 to 88 by 3) {
      val (x, y) = n3413.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = n3413.inverse(x, y)
      val dl = math.abs(((lo - lonI) % 360.0 + 540.0) % 360.0 - 180.0)
      assert(dl < 1e-8 && math.abs(la - latI) < 1e-8, s"3413 ($lonI,$latI) -> ($lo,$la)")
    }
    for (lonI <- -180 to 180 by 30; latI <- -88 to -55 by 3) {
      val (x, y) = s3031.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = s3031.inverse(x, y)
      val dl = math.abs(((lo - lonI) % 360.0 + 540.0) % 360.0 - 180.0)
      assert(dl < 1e-8 && math.abs(la - latI) < 1e-8, s"3031 ($lonI,$latI) -> ($lo,$la)")
    }
    // non-polar stere records are a different EPSG method — rejected
    assert(Crs.parseProj("+proj=stere +lat_0=52 +lon_0=5").isEmpty)
  }

  test("oblique stereographic (EPSG:28992 RD New): GN7-2 example, datum, roundtrip") {
    import graft.sql.Crs
    // EPSG Guidance Note 7-2 worked example for the method (Amersfoort /
    // RD New, Bessel 1841): Amersfoort geodetic 53N 6E ->
    // E 196105.283, N 557057.739 — projection half only (native in/out)
    val (x, y) = Crs.rdNewProjection.forward(6.0, 53.0)
    assert(math.abs(x - 196105.283) < 0.001 && math.abs(y - 557057.739) < 0.001,
      s"GN7-2 example ($x,$y)")
    // natural origin lands exactly on FE/FN
    val (ox, oy) = Crs.rdNewProjection.forward(
      5.0 + 23.0 / 60.0 + 15.5 / 3600.0, 52.0 + 9.0 / 60.0 + 22.178 / 3600.0)
    assert(math.abs(ox - 155000.0) < 1e-6 && math.abs(oy - 463000.0) < 1e-6)
    // full WGS84 chain (7-parameter Amersfoort shift): Dam Square
    // Amsterdam (4.8936E, 52.3731N) sits at the well-known RD
    // coordinates ~ (121386, 487362); without the datum shift the miss
    // is ~100 m
    val rd = Crs.byEpsg("EPSG:28992")
    val (ax, ay) = rd.forward(4.8936, 52.3731)
    assert(math.hypot(ax - 121386.0, ay - 487362.0) < 25.0, s"Dam ($ax,$ay)")
    val (px, py) = Crs.rdNewProjection.forward(4.8936, 52.3731)
    assert(math.hypot(px - ax, py - ay) > 50.0, "datum shift must matter")
    // roundtrip across the Dutch service domain
    for (lonI <- 3 to 7; latI <- 50 to 54) {
      val (rx, ry) = rd.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = rd.inverse(rx, ry)
      assert(math.abs(lo - lonI) < 5e-8 && math.abs(la - latI) < 5e-8,
        s"28992 ($lonI,$latI) -> ($lo,$la)")
    }
    // +proj=sterea parses to the same kernel
    val rec = Crs.parseProj("+proj=sterea +lat_0=52.15616055555555 " +
      "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 " +
      "+ellps=bessel").get
    val (sx, sy) = rec.forward(6.0, 53.0)
    assert(math.hypot(sx - x, sy - y) < 0.01, s"sterea record ($sx,$sy)")
  }

  test("intersects through a hole ring only: disc poking into a hole corner") {
    // regression (alternate-seed erosion fuzz): contact exists ONLY via
    // the hole ring — the shells never cross and both shell-vertex
    // containment probes land in the other's hole/exterior. Shell-only
    // ring testing returned false here, which made difference() take its
    // not-intersecting fast path and silently no-op the erosion.
    val holed = Polygon(Array(
      Array[Double](8.302, 3.302, 12.698, 3.302, 12.698, 7.698, 8.302, 7.698, 8.302, 3.302),
      Array[Double](8.698, 4, 8.698, 5, 9, 5, 9, 5.302, 10, 5.302, 10, 5,
        10.302, 5, 10.302, 4, 10, 4, 10, 3.698, 9, 3.698, 9, 4, 8.698, 4)))
    val disc = Constructive.buffer(Point(9.001, 5.001), 0.3016, 16)
    assert(Predicates.intersects(holed, disc))
    assert(Predicates.intersects(disc, holed))
    assert(Measures.distance(holed, disc) == 0.0)
    val diff = Overlay.difference(holed, disc)
    assert(Measures.area(diff) < Measures.area(holed) - 1e-3,
      "difference must carve the hole-corner lens")
    // and the original trigger: erosion of a holed square rounds the
    // hole corners (probe within d of the hole corner must be eroded)
    val g = Polygon(Array(
      Array[Double](8, 3, 13, 3, 13, 8, 8, 8, 8, 3),
      Array[Double](9, 4, 9, 5, 10, 5, 10, 4, 9, 4)))
    val eroded = Constructive.buffer(g, -0.3016)
    assert(!Predicates.intersects(eroded, Point(8.8604, 5.2232)))
  }

  test("canonical DE-9IM matrices for line/area and line/line pairs") {
    val sq = Polygon.box(0, 0, 10, 10)
    def rel(a: Geometry, b: Geometry) = Predicates.relate(a, b)
    // line crossing the polygon fully (both endpoints outside)
    assert(rel(LineString(Array(-5, 5, 15, 5)), sq) == "101FF0212")
    // chord: endpoints ON the boundary, interior strictly inside
    assert(rel(LineString(Array(0, 5, 10, 5)), sq) == "1FFF0F212")
    // line fully inside (classic within-line matrix)
    assert(rel(LineString(Array(2, 2, 8, 8)), sq) == "1FF0FF212")
    // segment collinear along an edge: interior ON the boundary only
    assert(rel(LineString(Array(2, 0, 8, 0)), sq) == "F1FF0F212")
    // disjoint line
    assert(rel(LineString(Array(20, 20, 30, 20)), sq) == "FF1FF0212")
    // endpoint touching the boundary from outside
    assert(rel(LineString(Array(10, 5, 20, 5)), sq) == "FF1F00212")
    // X-crossing lines: II is a POINT (0), not a line
    assert(rel(LineString(Array(0, 0, 10, 10)), LineString(Array(0, 10, 10, 0)))
      == "0F1FF0102")
    // sharing one endpoint only
    assert(rel(LineString(Array(0, 0, 5, 5)), LineString(Array(5, 5, 10, 0)))
      == "FF1F00102")
    // collinear partial overlap
    assert(rel(LineString(Array(0, 0, 6, 0)), LineString(Array(4, 0, 10, 0)))
      == "1010F0102")
    // identical lines
    assert(rel(LineString(Array(0, 0, 6, 0)), LineString(Array(0, 0, 6, 0)))
      == "1FFF0FFF2")
    // line ending ON another line's interior (T-junction): BI = 0
    assert(rel(LineString(Array(0, 0, 5, 0)), LineString(Array(5, -5, 5, 5)))
      == "FF10F0102")
  }

  test("Krovak (EPSG:5514 S-JTSK): GN7-2 example, datum, roundtrip, proj record") {
    import graft.sql.Crs
    // EPSG Guidance Note 7-2 worked example (S-JTSK geodetic on Bessel,
    // projection half only): 50°12'32.4416\"N 16°50'59.1790\"E (Greenwich)
    // -> Southing X 1050538.63, Westing Y 568991.00; East-North negates
    val lat = 50.0 + 12.0 / 60.0 + 32.4416 / 3600.0
    val lon = 16.0 + 50.0 / 60.0 + 59.179 / 3600.0
    val (x, y) = Crs.krovakProjection.forward(lon, lat)
    assert(math.abs(x - -568991.00) < 0.05 && math.abs(y - -1050538.63) < 0.05,
      s"GN7-2 Krovak example ($x,$y)")
    // full WGS84 chain: Prague centre (14.4208E, 50.0875N) must land in
    // the right kilometre of the 5514 plane (the precise anchor is the
    // GN7-2 example above; this guards axis/sign/datum-direction errors)
    val kro = Crs.byEpsg("EPSG:5514")
    val (px, py) = kro.forward(14.4208, 50.0875)
    assert(math.hypot(px - -743000.0, py - -1043300.0) < 1000.0, s"Prague ($px,$py)")
    val (qx, qy) = Crs.krovakProjection.forward(14.4208, 50.0875)
    assert(math.hypot(qx - px, qy - py) > 80.0, "datum shift must matter")
    // roundtrip across the Czech/Slovak service domain
    for (lonI <- 12 to 22; latI <- 48 to 51) {
      val (rx, ry) = kro.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = kro.inverse(rx, ry)
      assert(math.abs(lo - lonI) < 5e-8 && math.abs(la - latI) < 5e-8,
        s"5514 ($lonI,$latI) -> ($lo,$la)")
    }
    // +proj=krovak parses to the same kernel (EPSG defaults)
    val rec = Crs.parseProj("+proj=krovak +ellps=bessel").get
    val (kx, ky) = rec.forward(lon, lat)
    assert(math.hypot(kx - x, ky - y) < 0.01, s"krovak record ($kx,$ky)")
  }

  test("ellipsoidal Mercator (EPSG:3395): worked example, vs sphere, roundtrip") {
    import graft.sql.Crs
    val wm = Crs.byEpsg("EPSG:3395")
    // EPSG Guidance Note 7-2 Mercator variant A style check at the
    // equator: x = a * radians(lon) exactly, y(0) = 0
    val (x0, y0) = wm.forward(100.0, 0.0)
    assert(math.abs(x0 - 6378137.0 * math.toRadians(100.0)) < 1e-6 &&
      math.abs(y0) < 1e-6)
    // differs from SPHERICAL 3857 northing by ~30 km at 45 deg (the
    // well-known web-Mercator-vs-true-Mercator gap) while easting
    // matches exactly
    val (sx, sy) = Crs.lonLatToMercator(12.0, 45.0)
    val (ex, ey) = wm.forward(12.0, 45.0)
    assert(ex == sx)
    assert(sy - ey > 25000.0 && sy - ey < 35000.0, s"sphere-vs-ellipsoid gap ${sy - ey}")
    // roundtrip across the service domain
    for (lonI <- -170 to 170 by 20; latI <- -80 to 80 by 8) {
      val (x, y) = wm.forward(lonI.toDouble, latI.toDouble)
      val (lo, la) = wm.inverse(x, y)
      assert(math.abs(lo - lonI) < 1e-9 && math.abs(la - latI) < 1e-9,
        s"3395 ($lonI,$latI) -> ($lo,$la)")
    }
    // +proj=merc with lat_ts: scale pinned at the standard parallel
    val m2 = Crs.parseProj("+proj=merc +lat_ts=30 +ellps=WGS84").get
    val (mx1, _) = m2.forward(0.001, 30.0)
    val f = 1.0 / 298.257223563; val e2 = f * (2.0 - f)
    val s30 = math.sin(math.toRadians(30.0))
    val nRad = 6378137.0 / math.sqrt(1.0 - e2 * s30 * s30)
    val truth = nRad * math.cos(math.toRadians(30.0)) * math.toRadians(0.001)
    assert(math.abs(mx1 / truth - 1.0) < 1e-9, s"merc lat_ts scale ${mx1 / truth}")
  }

  test("proj-record parser: equivalence with EPSG table rows, towgs84, errors") {
    import graft.sql.Crs
    // full 27700 record (tmerc on airy + the OS 7-parameter towgs84,
    // proj convention native->WGS84) must agree with the hand-built
    // table row (WGS84->native parameters + exact matrix inverse) to
    // sub-mm: the negation is exact for translations and second-order
    // (~1e-8 m) for the published rotation magnitudes
    val rec27700 = Crs.parseProj("+proj=tmerc +lat_0=49 +lon_0=-2 " +
      "+k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894").get
    val table27700 = Crs.byEpsg("EPSG:27700")
    for (lon <- Seq(-5.0, -2.0, 0.5); lat <- Seq(50.5, 53.0, 57.0)) {
      val (px, py) = rec27700.forward(lon, lat)
      val (tx, ty) = table27700.forward(lon, lat)
      assert(math.hypot(px - tx, py - ty) < 1e-3, s"($lon,$lat): ($px,$py) vs ($tx,$ty)")
      val (lo, la) = rec27700.inverse(px, py)
      assert(math.abs(lo - lon) < 1e-7 && math.abs(la - lat) < 1e-7)
    }
    // somerc record == the 2056 table row bit-for-bit (same kernel)
    val recSwiss = Crs.parseProj("+proj=somerc +lat_0=46.952405555555556 " +
      "+lon_0=7.439583333333334 +k_0=1 +x_0=2600000 +y_0=1200000 " +
      "+ellps=bessel +towgs84=674.374,15.056,405.346").get
    val (se, sn) = recSwiss.forward(8.73, 46.04)
    val (te, tn) = Crs.byEpsg("EPSG:2056").forward(8.73, 46.04)
    // sub-um: only the decimal-vs-arithmetic lat_0 literal differs
    assert(math.hypot(se - te, sn - tn) < 1e-6, s"($se,$sn) vs ($te,$tn)")
    // lcc / aea / laea families parse and hit their kernels
    val lcc = Crs.parseProj("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 " +
      "+lat_2=44 +x_0=700000 +y_0=6600000 +ellps=GRS80").get
    val (fx, fy) = lcc.forward(4.0, 47.0)
    val (gx, gy) = Crs.byEpsg("EPSG:2154").forward(4.0, 47.0)
    assert(fx == gx && fy == gy)
    // longlat identity and webmerc
    val ll = Crs.parseProj("+proj=longlat +ellps=WGS84").get
    assert(ll.forward(12.5, -3.25) == ((12.5, -3.25)))
    val wm = Crs.parseProj("+proj=webmerc").get
    assert(wm.forward(1.0, 1.0) == Crs.lonLatToMercator(1.0, 1.0))
    // unsupported / malformed records are rejected, not mis-parsed
    assert(Crs.parseProj("+proj=igh").isEmpty, "unsupported family")
    assert(Crs.parseProj("+proj=tmerc +ellps=marsIAU").isEmpty, "unknown ellipsoid")
    assert(Crs.parseProj("+proj=tmerc +lat_0=abc").isEmpty, "malformed number")
    assert(Crs.parseProj("+proj=utm +ellps=GRS80").isEmpty, "utm without zone")
  }

  test("EPSG:6933 EASE-Grid 2.0 (cylindrical equal-area): published extent, area scale 1, roundtrip") {
    val p = graft.sql.Crs.byEpsg("EPSG:6933")
    // NSIDC EASE-Grid 2.0 documentation: the global grid's map width is
    // +-17367530.44 m at +-180 deg (independent published check of k0)
    val (xMax, _) = p.forward(180.0, 0.0)
    assert(math.abs(xMax - 17367530.44) < 0.5, s"x(180) = $xMax")
    // equal-area property: numerical Jacobian == 1 everywhere on an
    // ellipsoid with authalic radius scaling — check |J| equals the
    // ellipsoidal area element to <1e-6 relative at spread test points
    for ((lon, lat) <- Seq((0.0, 0.0), (45.0, 30.0), (-120.0, 60.0), (91.0, -45.0))) {
      val h = 1e-5
      val (x0, y0) = p.forward(lon, lat)
      val (x1, _) = p.forward(lon + h, lat)
      val (_, y1) = p.forward(lon, lat + h)
      val a = 6378137.0; val e2 = 0.00669437999014
      val phi = math.toRadians(lat)
      val w = 1.0 - e2 * math.sin(phi) * math.sin(phi)
      // ellipsoid area element per degree-square at phi
      val dA = (a * math.cos(phi) * math.toRadians(1.0) / math.sqrt(w)) *
        (a * (1.0 - e2) * math.toRadians(1.0) / math.pow(w, 1.5))
      val jac = ((x1 - x0) / h) * ((y1 - y0) / h)
      assert(math.abs(jac / dA - 1.0) < 1e-5, s"area scale at ($lon,$lat): ${jac / dA}")
      // closed-loop roundtrip: the Snyder 3-18 authalic series truncates
      // at e^6 — exact to ~1e-8 deg (mm-level), same class as the laea
      // inverse
      val (lo, la) = p.inverse(x0, y0)
      assert(math.hypot(lo - lon, la - lat) < 1e-7, s"roundtrip ($lon,$lat)->($lo,$la)")
    }
    // proj-record route reaches the same kernel
    val viaProj = graft.sql.Crs.parseProj(
      "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84").get
    val (px, py) = viaProj.forward(45.0, 30.0)
    val (ex, ey) = p.forward(45.0, 30.0)
    assert(px == ex && py == ey)
  }

  test("lineSubstring: interior vertex kept, cut interpolation, degenerate/clamped windows") {
    val l = LineString(Array(0.0, 0, 10, 0, 10, 10)) // length 20, corner at s=10
    // window spanning the corner keeps it, endpoints interpolated
    val mid = Constructive.lineSubstring(l, 0.25, 0.75).asInstanceOf[LineString]
    assert(mid.xy.toSeq == Seq(5.0, 0.0, 10.0, 0.0, 10.0, 5.0), mid.xy.toSeq)
    // reversed fractions swap; out-of-range clamp
    val rev = Constructive.lineSubstring(l, 0.75, 0.25).asInstanceOf[LineString]
    assert(rev.xy.toSeq == mid.xy.toSeq)
    val full = Constructive.lineSubstring(l, -1.0, 2.0).asInstanceOf[LineString]
    assert(full.xy.toSeq == l.xy.toSeq)
    // window inside one segment: straight 2-point cut
    val seg = Constructive.lineSubstring(l, 0.1, 0.2).asInstanceOf[LineString]
    assert(seg.xy.toSeq == Seq(2.0, 0.0, 4.0, 0.0))
    // degenerate window yields the interpolated point (PostGIS contract)
    val p5 = Constructive.lineSubstring(l, 0.5, 0.5).asInstanceOf[Point]
    assert(p5.x == 10.0 && p5.y == 0.0)
    val p1 = Constructive.lineSubstring(l, 1.0, 1.0).asInstanceOf[Point]
    assert(p1.x == 10.0 && p1.y == 10.0)
    // empty input stays empty
    assert(Constructive.lineSubstring(LineString(Array.empty[Double]), 0.2, 0.8).isEmpty)
  }

  test("split: on-line point, off-line point, crossing/collinear/multi splitters") {
    val l = LineString(Array(0.0, 0, 10, 0, 10, 10)) // corner at (10, 0)
    def lens(gc: GeometryCollection): Seq[Double] =
      gc.geoms.toSeq.map(g => Measures.pathLength(g.asInstanceOf[LineString].xy))
    // corner vertex point: two parts of length 10
    assert(lens(Constructive.split(l, Point(10, 0))) == Seq(10.0, 10.0))
    // interior point mid-segment
    assert(lens(Constructive.split(l, Point(4, 0))) == Seq(4.0, 16.0))
    // off-line point: single part, unchanged
    assert(lens(Constructive.split(l, Point(5, 3))) == Seq(20.0))
    // endpoint of the line: a no-op cut
    assert(lens(Constructive.split(l, Point(0, 0))) == Seq(20.0))
    // crossing line cuts once; a second crossing from a MultiPoint combo
    assert(lens(Constructive.split(l,
      LineString(Array(5.0, -1, 5, 1)))) == Seq(5.0, 15.0))
    assert(lens(Constructive.split(l,
      MultiPoint(Array(Point(2, 0), Point(10, 5))))) == Seq(2.0, 13.0, 5.0))
    // collinear overlap cuts at the overlap endpoints
    assert(lens(Constructive.split(l,
      LineString(Array(3.0, 0, 7, 0)))) == Seq(3.0, 4.0, 13.0))
    // polygon splitter cuts at boundary crossings (enter + exit)
    assert(lens(Constructive.split(l,
      Polygon.box(4, -1, 6, 1))) == Seq(4.0, 2.0, 14.0))
    // polygon input with a point splitter rejected loud
    intercept[IllegalArgumentException] {
      Constructive.split(Polygon.box(0, 0, 1, 1), Point(0, 0))
    }
  }

  test("split polygon by line: halves, diagonal, miss, hole-aware") {
    val box = Polygon.box(0, 0, 10, 10)
    def areas(gc: GeometryCollection): Seq[Double] =
      gc.geoms.toSeq.map(Measures.area).sorted
    // vertical cut through the middle: two 40/60 parts
    val v = Constructive.split(box, LineString(Array(4.0, -1, 4, 11)))
    assert(areas(v).map(a => math.round(a * 1e6) / 1e6) == Seq(40.0, 60.0), areas(v))
    // diagonal cut: two 50-area triangles
    val d = Constructive.split(box, LineString(Array(-1.0, -1, 11, 11)))
    assert(areas(d).map(a => math.round(a * 1e6) / 1e6) == Seq(50.0, 50.0), areas(d))
    // a line that misses the interior: the whole polygon back
    val miss = Constructive.split(box, LineString(Array(20.0, 0, 20, 10)))
    assert(areas(miss) == Seq(100.0))
    // polygon with a hole: the cut through the hole makes two C-shaped
    // parts whose areas exclude the hole
    val holed = Polygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(4.0, 4, 4, 6, 6, 6, 6, 4, 4, 4)))
    val h = Constructive.split(holed, LineString(Array(5.0, -1, 5, 11)))
    assert(h.geoms.length == 2, s"expected 2 parts, got ${h.geoms.length}")
    assert(math.abs(areas(h).sum - 96.0) < 1e-9, areas(h))
  }
}
