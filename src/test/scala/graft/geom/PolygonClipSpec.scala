package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** General boolean overlay (PolygonClip) — the cases the round-2
  * convex-only decomposition could not express: concave∘concave,
  * holes on either side, multipolygons, collinear shared edges,
  * pinch points, and the inclusion–exclusion identities that tie
  * union/intersection/difference together.
  */
class PolygonClipSpec extends AnyFunSuite {

  private def area(g: Geometry): Double = Measures.area(g)
  private def perim(g: Geometry): Double = Measures.perimeter(g)
  private def nParts(g: Geometry): Int =
    Geometry.parts(g).count(p => !p.isEmpty)
  private def nHoles(g: Geometry): Int =
    Geometry.parts(g).collect { case p: Polygon => p.numHoles }.sum

  private def u(a: Geometry, b: Geometry) = Overlay.union(a, b)
  private def i(a: Geometry, b: Geometry) = Overlay.intersection(a, b)
  private def d(a: Geometry, b: Geometry) = Overlay.difference(a, b)

  private val eps = 1e-9

  private def assertClose(x: Double, y: Double, label: String = ""): Unit =
    assert(math.abs(x - y) < eps * math.max(1.0, math.abs(y)), s"$label: $x != $y")

  // inclusion–exclusion triple check for any operand pair
  private def checkAlgebra(a: Geometry, b: Geometry): Unit = {
    val ia = area(a); val ib = area(b)
    val int = area(i(a, b))
    assertClose(area(u(a, b)), ia + ib - int, "union area")
    assertClose(area(d(a, b)), ia - int, "difference area")
    assertClose(area(d(b, a)), ib - int, "reverse difference area")
    assertClose(area(Overlay.symDifference(a, b)), ia + ib - 2 * int, "symdiff area")
  }

  test("concave-concave overlapping union merges into one polygon") {
    // two interlocking L-shapes
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))") // area 12
    val b = Wkt.read("POLYGON ((1 1, 5 1, 5 5, 3 5, 3 3, 1 3, 1 1))") // area 12
    val un = u(a, b)
    checkAlgebra(a, b)
    assert(nParts(un) == 1, Wkt.write(un))
    assert(nHoles(un) == 0)
    // A∩B: region [1,4]x[1,2] (3) + [1,2]x[2,3] (1) + [3,4]... verify via algebra only
    val int = i(a, b)
    assert(int.topoDim == 2)
    assertClose(area(un), 12 + 12 - area(int))
  }

  test("overlapping squares: all four ops exact") {
    val a = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Wkt.read("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    checkAlgebra(a, b)
    assertClose(area(i(a, b)), 1.0)
    assertClose(area(u(a, b)), 7.0)
    assert(nParts(u(a, b)) == 1)
    assertClose(perim(u(a, b)), 12.0)
    // symmetric difference: two L-shaped parts touching at two pinch points
    val sd = Overlay.symDifference(a, b)
    assertClose(area(sd), 6.0)
    assert(nParts(sd) == 2, Wkt.write(sd))
  }

  test("union creating a hole (C-shape closed by a bar)") {
    // C-shape: square ring open on the right + bar that closes it
    val c = Wkt.read(
      "POLYGON ((0 0, 6 0, 6 1, 1 1, 1 5, 6 5, 6 6, 0 6, 0 0))") // area 6+5+6*1? compute: 36 outer minus... walk below
    val bar = Wkt.read("POLYGON ((5 0, 6 0, 6 6, 5 6, 5 0))")
    val un = u(c, bar)
    checkAlgebra(c, bar)
    assert(nParts(un) == 1, Wkt.write(un))
    assert(nHoles(un) == 1, Wkt.write(un))
    // enclosed hole is (1,1)-(5,5) region: 4x4 = 16
    val outerArea = 36.0
    assertClose(area(un), outerArea - 16.0)
  }

  test("difference with concave subtrahend") {
    val a = Wkt.read("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))") // 36
    val b = Wkt.read("POLYGON ((1 1, 5 1, 5 5, 3 5, 3 3, 1 3, 1 1))") // L, area 12
    checkAlgebra(a, b)
    val diff = d(a, b)
    assertClose(area(diff), 24.0)
    assert(nParts(diff) == 1)
  }

  test("difference carving a hole (subtrahend strictly inside)") {
    val a = Wkt.read("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))")
    val b = Wkt.read("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    val diff = d(a, b)
    assertClose(area(diff), 32.0)
    assert(nParts(diff) == 1)
    assert(nHoles(diff) == 1, Wkt.write(diff))
    assertClose(perim(diff), 24.0 + 8.0)
  }

  test("subject with hole: difference merges hole with subtrahend") {
    val a = Wkt.read(
      "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))") // 32
    val b = Wkt.read("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))") // 4, overlaps hole corner [2,3]x[2,3]
    checkAlgebra(a, b)
    val diff = d(a, b)
    // A∩B = 4 - 1 = 3; diff = 32 - 3 = 29
    assertClose(area(diff), 29.0)
    assert(nParts(diff) == 1)
    assert(nHoles(diff) == 1, Wkt.write(diff))
  }

  test("subject with hole: intersection punches through") {
    val donut = Wkt.read(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))") // 96
    val b = Wkt.read("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))") // 16 covering hole
    checkAlgebra(donut, b)
    val int = i(donut, b)
    assertClose(area(int), 12.0) // 16 - 4 hole
    assert(nHoles(int) == 1, Wkt.write(int))
    // union of donut and the hole-covering square fills the hole
    val un = u(donut, b)
    assertClose(area(un), 100.0)
    assert(nHoles(un) == 0, Wkt.write(un))
    assert(nParts(un) == 1)
  }

  test("collinear shared edges (touch-union merges, no sliver)") {
    val a = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Wkt.read("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))") // shares edge x=2
    val un = u(a, b)
    assertClose(area(un), 8.0)
    assert(nParts(un) == 1, Wkt.write(un))
    assertClose(perim(un), 12.0)
    assertClose(area(i(a, b)), 0.0) // edge-only intersection has zero area
    assertClose(area(d(a, b)), 4.0)
  }

  test("partial collinear overlap on boundary") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = Wkt.read("POLYGON ((4 1, 6 1, 6 3, 4 3, 4 1))") // touches along x=4, y in [1,3]
    val un = u(a, b)
    assertClose(area(un), 20.0)
    assert(nParts(un) == 1, Wkt.write(un))
    checkAlgebra(a, b)
  }

  test("multipolygon operands") {
    val a = Wkt.read(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 0, 7 0, 7 2, 5 2, 5 0)))") // 8
    val b = Wkt.read("POLYGON ((1 1, 6 1, 6 4, 1 4, 1 1))") // 15, overlaps both parts
    checkAlgebra(a, b)
    val un = u(a, b)
    assert(nParts(un) == 1, Wkt.write(un)) // bridge connects the two squares
    assertClose(area(un), 8.0 + 15.0 - area(i(a, b)))
    val diff = d(a, b)
    assert(nParts(diff) == 2, Wkt.write(diff)) // both squares lose their inner corner
  }

  test("difference splitting subject into multiple parts") {
    val a = Wkt.read("POLYGON ((0 0, 6 0, 6 2, 0 2, 0 0))") // 12, wide bar
    val b = Wkt.read("POLYGON ((2.5 -1, 3.5 -1, 3.5 3, 2.5 3, 2.5 -1))") // vertical cut
    val diff = d(a, b)
    assertClose(area(diff), 12.0 - 2.0)
    assert(nParts(diff) == 2, Wkt.write(diff))
    checkAlgebra(a, b)
  }

  test("identical operands") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    assertClose(area(u(a, a)), area(a))
    assertClose(area(i(a, a)), area(a))
    assert(d(a, a).isEmpty)
    assert(Overlay.symDifference(a, a).isEmpty)
  }

  test("diagonal (non-axis-aligned) operands") {
    val a = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val b = Wkt.read("POLYGON ((2 -1, 5 2, 2 5, -1 2, 2 -1))") // rotated square, area 18
    checkAlgebra(a, b)
    val int = i(a, b)
    // intersection is the square minus 4 corner triangles of legs 1:
    // corners at (0,0),(4,0),(4,4),(0,4) cut by diagonals -> area 16 - 4*(1*1/2)... compute
    // corner (0,0): cut line from (1,0)... line x+y=1 -> triangle area 1/2; 4 corners cut by
    // lines x+y=1, x-y=3 (i.e. (4,1)-(3,0)) etc. Each cuts右 an isoceles right triangle legs 1 -> 0.5
    assertClose(area(int), 16.0 - 4 * 0.5)
  }

  test("n-ary unionAll folds through the topological merge") {
    // staircase of overlapping squares: [k, k+2]^2 for k = 0..3
    val squares = (0 to 3).map { k =>
      Wkt.read(s"POLYGON (($k $k, ${k + 2} $k, ${k + 2} ${k + 2}, $k ${k + 2}, $k $k))")
    }
    val un = Overlay.unionAll(squares)
    // each consecutive pair overlaps 1x1: total = 4*4 - 3*1 = 13
    assertClose(area(un), 13.0)
    assert(nParts(un) == 1, Wkt.write(un))
  }

  test("union result is deterministic and canonical") {
    val a = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Wkt.read("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    val w1 = Wkt.write(u(a, b))
    val w2 = Wkt.write(u(a, b))
    assert(w1 == w2)
    // op is symmetric up to canonical form
    assert(Wkt.write(u(b, a)) == w1)
  }

  test("intersection of edge-touching polygons is the shared LineString") {
    val a = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Wkt.read("POLYGON ((2 0.5, 4 0.5, 4 1.5, 2 1.5, 2 0.5))") // touches x=2, y in [0.5,1.5]
    val int = i(a, b)
    assert(int.topoDim == 1, Wkt.write(int))
    assertClose(Measures.length(int), 1.0, "shared edge length")
    assertClose(area(int), 0.0)
  }

  test("intersection of corner-touching polygons is the touch Point") {
    val a = Wkt.read("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = Wkt.read("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    val int = i(a, b)
    assert(int.isInstanceOf[Point], Wkt.write(int))
    val p = int.asInstanceOf[Point]
    assert(p.x == 2.0 && p.y == 2.0)
  }

  test("mixed-dimension union absorbs the covered part of the lower dimension") {
    val poly = Wkt.read("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    val line = Wkt.read("LINESTRING (2 2, 6 2)") // 2 inside, 2 outside
    val un = u(poly, line)
    val parts = Geometry.parts(un)
    assertClose(area(un), 16.0, "union area")
    val lineParts = parts.filter(_.topoDim == 1)
    assert(lineParts.nonEmpty, Wkt.write(un))
    assertClose(lineParts.map(Measures.length).sum, 2.0, "outside line span")
    // a fully-covered line disappears into the polygon
    val inner = Wkt.read("LINESTRING (1 1, 3 3)")
    assert(u(poly, inner) == poly || Wkt.write(u(poly, inner)) == Wkt.write(poly))
    // point outside a line survives; point on the line is absorbed
    val l2 = Wkt.read("LINESTRING (0 0, 4 0)")
    assert(Geometry.parts(u(l2, Point(2, 0))).count(_.topoDim == 0) == 0)
    assert(Geometry.parts(u(l2, Point(2, 1))).count(_.topoDim == 0) == 1)
  }

  test("negative buffer of touching multipolygon parts merges before eroding") {
    // two squares sharing edge x=2: merged rect [0,4]x[0,2]; erode 0.5 ->
    // [0.5,3.5]x[0.5,1.5] = 3.0 (per-part erosion would wrongly give 2.0)
    val m = Wkt.read(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((2 0, 4 0, 4 2, 2 2, 2 0)))")
    val eroded = Constructive.buffer(m, -0.5)
    assertClose(area(eroded), 3.0, "merged erosion area")
    assert(nParts(eroded) == 1, Wkt.write(eroded))
  }

  test("negative buffer of concave polygon (erosion via general difference)") {
    // L-shape eroded by 0.5: offset polygon area has closed form for this shape
    val l = Wkt.read("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
    val eroded = Constructive.buffer(l, -0.5)
    assert(!eroded.isEmpty)
    // Exact erosion: [0.5,2]^2 minus quarter-disc r=0.5 at the reflex
    // corner (2,2), plus arm rectangles [2,3.5]x[0.5,1.5] and
    // [0.5,1.5]x[2,3.5]: 2.25 - pi/16 + 1.5 + 1.5
    val expected = 5.25 - math.Pi / 16
    assert(math.abs(Measures.area(eroded) - expected) < 0.01,
      s"area ${Measures.area(eroded)} vs $expected")
  }
}
