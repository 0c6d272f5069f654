package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** PostGIS-style ST_Subdivide (Constructive.subdivide): every piece
  * respects the vertex cap, pieces partition the input exactly (areas sum
  * to the original; pairwise interiors disjoint), holes survive, and
  * degenerate inputs pass through.
  */
class SubdivideSpec extends AnyFunSuite {

  private def areaSum(ps: Seq[Geometry]): Double =
    ps.map(Measures.area).sum

  test("dense ring splits into capped tiles that partition the area") {
    // 64-segment circle approximation: 65 ring vertices
    val n = 64
    val ring = (0 to n).map { i =>
      val a = 2 * math.Pi * (i % n) / n
      (10 + 7 * math.cos(a), 10 + 7 * math.sin(a))
    }
    val circle = Polygon(Array(ring.flatMap(p => Seq(p._1, p._2)).toArray))
    val pieces = Constructive.subdivide(circle, 16)
    assert(pieces.size > 1)
    assert(pieces.forall(_.numPoints <= 16),
      pieces.map(_.numPoints).mkString(","))
    assert(math.abs(areaSum(pieces) / Measures.area(circle) - 1.0) < 1e-9)
    // pairwise interiors disjoint: overlap area ~ 0 for every pair
    for (Seq(a, b) <- pieces.combinations(2)) {
      val inter = Overlay.intersection(a, b)
      assert(Measures.area(inter) < 1e-9, Wkt.write(inter))
    }
  }

  test("holes survive subdivision (donut area preserved)") {
    val donut = Wkt.read(
      "POLYGON ((0 0, 10 0, 10 2, 10 4, 10 6, 10 8, 10 10, 8 10, 6 10, 4 10, 2 10, 0 10, 0 8, 0 6, 0 4, 0 2, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val pieces = Constructive.subdivide(donut, 12)
    assert(pieces.size > 1 && pieces.forall(_.numPoints <= 12))
    assert(math.abs(areaSum(pieces) - Measures.area(donut)) < 1e-9)
    // the hole's 4 units^2 stay missing
    assert(math.abs(areaSum(pieces) - 96.0) < 1e-9)
  }

  test("multipolygon subdivides per part; small inputs pass through") {
    val mp = Wkt.read(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 9 5, 9 9, 5 9, 5 5)))")
    val pieces = Constructive.subdivide(mp, 8)
    // both parts are tiny -> pass through untouched
    assert(pieces.size == 2)
    assert(math.abs(areaSum(pieces) - Measures.area(mp)) < 1e-12)

    assert(Constructive.subdivide(Point(3, 4), 8).map(Wkt.write) == Seq("POINT (3 4)"))
    assert(Constructive.subdivide(Wkt.read("POLYGON EMPTY"), 8).isEmpty)
  }

  test("long linestring splits with total length preserved") {
    val xs = (0 to 40).flatMap(i => Seq(i.toDouble, (i % 2).toDouble)).toArray
    val zig = LineString(xs)
    val pieces = Constructive.subdivide(zig, 10)
    assert(pieces.size > 1 && pieces.forall(_.numPoints <= 10))
    assert(math.abs(pieces.map(Measures.length).sum - Measures.length(zig)) < 1e-9)
  }

  test("maxVertices floor enforced") {
    intercept[IllegalArgumentException] {
      Constructive.subdivide(Point(0, 0), 4)
    }
  }
}
