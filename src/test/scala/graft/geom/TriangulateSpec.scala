package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class TriangulateSpec extends AnyFunSuite {

  private def wkt(s: String): Geometry = Wkt.read(s)

  /** Area conservation + per-triangle containment. `strictCovers` uses
    * the full polygon-covers predicate (exact on grid-aligned cases);
    * randomized float cases fall back to a centroid-inside check — with
    * exact area conservation, any escaping triangle would double-count
    * area, so the pair of checks is sound there too.
    */
  private def check(g: Geometry, expectedCount: Int = -1,
      strictCovers: Boolean = true): Unit = {
    val tris = Triangulate.triangulatePolygon(g).asInstanceOf[MultiPolygon]
    val area = Measures.area(g)
    val sum = tris.polys.map(Measures.area(_: Geometry)).sum
    assert(math.abs(sum - area) < 1e-9 * math.max(1.0, area),
      s"area $sum vs $area over ${tris.polys.length} triangles")
    tris.polys.foreach { t =>
      assert(t.shell.length == 8, "triangles have 3 distinct vertices")
      assert(Measures.area(t: Geometry) > 0, "no degenerate triangle emitted")
      if (strictCovers)
        assert(Predicates.covers(g, t), s"triangle ${Wkt.write(t)} escapes")
      else {
        val s = t.shell
        val cx = (s(0) + s(2) + s(4)) / 3.0; val cy = (s(1) + s(3) + s(5)) / 3.0
        assert(Predicates.covers(g, Point(cx, cy)),
          s"triangle centroid ($cx,$cy) escapes")
      }
    }
    if (expectedCount >= 0)
      assert(tris.polys.length == expectedCount,
        s"expected $expectedCount triangles, got ${tris.polys.length}")
  }

  test("convex shapes: n-2 triangles, exact area partition") {
    check(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"), 2)
    check(wkt("POLYGON ((0 0, 4 0, 6 2, 4 4, 0 4, -2 2, 0 0))"), 4)
    check(wkt("POLYGON ((0 0, 5 0, 2 4, 0 0))"), 1)
  }

  test("concave shapes partition exactly") {
    check(wkt("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"), 4) // L
    // comb with two notches
    check(wkt("POLYGON ((0 0, 8 0, 8 4, 6 4, 6 1, 5 1, 5 4, 3 4, 3 1, 2 1, 2 4, 0 4, 0 0))"))
    // spiral-ish concave
    check(wkt("POLYGON ((0 0, 6 0, 6 6, 1 6, 1 2, 4 2, 4 4, 2 4, 2 5, 5 5, 5 1, 0 1, 0 0))"))
  }

  test("holes: bridged loop yields n + m + 2 - 2 triangles per hole") {
    // square (4) + square hole (4): 4 + 6 - 2 = 8
    check(wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"), 8)
    // hole orientation must not matter (CCW hole normalized internally)
    check(wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"), 8)
    // two holes side by side
    check(wkt("POLYGON ((0 0, 12 0, 12 6, 0 6, 0 0), " +
      "(2 2, 4 2, 4 4, 2 4, 2 2), (8 2, 10 2, 10 4, 8 4, 8 2))"))
    // off-center hole near the right edge (bridge ray is short)
    check(wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (7 4, 9 4, 9 6, 7 6, 7 4))"))
    // triangle hole in a concave shell
    check(wkt("POLYGON ((0 0, 10 0, 10 10, 5 6, 0 10, 0 0), (4 2, 6 2, 5 4, 4 2))"))
  }

  test("multipolygon, empty, and non-areal inputs") {
    check(wkt("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 0, 13 0, 10 3, 10 0)))"), 3)
    assert(Triangulate.triangulatePolygon(wkt("POLYGON EMPTY"))
      .asInstanceOf[MultiPolygon].polys.isEmpty)
    intercept[IllegalArgumentException] {
      Triangulate.triangulatePolygon(wkt("LINESTRING (0 0, 1 1)"))
    }
  }

  test("randomized star-shaped polygons: 200 seeded cases partition exactly") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 200) {
      val n = 4 + rnd.nextInt(12)
      // jittered evenly-spread angles: every cyclic gap stays well under
      // π, which (with the origin in the kernel) guarantees the radial
      // polygon is simple and CCW — free angles can leave a >π closing
      // gap and self-intersect
      val angles = Array.tabulate(n)(i =>
        2 * math.Pi * (i + 0.1 + 0.8 * rnd.nextDouble()) / n)
      val xy = new Array[Double]((n + 1) * 2)
      for (i <- 0 until n) {
        val r = 1.0 + 4.0 * rnd.nextDouble()
        xy(2 * i) = r * math.cos(angles(i))
        xy(2 * i + 1) = r * math.sin(angles(i))
      }
      xy(2 * n) = xy(0); xy(2 * n + 1) = xy(1)
      check(Polygon(Array(xy)), n - 2, strictCovers = false)
    }
  }

  test("determinism: identical output across calls") {
    val g = wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val a = Wkt.write(Triangulate.triangulatePolygon(g))
    val b = Wkt.write(Triangulate.triangulatePolygon(g))
    assert(a == b)
  }
}
