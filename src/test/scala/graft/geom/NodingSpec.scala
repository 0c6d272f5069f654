package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class NodingSpec extends AnyFunSuite {

  private def wkt(s: String): Geometry = Wkt.read(s)

  // ------------------------------------------------------------------ node

  test("node splits a proper crossing into four segments") {
    val out = Noding.node(wkt("MULTILINESTRING ((0 0, 4 4), (0 4, 4 0))"))
    assert(out.numGeometries == 4)
    assert(math.abs(Measures.length(out) - 2 * math.hypot(4, 4)) < 1e-12)
  }

  test("node splits at T-touches and collinear overlaps") {
    // T: vertical touches the horizontal mid-segment
    val t = Noding.node(wkt("MULTILINESTRING ((0 0, 10 0), (5 0, 5 5))"))
    assert(t.numGeometries == 3)
    // collinear overlap: shared span [3,7] splits both, dedup leaves 3 pieces
    val c = Noding.node(wkt("MULTILINESTRING ((0 0, 7 0), (3 0, 10 0))"))
    assert(c.numGeometries == 3)
    assert(math.abs(Measures.length(c) - 10.0) < 1e-12)
  }

  test("node of already-noded linework is a segment dedup") {
    val out = Noding.node(wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (0 0, 1 0))"))
    assert(out.numGeometries == 2)
  }

  // -------------------------------------------------------------- validity

  test("isValid accepts valid polygons incl. holes and rejects the bowtie") {
    assert(Noding.isValid(wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")))
    assert(Noding.isValid(
      wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")))
    val bow = wkt("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))")
    assert(!Noding.isValid(bow))
    assert(Noding.isValidReason(bow).startsWith("Self-intersection"))
  }

  test("isValid rejects a hole outside the shell, accepts lines and points") {
    val holeOut = wkt(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (10 10, 11 10, 11 11, 10 11, 10 10))")
    assert(Noding.isValidReason(holeOut) == "Hole lies outside shell")
    assert(Noding.isValid(wkt("LINESTRING (0 0, 1 1, 0 1, 1 0)"))) // self-crossing line is valid
    assert(Noding.isValid(wkt("POINT (1 1)")))
  }

  // ------------------------------------------------------------- makeValid

  test("makeValid repairs the bowtie into two triangles of half the box") {
    val bow = wkt("POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))")
    val fixed = Noding.makeValid(bow)
    assert(Noding.isValid(fixed))
    assert(math.abs(Measures.area(fixed) - 8.0) < 1e-9) // 2 * (4*4/4)
    assert(fixed.numGeometries == 2)
  }

  test("makeValid passes valid geometry through untouched") {
    val p = wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Noding.makeValid(p) eq p)
    val l = wkt("LINESTRING (0 0, 1 1)")
    assert(Noding.makeValid(l) eq l)
  }

  test("makeValid dissolves overlapping multipolygon members") {
    val m = wkt("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((2 2, 6 2, 6 6, 2 6, 2 2)))")
    val fixed = Noding.makeValid(m)
    assert(math.abs(Measures.area(fixed) - (16 + 16 - 4)) < 1e-9)
  }

  // -------------------------------------------------------- setPrecision

  test("setPrecision snaps to the grid and drops repeats") {
    val l = Extended.setPrecision(wkt("LINESTRING (0.04 0.04, 1.26 0.04, 1.24 1.96)"), 0.1)
      .asInstanceOf[LineString]
    assert(Wkt.write(l) == "LINESTRING (0 0, 1.3 0, 1.2 2)")
    // collapse: all points land on one node
    assert(Extended.setPrecision(wkt("LINESTRING (0.01 0.01, 0.04 0.02)"), 1.0).isEmpty)
  }

  test("setPrecision keeps polygons closed and drops collapsed rings") {
    val p = Extended.setPrecision(
      wkt("POLYGON ((0 0, 4.04 0, 4.04 3.96, 0 3.96, 0 0), (1 1, 1.02 1, 1.02 1.02, 1 1.02, 1 1))"),
      0.1).asInstanceOf[Polygon]
    assert(p.numHoles == 0) // the sub-grid hole collapses away
    assert(math.abs(Measures.area(p) - 4.0 * 4.0) < 1e-9)
    assert(Noding.isValid(p))
  }

  // ------------------------------------------------------------- force3d

  test("force3d fills Z on points and lines, passes areal through") {
    val p = Extended.force3d(wkt("POINT (1 2)"), 7.0).asInstanceOf[Point]
    assert(p.hasZ && p.z == 7.0)
    // existing Z is preserved
    val pz = Extended.force3d(wkt("POINT Z (1 2 3)"), 7.0).asInstanceOf[Point]
    assert(pz.z == 3.0)
    val l = Extended.force3d(wkt("LINESTRING (0 0, 1 1)"), 2.0).asInstanceOf[LineString]
    assert(l.hasZ && l.zs.forall(_ == 2.0))
    val poly = wkt("POLYGON ((0 0, 1 0, 0 1, 0 0))")
    assert(Extended.force3d(poly, 2.0) eq poly)
  }
}
