package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class PolygonizeSpec extends AnyFunSuite {

  private def wkt(s: String): Geometry = Wkt.read(s)

  test("a single closed ring polygonizes to one polygon") {
    val out = Polygonize.polygonize(
      wkt("MULTILINESTRING ((0 0, 4 0), (4 0, 4 3), (4 3, 0 3), (0 3, 0 0))"))
    assert(out.numGeometries == 1)
    assert(math.abs(Measures.area(out) - 12.0) < 1e-12)
  }

  test("a square with a diagonal splits into two triangle faces") {
    val out = Polygonize.polygonize(
      wkt("MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (0 0, 4 4))"))
      .asInstanceOf[GeometryCollection]
    assert(out.numGeometries == 2)
    out.geoms.foreach(t => assert(math.abs(Measures.area(t) - 8.0) < 1e-12))
  }

  test("nested disconnected squares: outer gets the hole, inner stays a face") {
    val out = Polygonize.polygonize(
      wkt("MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))"))
      .asInstanceOf[GeometryCollection]
    assert(out.numGeometries == 2)
    val areas = out.geoms.map(Measures.area).sorted
    assert(math.abs(areas(0) - 9.0) < 1e-12)   // inner square face
    assert(math.abs(areas(1) - 91.0) < 1e-12)  // outer minus hole
    // total area = full outer square
    assert(math.abs(Measures.area(out) - 100.0) < 1e-12)
    val withHole = out.geoms.find(_.asInstanceOf[Polygon].numHoles == 1)
    assert(withHole.isDefined)
  }

  test("dangles are pruned, open chains yield nothing") {
    // ring with a spur: the spur must not corrupt the face
    val out = Polygonize.polygonize(
      wkt("MULTILINESTRING ((0 0, 4 0, 4 4, 0 4, 0 0), (4 4, 7 7))"))
    assert(out.numGeometries == 1)
    assert(math.abs(Measures.area(out) - 16.0) < 1e-12)
    // pure open linework: no faces at all
    assert(Polygonize.polygonize(
      wkt("MULTILINESTRING ((0 0, 1 0), (1 0, 2 1))")).numGeometries == 0)
  }

  test("two rings sharing an edge produce two faces covering their union") {
    val out = Polygonize.polygonize(wkt(
      "MULTILINESTRING ((0 0, 2 0), (2 0, 2 2), (2 2, 0 2), (0 2, 0 0), " +
        "(2 0, 5 0), (5 0, 5 2), (5 2, 2 2))"))
      .asInstanceOf[GeometryCollection]
    assert(out.numGeometries == 2)
    val areas = out.geoms.map(Measures.area).sorted
    assert(math.abs(areas(0) - 4.0) < 1e-12)
    assert(math.abs(areas(1) - 6.0) < 1e-12)
  }

  test("point and empty inputs are empty collections") {
    assert(Polygonize.polygonize(wkt("POINT (1 1)")).numGeometries == 0)
    assert(Polygonize.polygonize(wkt("MULTILINESTRING EMPTY")).numGeometries == 0)
  }

  test("buildArea fuzz: boundary linework of a random union rebuilds the union") {
    // consistency across three independent engines: overlay union builds
    // an areal truth; its boundary rings feed polygonize+buildArea, which
    // must reproduce the SAME area (holes included) for any nesting the
    // random squares produce
    val rnd = new scala.util.Random(47)
    for (round <- 0 until 30) {
      val squares = (0 until (3 + rnd.nextInt(5))).map { _ =>
        val x = rnd.nextInt(40).toDouble
        val y = rnd.nextInt(40).toDouble
        val s = (2 + rnd.nextInt(8)).toDouble
        Polygon(Array(Array(x, y, x + s, y, x + s, y + s, x, y + s, x, y)))
      }
      val u = Overlay.unionAll(squares)
      // boundary rings as linework (closed LineStrings)
      val rings = scala.collection.mutable.ArrayBuffer.empty[LineString]
      def walk(g: Geometry): Unit = g match {
        case p: Polygon => p.rings.foreach(r => rings += LineString(r))
        case m: MultiPolygon => m.polys.foreach(walk)
        case c: GeometryCollection => c.geoms.foreach(walk)
        case _ => ()
      }
      walk(u)
      val rebuilt = Polygonize.buildArea(MultiLineString(rings.toArray))
      val a1 = Measures.area(u)
      val a2 = Measures.area(rebuilt)
      assert(math.abs(a1 - a2) < 1e-6 * math.max(1.0, a1),
        s"round $round: union area $a1 vs rebuilt $a2")
    }
  }

  test("buildArea: nested rings alternate fill/hole, shared edges dissolve") {
    // two nested squares: the inner face is odd-depth -> a hole; result is
    // the annulus (GEOS ST_BuildArea semantics)
    val annulus = Polygonize.buildArea(wkt(
      "MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))"))
    assert(math.abs(Measures.area(annulus) - (100.0 - 36.0)) < 1e-9)
    // triple nesting: outer annulus + the innermost square are kept
    val triple = Polygonize.buildArea(wkt(
      "MULTILINESTRING ((0 0, 12 0, 12 12, 0 12, 0 0), " +
        "(2 2, 10 2, 10 10, 2 10, 2 2), (4 4, 8 4, 8 8, 4 8, 4 4))"))
    assert(math.abs(Measures.area(triple) - ((144.0 - 64.0) + 16.0)) < 1e-9)
    // two squares sharing an edge: ONE polygon, the shared edge dissolved
    val merged = Polygonize.buildArea(wkt(
      "MULTILINESTRING ((0 0, 2 0), (2 0, 2 2), (2 2, 0 2), (0 2, 0 0), " +
        "(2 0, 5 0), (5 0, 5 2), (5 2, 2 2))"))
    assert(math.abs(Measures.area(merged) - 10.0) < 1e-9)
    assert(merged.isInstanceOf[Polygon], s"expected dissolved polygon, got $merged")
    // dangling linework only: empty, like GEOS
    assert(Polygonize.buildArea(wkt("LINESTRING (0 0, 5 5)")).numGeometries == 0)
  }
}
