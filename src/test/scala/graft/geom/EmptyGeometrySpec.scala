package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Empty-geometry semantics sweep — the edge-case family the reference
  * inherits silently from GEOS (SURVEY §7.4 #5). Contract checked against
  * shapely/GEOS conventions:
  *   - WKT "X EMPTY" parses, reports isEmpty, and survives WKB roundtrip;
  *   - measures are 0 (area, length), predicates with an empty operand
  *     are false (disjoint true);
  *   - constructive ops return empty, never throw (buffer, convex hull,
  *     centroid, simplify, envelope);
  *   - overlay: union(∅, g) = g, intersection/difference(∅, g) = ∅,
  *     difference(g, ∅) = g.
  */
class EmptyGeometrySpec extends AnyFunSuite {

  private val emptyWkts = Seq("POINT EMPTY", "LINESTRING EMPTY",
    "POLYGON EMPTY", "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY",
    "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY")
  private val sq = Polygon.box(0, 0, 2, 2)

  test("parse, wkb/wkt roundtrip, isEmpty for every EMPTY form") {
    emptyWkts.foreach { w =>
      val g = Wkt.read(w)
      assert(g.isEmpty, s"$w parsed non-empty")
      val viaWkb = Wkb.read(Wkb.write(g))
      assert(viaWkb.isEmpty, s"$w wkb roundtrip lost emptiness")
      val viaWkt = Wkt.read(Wkt.write(g))
      assert(viaWkt.isEmpty, s"$w wkt roundtrip lost emptiness")
    }
  }

  test("measures and predicates treat empty as nothing") {
    emptyWkts.foreach { w =>
      val g = Wkt.read(w)
      assert(Measures.area(g) == 0.0, s"area($w)")
      assert(Measures.length(g) == 0.0, s"length($w)")
      assert(!Predicates.intersects(g, sq), s"intersects($w, square)")
      assert(!Predicates.intersects(sq, g), s"intersects(square, $w)")
      assert(Predicates.disjoint(g, sq), s"disjoint($w, square)")
      assert(!Predicates.contains(sq, g), s"contains(square, $w)")
      assert(!Predicates.within(g, sq), s"within($w, square)")
      assert(!Predicates.touches(g, sq), s"touches($w, square)")
      assert(!Predicates.overlaps(g, sq), s"overlaps($w, square)")
    }
  }

  test("constructive ops return empty and never throw") {
    emptyWkts.foreach { w =>
      val g = Wkt.read(w)
      assert(Constructive.buffer(g, 1.0).isEmpty, s"buffer($w, 1)")
      assert(Constructive.convexHull(g).isEmpty, s"convexHull($w)")
      assert(Constructive.centroid(g).isEmpty, s"centroid($w)")
      assert(Constructive.simplify(g, 0.5).isEmpty, s"simplify($w)")
      assert(g.envelope.isEmpty, s"envelope($w) should be the empty envelope")
    }
  }

  test("overlay identities with an empty operand") {
    emptyWkts.foreach { w =>
      val g = Wkt.read(w)
      val u = Overlay.union(g, sq)
      assert(math.abs(Measures.area(u) - 4.0) < 1e-9, s"union($w, square) area")
      assert(Overlay.intersection(g, sq).isEmpty, s"intersection($w, square)")
      assert(Overlay.difference(g, sq).isEmpty, s"difference($w, square)")
      val d = Overlay.difference(sq, g)
      assert(math.abs(Measures.area(d) - 4.0) < 1e-9, s"difference(square, $w) area")
    }
  }
}
