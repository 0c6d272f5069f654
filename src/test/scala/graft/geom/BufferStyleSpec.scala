package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Cap/join styles on the positive buffer (geopandas/shapely
  * buffer(cap_style=, join_style=, mitre_limit=)) — closed-form area
  * fixtures: flat and square caps and bevel/mitre joins are all
  * polygonal, so expected areas are exact (no arc approximation).
  */
class BufferStyleSpec extends AnyFunSuite {
  private def area(g: Geometry): Double = Measures.area(g)
  private val seg = LineString(Array(0, 0, 10, 0))
  private val elbow = LineString(Array(0, 0, 10, 0, 10, 10))

  test("flat cap: pure rectangle; flat-capped point is empty") {
    val b = Constructive.bufferStyled(seg, 2.0, capStyle = "flat")
    assert(math.abs(area(b) - 40.0) < 1e-9, s"flat cap area ${area(b)}")
    assert(Constructive.bufferStyled(Point(3, 4), 2.0, capStyle = "flat").isEmpty)
  }

  test("square cap: rectangle plus two half-squares; square-capped point is the box") {
    val b = Constructive.bufferStyled(seg, 2.0, capStyle = "square")
    assert(math.abs(area(b) - 56.0) < 1e-9, s"square cap area ${area(b)}")
    val p = Constructive.bufferStyled(Point(3, 4), 2.0, capStyle = "square")
    assert(math.abs(area(p) - 16.0) < 1e-9)
    assert(Predicates.geomEquals(p, Polygon.box(1, 2, 5, 6)))
  }

  test("bevel join: right-angle elbow gets the corner chord triangle") {
    val b = Constructive.bufferStyled(elbow, 1.0,
      capStyle = "flat", joinStyle = "bevel")
    // rects 20 + 20 − 1 overlap + 0.5 bevel triangle
    assert(math.abs(area(b) - 39.5) < 1e-9, s"bevel area ${area(b)}")
  }

  test("mitre join: right-angle elbow fills the full corner square; limit falls back") {
    val b = Constructive.bufferStyled(elbow, 1.0,
      capStyle = "flat", joinStyle = "mitre")
    assert(math.abs(area(b) - 40.0) < 1e-9, s"mitre area ${area(b)}")
    // mitre point at sqrt(2)·r from the vertex: a limit below that must
    // fall back to the bevel result
    val limited = Constructive.bufferStyled(elbow, 1.0,
      capStyle = "flat", joinStyle = "mitre", mitreLimit = 1.0)
    assert(math.abs(area(limited) - 39.5) < 1e-9, s"limited area ${area(limited)}")
    // a 30-degree spike: mitre length r/sin(theta/2) = r/sin(15°) ≈ 3.86r
    // passes limit 5 but not limit 2
    val spike = LineString(Array(0, 0, 10, 0,
      10 - 10 * math.cos(math.toRadians(30)), 10 * math.sin(math.toRadians(30))))
    val sharp = Constructive.bufferStyled(spike, 1.0, capStyle = "flat", joinStyle = "mitre")
    val capped = Constructive.bufferStyled(spike, 1.0,
      capStyle = "flat", joinStyle = "mitre", mitreLimit = 2.0)
    assert(area(sharp) > area(capped) + 0.5,
      s"spike mitre ${area(sharp)} vs capped ${area(capped)}")
  }

  test("round/round delegates to the classic buffer; polygon joins work on rings") {
    val g = elbow
    assert(area(Constructive.bufferStyled(g, 1.5)) ==
      area(Constructive.buffer(g, 1.5)))
    // concave L polygon, mitred outward: every probe point within r·(1-ε)
    // must be covered (same contract as the buffer fuzz)
    val l = Polygon(Array(Array[Double](0, 0, 10, 0, 10, 4, 4, 4, 4, 10, 0, 10, 0, 0)))
    val mb = Constructive.bufferStyled(l, 1.0, joinStyle = "mitre", capStyle = "flat")
    assert(Predicates.covers(mb, l), "styled polygon buffer must cover the source")
    // mitred right angles: area = poly + perimeter·r + k·r² corner excess;
    // bound-check against the round buffer (mitre ⊇ round)
    val rb = Constructive.buffer(l, 1.0)
    assert(area(mb) >= area(rb) - 1e-9, s"mitre ${area(mb)} < round ${area(rb)}")
  }
}
