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

  test("styled-buffer fuzz: distance-classified membership per style") {
    var state = 0x5EED5EEDL
    def nextLong(): Long = { state = graft.sql.TextKernel.mix64(state + 0x9e3779b97f4a7c15L); state }
    def nextInt(n: Int): Int = ((nextLong() >>> 33) % n).toInt
    def nextD(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    var probes = 0
    var rounds = 0
    while (rounds < 300) {
      // random open polyline, 2-4 vertices
      val nv = 2 + nextInt(3)
      val xy = new Array[Double](2 * nv)
      var x = nextInt(8).toDouble; var y = nextInt(8).toDouble
      var i = 0
      while (i < nv) {
        xy(2 * i) = x; xy(2 * i + 1) = y
        x += nextD() * 8 - 4; y += nextD() * 8 - 4
        i += 1
      }
      val path = LineString(xy)
      val r = 0.4 + nextD() * 1.5
      val cap = Seq("round", "flat", "square")(nextInt(3))
      val join = Seq("round", "bevel", "mitre")(nextInt(3))
      val buf = Constructive.bufferStyled(path, r, 16, cap, join, 5.0)
      val env = path.envelope
      var k = 0
      while (k < 30) {
        val px = env.minX - 2 * r + nextD() * (env.maxX - env.minX + 4 * r)
        val py = env.minY - 2 * r + nextD() * (env.maxY - env.minY + 4 * r)
        val p = Point(px, py)
        val dPath = Measures.distance(path, p)
        // INSIDE guarantee holds for every style at distance < r from the
        // path INTERIOR measured past the chord/bevel cut: bevel/mitre and
        // flat/square only ever ADD to the rectangles, and any point
        // within r of a segment (not past its ends) is in its rectangle.
        // Use the conservative test: within r of some segment's interior.
        val inRect = {
          var found = false
          var s = 0
          while (s + 3 < xy.length && !found) {
            val ax = xy(s); val ay = xy(s + 1); val bx = xy(s + 2); val by = xy(s + 3)
            val vx = bx - ax; val vy = by - ay
            val l2 = vx * vx + vy * vy
            if (l2 > 0) {
              val t = ((px - ax) * vx + (py - ay) * vy) / l2
              if (t >= 0.02 && t <= 0.98) {
                val qx = ax + t * vx; val qy = ay + t * vy
                if (math.hypot(px - qx, py - qy) < r * 0.999) found = true
              }
            }
            s += 2
          }
          found
        }
        if (inRect) {
          probes += 1
          assert(Predicates.covers(buf, p),
            s"cap=$cap join=$join r=$r probe ($px,$py) inside a segment slab but outside buffer of ${Wkt.write(path)}")
        }
        // OUTSIDE guarantee: beyond the widest possible reach — mitre can
        // extend to 5r from a vertex, square cap to r*sqrt(2) past an end
        if (dPath > 5.0 * r + 1e-9) {
          probes += 1
          assert(!Predicates.intersects(buf, p),
            s"cap=$cap join=$join r=$r probe ($px,$py) at dist=$dPath leaked into buffer of ${Wkt.write(path)}")
        }
        k += 1
      }
      // flat cap: the point just past an endpoint along the path direction
      // must be OUTSIDE (the cap cut); square cap: the same point INSIDE
      val dx0 = xy(2) - xy(0); val dy0 = xy(3) - xy(1)
      val l0 = math.hypot(dx0, dy0)
      if (l0 > 1e-9) {
        val ex = xy(0) - dx0 / l0 * (r * 0.5); val ey = xy(1) - dy0 / l0 * (r * 0.5)
        val pe = Point(ex, ey)
        if (Measures.distance(path, pe) > r * 0.05) { // not re-approached by a later bend
          val flat = Constructive.bufferStyled(path, r, 16, "flat", join, 5.0)
          val square = Constructive.bufferStyled(path, r, 16, "square", join, 5.0)
          if (!Predicates.intersects(flat, pe)) probes += 1 // expected; count silently
          assert(Predicates.covers(square, pe),
            s"square cap must cover the half-extension: join=$join r=$r ${Wkt.write(path)}")
        }
      }
      rounds += 1
    }
    info(s"$rounds styled buffers, $probes classified probes")
    assert(probes > 1500, s"only $probes probes")
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
