package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Snap-rounding robustness: real-world coordinates carry ~1e-12..1e-15
  * relative noise (reprojection, averaging, serialization roundtrips).
  * Before round 5 the overlay kernel required bit-exact collinearity and
  * endpoint coincidence, so a jittered shared boundary or near-T-junction
  * could silently drop whole rings. These specs re-run the g31/g32 oracle
  * fixtures (and the classic shared-edge / T-junction configurations) with
  * every coordinate perturbed by ~1e-12 and assert the results stay within
  * fp noise of the exact closed forms — and that no ring was dropped.
  */
class PolygonClipRobustnessSpec extends AnyFunSuite {

  private def area(g: Geometry): Double = Measures.area(g)
  private def nParts(g: Geometry): Int = Geometry.parts(g).count(p => !p.isEmpty)
  private def nHoles(g: Geometry): Int =
    Geometry.parts(g).collect { case p: Polygon => p.numHoles }.sum

  /** Deterministic per-coordinate jitter in [-scale, scale]. */
  private def jitter(g: Geometry, scale: Double, salt: Long): Geometry = {
    var k = salt
    def j(v: Double): Double = {
      k = graft.sql.TextKernel.mix64(k + 0x9e3779b97f4a7c15L)
      v + ((k >> 11).toDouble / (1L << 52).toDouble) * scale
    }
    def ring(r: Array[Double]): Array[Double] = {
      val out = new Array[Double](r.length)
      var i = 0
      // keep the ring closed: last vertex must equal first bit-exactly
      while (i + 1 < r.length - 2) { out(i) = j(r(i)); out(i + 1) = j(r(i + 1)); i += 2 }
      out(r.length - 2) = out(0); out(r.length - 1) = out(1)
      out
    }
    g match {
      case p: Polygon      => Polygon(p.rings.map(ring))
      case m: MultiPolygon => MultiPolygon(m.polys.map(p => Polygon(p.rings.map(ring))))
      case other           => other
    }
  }

  private val J = 1e-12
  private val tolArea = 1e-6

  private def close(x: Double, y: Double, label: String): Unit =
    assert(math.abs(x - y) < tolArea * math.max(1.0, math.abs(y)), s"$label: $x != $y")

  private def withNoDrops[T](body: => T): T = {
    val before = PolygonClip.droppedRingCount
    val r = body
    assert(PolygonClip.droppedRingCount == before,
      s"overlay dropped ${PolygonClip.droppedRingCount - before} ring(s)")
    r
  }

  test("g31 fixture jittered: L-shape vs overlapping square, all four ops") {
    // w=2 instance of the g31 family: L = [0,2w]^2 minus top-right quarter,
    // B = [w/2, 3w/2]^2. Closed forms: i=3w^2/4, u=13w^2/4, d=9w^2/4,
    // sd=5w^2/2.
    val w = 2.0
    for (salt <- 1L to 20L) {
      val outer = Polygon.box(0, 0, 2 * w, 2 * w)
      val quarter = Polygon.box(w, w, 2 * w, 2 * w)
      val l = Overlay.difference(jitter(outer, J, salt), jitter(quarter, J, salt + 100))
      val b = jitter(Polygon.box(w / 2, w / 2, 3 * w / 2, 3 * w / 2), J, salt + 200)
      withNoDrops {
        val un = Overlay.union(l, b)
        close(area(un), 13 * w * w / 4, s"u_area salt=$salt")
        assert(nParts(un) == 1, s"u_parts salt=$salt: ${Wkt.write(un)}")
        assert(nHoles(un) == 0, s"u_holes salt=$salt")
        close(area(Overlay.intersection(l, b)), 3 * w * w / 4, s"i_area salt=$salt")
        close(area(Overlay.difference(l, b)), 9 * w * w / 4, s"d_area salt=$salt")
        close(area(Overlay.symDifference(l, b)), 5 * w * w / 2, s"sd_area salt=$salt")
      }
    }
  }

  test("g32 fixture jittered: donut vs square overlapping the hole corner") {
    // w=1 instance of g32: donut = [0,3w]^2 with hole [w,2w]^2,
    // B = [w/2,3w/2]^2. diff 29w^2/4 (1 hole), union 33w^2/4 (1 hole),
    // intersection 3w^2/4.
    val w = 1.0
    for (salt <- 1L to 20L) {
      val donut = Overlay.difference(
        jitter(Polygon.box(0, 0, 3 * w, 3 * w), J, salt),
        jitter(Polygon.box(w, w, 2 * w, 2 * w), J, salt + 100))
      val b = jitter(Polygon.box(w / 2, w / 2, 3 * w / 2, 3 * w / 2), J, salt + 200)
      withNoDrops {
        val dg = Overlay.difference(donut, b)
        close(area(dg), 29 * w * w / 4, s"d_area salt=$salt")
        assert(nParts(dg) == 1, s"d_parts salt=$salt")
        assert(nHoles(dg) == 1, s"d_holes salt=$salt: ${Wkt.write(dg)}")
        val ug = Overlay.union(donut, b)
        close(area(ug), 33 * w * w / 4, s"u_area salt=$salt")
        assert(nHoles(ug) == 1, s"u_holes salt=$salt")
        close(area(Overlay.intersection(donut, b)), 3 * w * w / 4, s"i_area salt=$salt")
      }
    }
  }

  test("jittered shared edge still merges without slivers") {
    for (salt <- 1L to 50L) {
      val a = jitter(Polygon.box(0, 0, 2, 2), J, salt)
      val b = jitter(Polygon.box(2, 0, 4, 2), J, salt + 1000)
      withNoDrops {
        val un = Overlay.union(a, b)
        close(area(un), 8.0, s"shared-edge union salt=$salt")
        assert(nParts(un) == 1, s"parts salt=$salt: ${Wkt.write(un)}")
      }
    }
  }

  test("near-T-junction (vertex on edge interior) does not drop rings") {
    // B's top-left vertex lies on A's right edge interior; jitter moves it
    // epsilon off the edge — historically the walkRing killer.
    for (salt <- 1L to 50L) {
      val a = jitter(Polygon.box(0, 0, 4, 4), J, salt)
      val b = jitter(Polygon.box(4, 1, 6, 3), J, salt + 1000)
      withNoDrops {
        val un = Overlay.union(a, b)
        close(area(un), 20.0, s"t-junction union salt=$salt")
        assert(nParts(un) == 1, s"parts salt=$salt")
        close(area(Overlay.intersection(a, b)), 0.0, s"edge-only intersection salt=$salt")
      }
    }
  }

  test("jittered identical operands behave as identity") {
    for (salt <- 1L to 20L) {
      val a = Polygon.box(0, 0, 3, 3)
      val b = jitter(a, J, salt)
      withNoDrops {
        close(area(Overlay.union(a, b)), 9.0, s"self-union salt=$salt")
        close(area(Overlay.intersection(a, b)), 9.0, s"self-intersection salt=$salt")
        close(area(Overlay.difference(a, b)), 0.0, s"self-difference salt=$salt")
      }
    }
  }

  test("exact-grid results are unchanged by the snapping machinery") {
    // the g31/g32 exact fixtures must keep their closed forms bit-tight
    val l = Overlay.difference(Polygon.box(0, 0, 4, 4), Polygon.box(2, 2, 4, 4))
    val b = Polygon.box(1, 1, 3, 3)
    assert(math.abs(area(Overlay.union(l, b)) - 13.0) < 1e-12)
    assert(math.abs(area(Overlay.intersection(l, b)) - 3.0) < 1e-12)
    assert(math.abs(area(Overlay.difference(l, b)) - 9.0) < 1e-12)
  }
}
