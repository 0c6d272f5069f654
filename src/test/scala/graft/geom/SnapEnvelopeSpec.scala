package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** The documented noise envelope of the overlay kernel: coordinate jitter
  * up to ~SNAP_REL/4 of the coordinate magnitude must produce clean
  * topological results (shared-edge squares merge into one part, exact
  * area), with zero ring drops. Beyond the tolerance results may degrade —
  * but only loudly (droppedRingCount), never silently; that mode is
  * covered by the drop counter itself, not asserted here.
  */
class SnapEnvelopeSpec extends AnyFunSuite {

  private def jitter(g: Geometry, scale: Double, salt: Long): Geometry = {
    var k = salt
    def j(v: Double): Double = {
      k = graft.sql.TextKernel.mix64(k + 0x9e3779b97f4a7c15L)
      v + ((k >> 11).toDouble / (1L << 52).toDouble) * scale
    }
    def ring(r: Array[Double]): Array[Double] = {
      val out = new Array[Double](r.length)
      var i = 0
      while (i + 1 < r.length - 2) { out(i) = j(r(i)); out(i + 1) = j(r(i + 1)); i += 2 }
      out(r.length - 2) = out(0); out(r.length - 1) = out(1)
      out
    }
    g match { case p: Polygon => Polygon(p.rings.map(ring)); case o => o }
  }

  test("shared-edge union is clean for jitter up to 1e-9 at unit-ish scale") {
    // coordinate magnitude ~4 -> tol = 4e-9; jitters up to 1e-9 stay inside
    for (scale <- Seq(1e-13, 1e-12, 1e-11, 1e-10, 1e-9)) {
      val before = PolygonClip.droppedRingCount
      for (salt <- 1L to 100L) {
        val a = jitter(Polygon.box(0, 0, 2, 2), scale, salt)
        val b = jitter(Polygon.box(2, 0, 4, 2), scale, salt + 1000)
        val un = Overlay.union(a, b)
        assert(math.abs(Measures.area(un) - 8.0) < 1e-6,
          s"area at jitter=$scale salt=$salt: ${Measures.area(un)}")
        assert(Geometry.parts(un).count(!_.isEmpty) == 1,
          s"parts at jitter=$scale salt=$salt")
      }
      assert(PolygonClip.droppedRingCount == before, s"ring drops at jitter=$scale")
    }
  }

  test("overlapping intersection/difference are clean across the envelope") {
    for (scale <- Seq(1e-12, 1e-10, 1e-9)) {
      val before = PolygonClip.droppedRingCount
      for (salt <- 1L to 100L) {
        val a = jitter(Polygon.box(0, 0, 2, 2), scale, salt)
        val b = jitter(Polygon.box(1, 1, 3, 3), scale, salt + 1000)
        assert(math.abs(Measures.area(Overlay.intersection(a, b)) - 1.0) < 1e-6,
          s"intersection at jitter=$scale salt=$salt")
        assert(math.abs(Measures.area(Overlay.difference(a, b)) - 3.0) < 1e-6,
          s"difference at jitter=$scale salt=$salt")
        assert(math.abs(Measures.area(Overlay.symDifference(a, b)) - 6.0) < 1e-6,
          s"symdiff at jitter=$scale salt=$salt")
      }
      assert(PolygonClip.droppedRingCount == before, s"ring drops at jitter=$scale")
    }
  }
}
