package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial randomized sweep over the topological overlay kernel —
  * the classic wrong-answer domain (VERDICT r9 #4). DuckDB's spatial
  * extension is not installable in this sandbox (zero egress), so the
  * differential oracle is built from two INDEPENDENT sources instead:
  *
  *   1. Measure algebra (inclusion-exclusion): for every pair,
  *      area(A∩B) + area(A\B) = area(A), area(A∩B) + area(B\A) = area(B),
  *      area(A∪B) = area(A) + area(B) − area(A∩B),
  *      area(AΔB) = area(A\B) + area(B\A), and intersection symmetry.
  *      Tolerance contract: |residual| ≤ 2e-9 · max(1, area) — overlay
  *      coordinates are exact rationals of the inputs in the clipper, so
  *      only fp summation noise accumulates.
  *   2. Point-classification differential: a 7×7 lattice over the joint
  *      envelope, each point classified by the PREDICATE kernel
  *      (Predicates.contains/covers — an independent code path, itself
  *      oracle-verified by the g16 matrix) and checked for membership in
  *      each overlay result. Points on either input boundary are skipped
  *      (the result boundary is a subset of the input boundaries, so
  *      interior classification is unambiguous).
  *
  * The generator is seeded and lattice-biased so collinear edges, shared
  * vertices, shared whole edges, slivers, and 1e-12-jittered boundaries
  * occur constantly — plus explicit adversarial families (B = jittered A,
  * B = A translated by a lattice step, sliver rectangles, bowtie-adjacent
  * concave stars). No ring may be silently dropped
  * (PolygonClip.droppedRingCount).
  */
class OverlayFuzzSpec extends AnyFunSuite {

  private var state = 0xABCDEF123L
  private def nextLong(): Long = {
    state = graft.sql.TextKernel.mix64(state + 0x9e3779b97f4a7c15L)
    state
  }
  private def nextInt(n: Int): Int = ((nextLong() >>> 33) % n).toInt
  private def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble

  /** Random simple polygon, lattice-biased. kind: 0 rect, 1 triangle,
    * 2 convex radial, 3 concave star, 4 sliver rectangle, 5 L-shape.
    */
  private def genPoly(kind: Int, cx: Double, cy: Double): Polygon = {
    def lat(v: Double): Double = math.rint(v * 2.0) / 2.0 // half-integer lattice
    kind match {
      case 0 =>
        val w = 1.0 + nextInt(8); val h = 1.0 + nextInt(8)
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + h, cx, cy + h, cx, cy)))
      case 1 =>
        val w = 1.0 + nextInt(8); val h = 1.0 + nextInt(8)
        val ax = lat(cx + nextDouble() * w)
        Polygon(Array(Array(cx, cy, cx + w, cy, ax, cy + h, cx, cy)))
      case 2 =>
        val n = 5 + nextInt(5)
        val r = 2.0 + nextInt(4)
        val pts = (0 until n).map { i =>
          val th = 2.0 * math.Pi * i / n
          (lat(cx + r * math.cos(th)), lat(cy + r * math.sin(th)))
        }
        // lattice rounding can collapse neighbours; keep distinct ones
        val d = pts.zipWithIndex.filter { case (p, i) => p != pts((i + 1) % n) }.map(_._1)
        if (d.size < 3) genPoly(0, cx, cy)
        else Polygon(Array(d.flatMap(p => Seq(p._1, p._2)).toArray ++ Array(d.head._1, d.head._2)))
      case 3 =>
        val n = 4 + nextInt(4)
        val pts = (0 until 2 * n).map { i =>
          val th = math.Pi * i / n
          val r = if (i % 2 == 0) 3.0 + nextInt(3) else 1.0 + nextInt(2)
          (lat(cx + r * math.cos(th)), lat(cy + r * math.sin(th)))
        }
        val d = pts.zipWithIndex.filter { case (p, i) => p != pts((i + 1) % (2 * n)) }.map(_._1)
        if (d.size < 3) genPoly(0, cx, cy)
        else Polygon(Array(d.flatMap(p => Seq(p._1, p._2)).toArray ++ Array(d.head._1, d.head._2)))
      case 4 =>
        val w = 1.0 + nextInt(6)
        val eps = math.pow(10.0, -(3 + nextInt(5))) // 1e-3 .. 1e-7 sliver
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + eps, cx, cy + eps, cx, cy)))
      case _ =>
        val w = 2.0 + nextInt(6)
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + w / 2, cx + w / 2, cy + w / 2,
          cx + w / 2, cy + w, cx, cy + w, cx, cy)))
    }
  }

  private def jitter(p: Polygon, scale: Double): Polygon =
    Polygon(p.rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0
      while (i + 1 < r.length - 2) {
        out(i) = r(i) + (nextDouble() - 0.5) * scale
        out(i + 1) = r(i + 1) + (nextDouble() - 0.5) * scale
        i += 2
      }
      out(r.length - 2) = out(0); out(r.length - 1) = out(1)
      out
    })

  private def translate(p: Polygon, dx: Double, dy: Double): Polygon =
    Polygon(p.rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0
      while (i < r.length) { out(i) = r(i) + dx; out(i + 1) = r(i + 1) + dy; i += 2 }
      out
    })

  test("seeded adversarial sweep: 1200 pairs, area algebra + predicate differential") {
    val before = PolygonClip.droppedRingCount
    var maxResidual = 0.0
    var worst = ""
    var pointChecks = 0
    val pairs = 1200
    var i = 0
    while (i < pairs) {
      val a = genPoly(nextInt(6), nextInt(5).toDouble, nextInt(5).toDouble)
      // adversarial pairing mix: 0 independent, 1 lattice-translated copy
      // (shared edges/vertices), 2 jittered copy (near-identical boundary),
      // 3 independent at the same anchor (shared vertices likely),
      // 4 zero-offset copy sharing the full boundary
      val b = nextInt(5) match {
        case 0 => genPoly(nextInt(6), nextInt(5).toDouble, nextInt(5).toDouble)
        case 1 => translate(a, nextInt(4) * 0.5, nextInt(4) * 0.5)
        case 2 => jitter(a, 1e-12)
        case 3 => genPoly(nextInt(6), a.rings(0)(0), a.rings(0)(1))
        case _ => a.copy()
      }
      val aA = Measures.area(a); val aB = Measures.area(b)
      val inter = Overlay.intersection(a, b)
      val interBA = Overlay.intersection(b, a)
      val uni = Overlay.union(a, b)
      val dab = Overlay.difference(a, b)
      val dba = Overlay.difference(b, a)
      val sd = Overlay.symDifference(a, b)
      val aI = Measures.area(inter); val aU = Measures.area(uni)
      val aDab = Measures.area(dab); val aDba = Measures.area(dba)
      val aSd = Measures.area(sd)
      val scale = math.max(1.0, math.max(aA, aB))
      def chk(x: Double, y: Double, label: String): Unit = {
        val r = math.abs(x - y) / scale
        if (r > maxResidual) { maxResidual = r; worst = s"$label pair#$i a=${Wkt.write(a)} b=${Wkt.write(b)}" }
        // 2e-9 (not 1e-9): a 1e-7-thin sliver sharing a collinear edge
        // with a large triangle accumulates snap-rounding noise at the
        // sliver scale — observed worst case 1.05e-9 relative across seeds
        assert(r <= 2e-9, s"$label residual $r at pair $i:\n  A=${Wkt.write(a)}\n  B=${Wkt.write(b)}")
      }
      chk(aI + aDab, aA, "A = (A∩B)+(A\\B)")
      chk(aI + aDba, aB, "B = (A∩B)+(B\\A)")
      chk(aU, aA + aB - aI, "U = A+B-I")
      chk(aSd, aDab + aDba, "Δ = (A\\B)+(B\\A)")
      chk(Measures.area(interBA), aI, "∩ symmetry")
      // predicate-kernel differential on interior points
      val env = a.envelope.union(b.envelope)
      var gx = 0
      while (gx < 7) {
        var gy = 0
        while (gy < 7) {
          val px = env.minX + (gx + 0.41) / 7.0 * (env.maxX - env.minX)
          val py = env.minY + (gy + 0.59) / 7.0 * (env.maxY - env.minY)
          val p = Point(px, py)
          val inA = Predicates.contains(a, p); val onA = !inA && Predicates.covers(a, p)
          val inB = Predicates.contains(b, p); val onB = !inB && Predicates.covers(b, p)
          // skip points NEAR either boundary too (not just exactly on it):
          // when B is a 1e-12-jittered copy of A, a sample point 1e-13
          // from A's edge is legitimately ambiguous — the result boundary
          // wobbles at the same scale as the classification margin
          val nearEdge =
            Measures.distance(Constructive.boundary(a), p) < 1e-9 ||
            Measures.distance(Constructive.boundary(b), p) < 1e-9
          if (!onA && !onB && !nearEdge) {
            pointChecks += 1
            def member(g: Geometry): Boolean = Predicates.covers(g, p)
            assert(member(inter) == (inA && inB),
              s"∩ membership at ($px,$py) pair $i: A=${Wkt.write(a)} B=${Wkt.write(b)}")
            assert(member(uni) == (inA || inB),
              s"∪ membership at ($px,$py) pair $i: A=${Wkt.write(a)} B=${Wkt.write(b)}")
            assert(member(dab) == (inA && !inB),
              s"\\ membership at ($px,$py) pair $i: A=${Wkt.write(a)} B=${Wkt.write(b)}")
            assert(member(sd) == (inA != inB),
              s"Δ membership at ($px,$py) pair $i: A=${Wkt.write(a)} B=${Wkt.write(b)}")
          }
          gy += 1
        }
        gx += 1
      }
      i += 1
    }
    assert(PolygonClip.droppedRingCount == before,
      s"sweep dropped ${PolygonClip.droppedRingCount - before} ring(s)")
    assert(pointChecks > 20000, s"only $pointChecks point checks ran — boundary skip too aggressive")
    info(s"$pairs pairs, $pointChecks interior point checks, max area residual $maxResidual ($worst)")
  }
}
