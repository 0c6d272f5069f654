package graft.tools

import graft.geom._

/** Microbenchmark: how much of the st_intersects hot path is WKB decode?
  *
  * Every graft predicate expression decodes both operands from WKB per row
  * (`GraftDefs.geom(...)` → `Wkb.read`). If decode dominates, an
  * envelope-cached WKB layout (envelope prefixed in the binary) or an
  * operand-level decode cache would be the next perf lever; if the geometry
  * math dominates, columnar/decoded layouts buy little. Run:
  * `sbt "runMain graft.tools.WkbProfile"`. Results → PROFILE.md.
  */
object WkbProfile {

  private def bench(name: String, iters: Int)(f: Int => Long): Double = {
    // two warmups, then best-of-3 timed runs
    f(iters); f(iters)
    var best = Double.MaxValue
    var sink = 0L
    for (_ <- 0 until 3) {
      val t0 = System.nanoTime()
      sink ^= f(iters)
      val s = (System.nanoTime() - t0) / 1e9
      if (s < best) best = s
    }
    println(f"$name%-34s ${best}%.3f s  (${iters / best / 1e6}%.1f M ops/s, sink=${sink % 2})")
    best
  }

  def main(args: Array[String]): Unit = {
    val nGeoms = 4096
    val iters = 2 * 1000 * 1000
    val rnd = new scala.util.Random(7)

    // supplier-square-like polygons (5-point shells) and nearby small boxes:
    // roughly half the pairs are envelope-disjoint, like a selective sjoin
    val polysA = Array.tabulate(nGeoms) { _ =>
      val x = rnd.nextDouble() * 1000; val y = rnd.nextDouble() * 1000
      val h = 1.0 + rnd.nextDouble() * 9.0
      Polygon.box(x - h, y - h, x + h, y + h): Geometry
    }
    val polysB = Array.tabulate(nGeoms) { i =>
      val e = polysA(i).envelope
      val dx = (rnd.nextDouble() - 0.25) * 4 * e.width // ~half overlap
      Polygon.box(e.minX + dx, e.minY, e.maxX + dx, e.maxY): Geometry
    }
    val wkbA = polysA.map(Wkb.write)
    val wkbB = polysB.map(Wkb.write)
    val envA = polysA.map(_.envelope)
    val envB = polysB.map(_.envelope)
    val mask = nGeoms - 1

    println(s"pairs/iter=1, distinct geoms=$nGeoms, iters=$iters")
    val hits = (0 until nGeoms).count(i => envA(i).intersects(envB(i)))
    println(f"envelope hit rate: ${hits * 100.0 / nGeoms}%.1f%%")

    // (1) the expression hot path today: decode both sides + predicate
    val tFull = bench("decode+intersects (today)", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        if (Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB(k)))) acc += 1
        i += 1
      }
      acc
    }

    // (2) decode alone (both operands)
    val tDecode = bench("decode only (2x Wkb.read)", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        acc += Wkb.read(wkbA(k)).envelope.minX.toLong + Wkb.read(wkbB(k)).envelope.minX.toLong
        i += 1
      }
      acc
    }

    // (3) predicate on pre-decoded operands (upper bound for any decoded
    // columnar layout)
    val tMath = bench("intersects only (pre-decoded)", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        if (Predicates.intersects(polysA(k), polysB(k))) acc += 1
        i += 1
      }
      acc
    }

    // (4) envelope-prefix simulation: envelope test from a cached envelope,
    // full decode+predicate only on envelope overlap
    val tEnvCached = bench("envelope-cached decode", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        if (envA(k).intersects(envB(k)) &&
          Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB(k)))) acc += 1
        i += 1
      }
      acc
    }

    // (5) what shipped: envelope scanned straight off the bytes (no
    // Geometry/array allocation), full decode only on envelope overlap —
    // the st_intersectsbox / grid-cell path after the r6 change
    val tEnvScan = bench("envelopeOf reject + decode", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        if (Wkb.envelopeOf(wkbA(k)).intersects(Wkb.envelopeOf(wkbB(k))) &&
          Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB(k)))) acc += 1
        i += 1
      }
      acc
    }

    // (6) envelope-only consumers (grid cells, bounds agg): scan vs decode
    val tEnvOnly = bench("envelopeOf only", iters) { n =>
      var acc = 0L; var i = 0
      while (i < n) {
        val k = i & mask
        acc += Wkb.envelopeOf(wkbA(k)).minX.toLong + Wkb.envelopeOf(wkbB(k)).minX.toLong
        i += 1
      }
      acc
    }

    println(f"decode share of hot path: ${(tFull - tMath) * 100 / tFull}%.0f%%")
    println(f"envelopeOf reject path vs today: ${tFull / tEnvScan}%.2fx")
    println(f"envelope-only consumers (grid/bounds): ${tDecode / tEnvOnly}%.2fx")
    println(f"envelope-prefix speedup at ${hits * 100.0 / nGeoms}%.0f%%%% hit rate: ${tFull / tEnvCached}%.2fx")
    println(f"upper bound (fully decoded): ${tFull / tMath}%.2fx")
    println(s"(decode-only check: ${tDecode}s)")
  }
}
