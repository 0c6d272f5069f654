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

    // ---- r10: envelope short-circuit INSIDE the binary predicate, per
    // envelope-hit-rate regime, per-row vs 1024-row batched (columnar
    // prototype: pass 1 scans envelopes into preallocated arrays, pass 2
    // decodes only surviving rows — quantifies what an Arrow-columnar
    // expression path could add beyond the per-row short-circuit)
    println("\n-- r10 envelope short-circuit probe --")
    for (targetHit <- Seq(0.9, 0.5, 0.1)) {
      val bShift = Array.tabulate(nGeoms) { i =>
        val e = envA(i)
        // shift B so that ~targetHit of pairs keep overlapping envelopes
        if (rnd.nextDouble() < targetHit) e.minX
        else e.minX + e.width * 4 + 1.0
      }
      val wkbB2 = Array.tabulate(nGeoms) { i =>
        val e = envA(i)
        Wkb.write(Polygon.box(bShift(i), e.minY, bShift(i) + e.width, e.maxY))
      }
      val actualHit = (0 until nGeoms).count(i =>
        Wkb.envelopeOf(wkbA(i)).intersects(Wkb.envelopeOf(wkbB2(i)))) * 100.0 / nGeoms
      val tToday = bench(f"  hit=$actualHit%.0f%%%% today", iters) { n =>
        var acc = 0L; var i = 0
        while (i < n) {
          val k = i & mask
          if (Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB2(k)))) acc += 1
          i += 1
        }
        acc
      }
      val tShort = bench(f"  hit=$actualHit%.0f%%%% per-row short-circuit", iters) { n =>
        var acc = 0L; var i = 0
        while (i < n) {
          val k = i & mask
          if (Wkb.envelopeOf(wkbA(k)).intersects(Wkb.envelopeOf(wkbB2(k))) &&
            Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB2(k)))) acc += 1
          i += 1
        }
        acc
      }
      // batched prototype: envelope pass over a block, then decode pass
      val block = 1024
      val exmin = new Array[Double](block); val exmax = new Array[Double](block)
      val eymin = new Array[Double](block); val eymax = new Array[Double](block)
      val fxmin = new Array[Double](block); val fxmax = new Array[Double](block)
      val fymin = new Array[Double](block); val fymax = new Array[Double](block)
      val survive = new Array[Boolean](block)
      val tBatch = bench(f"  hit=$actualHit%.0f%%%% 1024-row batched", iters) { n =>
        var acc = 0L; var base = 0
        while (base < n) {
          val m = math.min(block, n - base)
          var i = 0
          while (i < m) {
            val k = (base + i) & mask
            val ea = Wkb.envelopeOf(wkbA(k)); val eb = Wkb.envelopeOf(wkbB2(k))
            exmin(i) = ea.minX; exmax(i) = ea.maxX; eymin(i) = ea.minY; eymax(i) = ea.maxY
            fxmin(i) = eb.minX; fxmax(i) = eb.maxX; fymin(i) = eb.minY; fymax(i) = eb.maxY
            i += 1
          }
          i = 0
          while (i < m) { // branch-light vectorizable envelope test
            survive(i) = exmin(i) <= fxmax(i) && fxmin(i) <= exmax(i) &&
              eymin(i) <= fymax(i) && fymin(i) <= eymax(i)
            i += 1
          }
          i = 0
          while (i < m) {
            if (survive(i)) {
              val k = (base + i) & mask
              if (Predicates.intersects(Wkb.read(wkbA(k)), Wkb.read(wkbB2(k)))) acc += 1
            }
            i += 1
          }
          base += m
        }
        acc
      }
      println(f"    short-circuit vs today: ${tToday / tShort}%.2fx; batched vs today: ${tToday / tBatch}%.2fx; batched vs short-circuit: ${tShort / tBatch}%.2fx")
    }

    // ---- r10b: content-keyed decode cache probe. Join refinement hands
    // the kernel FRESH byte copies of the SAME geometry for every
    // candidate pair (UnsafeRow.getBinary copies), so the reference memo
    // can't hit — the g2 dispatch now probes a direct-mapped per-thread
    // cache keyed by (length, sampled hash, full equality). Simulate SMJ
    // refinement: each "stream row" (point) meets C candidates drawn from
    // the same working set (a grid cell), bytes cloned per access.
    println("\n-- r10b decode-cache probe (fresh byte copies per access) --")
    for ((nv, label) <- Seq((5, "5-pt box"), (65, "64-vertex ring"), (257, "256-vertex ring"))) {
      val ring = Array.tabulate(nv) { j =>
        val a = 2 * math.Pi * j / (nv - 1); (math.cos(a), math.sin(a))
      }
      for (cands <- Seq(16, 256)) {
        val polyWkb = Array.tabulate(cands) { i =>
          Wkb.write(Polygon(Array(ring.flatMap { case (x, y) =>
            Array(x * (1 + i * 0.01), y * (1 + i * 0.01)) })))
        }
        val ptWkb = Wkb.write(Point(0.5, 0.5))
        val n = math.max(200000, iters / math.max(1, nv / 8))
        val tFresh = bench(f"  $label%-15s C=$cands%-4d read", n) { m =>
          var acc = 0L; var i = 0
          while (i < m) {
            val b = polyWkb(i % cands).clone()
            if (Predicates.intersects(Wkb.read(ptWkb), Wkb.read(b))) acc += 1
            i += 1
          }
          acc
        }
        val tCache = bench(f"  $label%-15s C=$cands%-4d cached", n) { m =>
          var acc = 0L; var i = 0
          while (i < m) {
            val b = polyWkb(i % cands).clone()
            if (Predicates.intersects(Wkb.read(ptWkb),
              graft.sql.GraftDefs.geomCachedForProfile(b))) acc += 1
            i += 1
          }
          acc
        }
        println(f"    cached vs read: ${tFresh / tCache}%.2fx")
      }
    }
  }
}
