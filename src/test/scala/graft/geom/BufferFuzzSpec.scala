package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Seeded property sweep over the buffer kernel — the remaining
  * approximate constructive op without a randomized differential. The
  * offset-polygon result has no closed form, so the oracle is the
  * definition itself, checked by POINT CLASSIFICATION against the
  * independent distance kernel:
  *
  *   for sampled probe points p,
  *     distance(g, p) < d·(1-ε)  ⇒  p ∈ buffer(g, d)
  *     distance(g, p) > d        ⇒  p ∉ buffer(g, d)
  *
  * where ε covers the circular-arc chordal approximation: a regular
  * inscribed arc of `n = 4·resolution` segments has sagitta factor
  * 1 − cos(π/n), so buffer(resolution=16) may cut at most ~0.2% inside
  * the true radius and never outside it. The same classification drives
  * the negative-buffer contract (erosion: inside ⇔ deeper than d from
  * the complement) and area monotonicity d1 < d2 ⇒ buffers nested.
  */
class BufferFuzzSpec extends AnyFunSuite {

  private var state = 0x777EA1337L
  private def nextLong(): Long = {
    state = graft.sql.TextKernel.mix64(state + 0x9e3779b97f4a7c15L)
    state
  }
  private def nextInt(n: Int): Int = ((nextLong() >>> 33) % n).toInt
  private def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble

  private def genGeom(kind: Int): Geometry = {
    val cx = nextInt(10).toDouble; val cy = nextInt(10).toDouble
    kind match {
      case 0 => Point(cx, cy)
      case 1 =>
        val n = 2 + nextInt(4)
        val xy = new Array[Double](2 * n)
        var x = cx; var y = cy
        var i = 0
        while (i < n) {
          xy(2 * i) = x; xy(2 * i + 1) = y
          x += nextDouble() * 6 - 3; y += nextDouble() * 6 - 3
          i += 1
        }
        LineString(xy)
      case 2 =>
        val w = 1.0 + nextInt(8); val h = 1.0 + nextInt(8)
        Polygon(Array(Array(cx, cy, cx + w, cy, cx + w, cy + h, cx, cy + h, cx, cy)))
      case 3 => // concave star
        val n = 4 + nextInt(4)
        val pts = (0 until 2 * n).map { i =>
          val th = math.Pi * i / n
          val r = if (i % 2 == 0) 3.0 + nextInt(3) else 1.0 + nextInt(2)
          (cx + r * math.cos(th), cy + r * math.sin(th))
        }
        Polygon(Array(pts.flatMap(p => Seq(p._1, p._2)).toArray ++
          Array(pts.head._1, pts.head._2)))
      case _ => // square with a hole
        val w = 4.0 + nextInt(6)
        Polygon(Array(
          Array(cx, cy, cx + w, cy, cx + w, cy + w, cx, cy + w, cx, cy),
          Array(cx + 1, cy + 1, cx + 1, cy + 2, cx + 2, cy + 2, cx + 2, cy + 1, cx + 1, cy + 1)))
    }
  }

  test("positive buffer: distance-classified membership and monotone nesting") {
    val chordEps = 1.0 - math.cos(math.Pi / 64.0) // resolution=16 → n=64
    var rounds = 0
    var probes = 0
    while (rounds < 250) {
      val g = genGeom(nextInt(5))
      val d = 0.25 + nextDouble() * 3.0
      val buf = Constructive.buffer(g, d)
      val bufBig = Constructive.buffer(g, d * 1.5)
      val env = g.envelope
      var k = 0
      while (k < 40) {
        val px = env.minX - d * 2 + nextDouble() * (env.maxX - env.minX + 4 * d)
        val py = env.minY - d * 2 + nextDouble() * (env.maxY - env.minY + 4 * d)
        val p = Point(px, py)
        val dist = Measures.distance(g, p)
        // margin: stay clear of both the chordal cut and fp noise
        if (dist < d * (1.0 - chordEps) - 1e-9) {
          probes += 1
          assert(Predicates.covers(buf, p),
            s"dist=$dist < d=$d but probe ($px,$py) outside buffer of ${Wkt.write(g)}")
        } else if (dist > d + 1e-9) {
          probes += 1
          assert(!Predicates.intersects(buf, p),
            s"dist=$dist > d=$d but probe ($px,$py) inside buffer of ${Wkt.write(g)}")
          // nesting: the bigger buffer classifies by the same rule
          if (dist > d * 1.5 + 1e-9)
            assert(!Predicates.intersects(bufBig, p), s"outer-buffer leak at ($px,$py)")
        }
        k += 1
      }
      // area monotonicity (areal results only — point/line buffers too)
      assert(Measures.area(bufBig) >= Measures.area(buf) - 1e-9,
        s"buffer area not monotone for ${Wkt.write(g)} d=$d")
      rounds += 1
    }
    info(s"$rounds geometries, $probes classified probes")
    assert(probes > 5000, s"only $probes probes classified — margins too wide")
  }

  test("point buffer area converges to the disc; line buffer to the capsule") {
    var i = 0
    while (i < 50) {
      val d = 0.5 + nextDouble() * 4.0
      val a = Measures.area(Constructive.buffer(Point(nextInt(10).toDouble, nextInt(10).toDouble), d))
      // inscribed regular 64-gon of radius d: area = (n/2)·d²·sin(2π/n)
      val ngon = 32.0 * d * d * math.sin(math.Pi / 32.0)
      assert(math.abs(a - ngon) <= 1e-6 * ngon,
        s"point buffer area $a != inscribed 64-gon $ngon at d=$d")
      val len = 1.0 + nextDouble() * 8.0
      val cap = Measures.area(Constructive.buffer(LineString(Array(0, 0, len, 0)), d))
      // capsule with polygonal caps: rectangle + inscribed n-gon disc
      val expect = 2.0 * d * len + ngon
      assert(math.abs(cap - expect) <= 1e-2 * expect,
        s"line buffer area $cap != capsule $expect at d=$d len=$len")
      i += 1
    }
  }

  test("negative buffer: erosion stays inside and agrees with depth classification") {
    var rounds = 0
    var probes = 0
    while (rounds < 150) {
      val g = genGeom(2 + nextInt(3)).asInstanceOf[Polygon]
      val d = 0.2 + nextDouble() * 1.5
      val eroded = Constructive.buffer(g, -d)
      if (!eroded.isEmpty) {
        assert(Predicates.covers(g, eroded) ||
          Measures.area(Overlay.difference(eroded, g)) < 1e-6,
          s"erosion escapes the polygon: ${Wkt.write(g)} d=-$d")
      }
      val env = g.envelope
      val boundary = Constructive.boundary(g)
      var k = 0
      while (k < 30) {
        val px = env.minX + nextDouble() * (env.maxX - env.minX)
        val py = env.minY + nextDouble() * (env.maxY - env.minY)
        val p = Point(px, py)
        if (Predicates.contains(g, p)) {
          val depth = Measures.distance(boundary, p)
          // interior point deeper than d (with arc slack) must survive;
          // shallower than d·(1-ε) must be eroded away
          if (depth > d + 1e-9) {
            probes += 1
            assert(Predicates.covers(eroded, p),
              s"depth=$depth > d=$d but ($px,$py) eroded from ${Wkt.write(g)}")
          } else if (depth < d * (1.0 - 1e-3) - 1e-9) {
            probes += 1
            assert(!Predicates.intersects(eroded, p) || Predicates.covers(eroded, p) == false,
              s"depth=$depth < d=$d but ($px,$py) survived erosion of ${Wkt.write(g)}")
          }
        }
        k += 1
      }
      rounds += 1
    }
    info(s"$rounds polygons, $probes depth-classified probes")
    assert(probes > 1000, s"only $probes probes — generator too small for d range")
  }
}
