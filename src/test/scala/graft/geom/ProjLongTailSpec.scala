package graft.geom

import graft.sql.Crs
import org.scalatest.funsuite.AnyFunSuite

/** r11 long-tail projection kernels (sinu / moll / eck4 / mill / gnom /
  * ortho / cass / eqdc / poly / tpeqd / robin / vandg / lcc-1SP).
  *
  * Validation strategy: instead of memorized worked examples, each family
  * is pinned by the MATHEMATICAL PROPERTY that defines it (the same
  * properties Snyder 1987 derives them from), measured numerically:
  *   - equal-area families: the forward Jacobian determinant equals the
  *     ellipsoid/sphere area element M·N·cos(phi) everywhere,
  *   - equidistant families: the appropriate arc-length derivative is 1,
  *   - conformal families: meridian scale == parallel scale and the axes
  *     stay orthogonal, with k(standard parallel) = k0,
  *   - gnomonic: great circles project to straight lines,
  *   - two-point equidistant: plane distances from both base points equal
  *     the great-circle distances,
  * plus closed-form anchors (poles, natural origins, equator widths) and
  * forward-inverse roundtrips over each family's service domain. A kernel
  * that satisfies its defining property at 1e-6 relative everywhere AND
  * roundtrips is the projection, up to the published-formula level.
  */
class ProjLongTailSpec extends AnyFunSuite {

  private val A = 6378137.0
  private val RF = 298.257223563
  private val F = 1.0 / RF
  private val E2 = F * (2.0 - F)

  // ellipsoidal area element factors
  private def bigW(phiRad: Double) = math.sqrt(1.0 - E2 * math.sin(phiRad) * math.sin(phiRad))
  private def mRad(phiRad: Double) = A * (1.0 - E2) / math.pow(bigW(phiRad), 3) // meridian radius
  private def nRad(phiRad: Double) = A / bigW(phiRad)                           // prime vertical

  /** Numeric Jacobian of the forward map wrt (lon, lat) in RADIANS. */
  private def jac(p: Crs.Projection, lon: Double, lat: Double): (Double, Double, Double, Double) = {
    val h = 1e-6 // degrees
    val (x0, y0) = p.forward(lon - h, lat)
    val (x1, y1) = p.forward(lon + h, lat)
    val (x2, y2) = p.forward(lon, lat - h)
    val (x3, y3) = p.forward(lon, lat + h)
    val dRad = math.toRadians(2 * h)
    ((x1 - x0) / dRad, (x3 - x2) / dRad, (y1 - y0) / dRad, (y3 - y2) / dRad)
  }

  private def roundtrip(p: Crs.Projection, lon: Double, lat: Double, tolDeg: Double,
      label: String): Unit = {
    val (x, y) = p.forward(lon, lat)
    assert(!x.isNaN && !y.isNaN, s"$label forward NaN at ($lon,$lat)")
    val (lo, la) = p.inverse(x, y)
    assert(math.hypot(lo - lon, la - lat) < tolDeg,
      s"$label roundtrip ($lon,$lat) -> ($lo,$la)")
  }

  test("sinusoidal: equal-area everywhere, true parallels, arc-true central meridian") {
    val p = new Crs.Sinusoidal(A, RF, 12.0, 100.0, -50.0)
    for (lat <- Seq(-75.0, -40.0, -5.0, 0.0, 20.0, 55.0, 80.0);
         lon <- Seq(-160.0, -60.0, 11.0, 12.0, 90.0, 170.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      val truth = mRad(phi) * nRad(phi) * math.cos(phi)
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"area scale at ($lon,$lat)")
      // true scale along every parallel: |dx/dlam| = N cos(phi)
      assert(math.abs(math.abs(j11) / (nRad(phi) * math.cos(phi)) - 1.0) < 1e-6,
        s"parallel scale at ($lon,$lat)")
      // 5e-7 deg: the Snyder 3-26 inverse-rectifying series truncates at
      // the e^8 term (same bound as the TM codes' roundtrip)
      roundtrip(p, lon, lat, 5e-7, "sinu")
    }
    // central meridian: x = fe exactly, y equidistant (numeric arc integral)
    val steps = 2000
    var arc = 0.0
    var k = 0
    while (k < steps) { // Simpson over M(phi) dphi, 0 -> 60 deg
      val a0 = math.toRadians(60.0 * k / steps)
      val a1 = math.toRadians(60.0 * (k + 1) / steps)
      arc += (a1 - a0) / 6.0 * (mRad(a0) + 4 * mRad((a0 + a1) / 2) + mRad(a1))
      k += 1
    }
    val (x60, y60) = p.forward(12.0, 60.0)
    val (_, y00) = p.forward(12.0, 0.0)
    assert(math.abs(x60 - 100.0) < 1e-6)
    assert(math.abs((y60 - y00) - arc) < 0.002, s"meridian arc ${y60 - y00} vs $arc")
  }

  test("mollweide: equal-area on the sphere, pole/equator anchors") {
    val p = new Crs.Mollweide(A, 0.0, 0.0, 0.0)
    for (lat <- Seq(-80.0, -45.0, -10.0, 0.0, 30.0, 60.0, 85.0);
         lon <- Seq(-170.0, -90.0, 0.0, 45.0, 179.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val truth = A * A * math.cos(math.toRadians(lat))
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"area scale at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-7, "moll")
    }
    // poles collapse to (0, +-sqrt(2) a); equator spans +-2 sqrt(2) a
    val (xp, yp) = p.forward(77.0, 90.0)
    assert(math.abs(xp) < 1e-6 && math.abs(yp - math.sqrt(2.0) * A) < 1e-6)
    val (xe, ye) = p.forward(180.0, 0.0)
    assert(math.abs(xe - 2.0 * math.sqrt(2.0) * A) < 1e-6 && math.abs(ye) < 1e-12)
  }

  test("eckert iv: equal-area on the sphere, pole line = half the equator") {
    val p = new Crs.EckertIV(A, 0.0, 0.0, 0.0)
    for (lat <- Seq(-85.0, -50.0, -15.0, 0.0, 25.0, 65.0, 88.0);
         lon <- Seq(-175.0, -60.0, 0.0, 100.0, 175.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val truth = A * A * math.cos(math.toRadians(lat))
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"area scale at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-7, "eck4")
    }
    val (xeq, _) = p.forward(180.0, 0.0)
    val (xpole, _) = p.forward(180.0, 90.0)
    assert(math.abs(xpole / xeq - 0.5) < 1e-8, "pole line half the equator")
  }

  test("miller cylindrical: linear x, published y closed form, roundtrip") {
    val p = new Crs.MillerCylindrical(A, -30.0, 0.0, 0.0)
    for (lat <- Seq(-88.0, -45.0, 0.0, 33.3, 66.6, 89.0); lon <- Seq(-150.0, -30.0, 60.0)) {
      val (x, y) = p.forward(lon, lat)
      assert(math.abs(x - A * math.toRadians(lon + 30.0)) < 1e-6)
      val expY = A * math.log(math.tan(math.Pi / 4.0 + 0.4 * math.toRadians(lat))) / 0.8
      assert(math.abs(y - expY) < 1e-6)
      roundtrip(p, lon, lat, 1e-9, "mill")
    }
  }

  test("gnomonic: great circles are straight lines; horizon is NaN") {
    val p = new Crs.Gnomonic(A, 40.0, -100.0, 0.0, 0.0)
    // sample points along random great circles through the visible cap via
    // slerp between two unit vectors near the center
    val rnd = new scala.util.Random(7)
    def unit(lon: Double, lat: Double) = {
      val ph = math.toRadians(lat); val lm = math.toRadians(lon)
      (math.cos(ph) * math.cos(lm), math.cos(ph) * math.sin(lm), math.sin(ph))
    }
    for (_ <- 0 until 40) {
      val aPt = (rnd.nextDouble() * 60 - 130, rnd.nextDouble() * 50 + 15)
      val bPt = (rnd.nextDouble() * 60 - 130, rnd.nextDouble() * 50 + 15)
      val (ax, ay, az) = unit(aPt._1, aPt._2)
      val (bx, by, bz) = unit(bPt._1, bPt._2)
      val dot = ax * bx + ay * by + az * bz
      val om = math.acos(math.max(-1.0, math.min(1.0, dot)))
      if (om > 1e-3) {
        val pts = (0 to 4).map { i =>
          val t = i / 4.0
          val s0 = math.sin((1 - t) * om) / math.sin(om)
          val s1 = math.sin(t * om) / math.sin(om)
          val (vx, vy, vz) = (s0 * ax + s1 * bx, s0 * ay + s1 * by, s0 * az + s1 * bz)
          val lat = math.toDegrees(math.asin(vz / math.sqrt(vx * vx + vy * vy + vz * vz)))
          val lon = math.toDegrees(math.atan2(vy, vx))
          p.forward(lon, lat)
        }
        // collinearity of all samples with the endpoints
        val (x0, y0) = pts.head; val (x1, y1) = pts.last
        val len = math.hypot(x1 - x0, y1 - y0)
        pts.foreach { case (x, y) =>
          val cross = math.abs((x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)) / len
          assert(cross < 1e-4 * len + 1e-3, s"great-circle deviation $cross")
        }
      }
    }
    for (lat <- Seq(5.0, 40.0, 75.0); lon <- Seq(-160.0, -100.0, -50.0))
      roundtrip(p, lon, lat, 1e-8, "gnom")
    val (nx, _) = p.forward(80.0, -40.0) // antipodal side
    assert(nx.isNaN)
  }

  test("orthographic (ellipsoidal): center anchors, unit scales at center, roundtrip") {
    for (lat0 <- Seq(-35.0, 0.0, 47.0); lon0 <- Seq(-120.0, 10.0)) {
      val p = new Crs.Orthographic(A, RF, lat0, lon0, 5000.0, -3000.0)
      val (cx, cy) = p.forward(lon0, lat0)
      assert(math.abs(cx - 5000.0) < 1e-6 && math.abs(cy + 3000.0) < 1e-6,
        s"center anchor at ($lon0,$lat0)")
      // defining perspective property at the center: meridian scale M(phi0),
      // parallel scale N(phi0) cos(phi0) — i.e. BOTH local scales exactly 1
      val (j11, j12, j21, j22) = jac(p, lon0, lat0)
      val phi0 = math.toRadians(lat0)
      assert(math.abs(j22 / mRad(phi0) - 1.0) < 1e-6, "meridian scale 1 at center")
      assert(math.abs(j11 / (nRad(phi0) * math.cos(phi0)) - 1.0) < 1e-6,
        "parallel scale 1 at center")
      assert(math.abs(j12) < 1e-3 && math.abs(j21) < 1e-3, "axes orthogonal at center")
      for (dlat <- Seq(-40.0, -10.0, 0.0, 25.0, 40.0); dlon <- Seq(-45.0, -5.0, 20.0, 45.0)) {
        val lat = lat0 + dlat
        if (lat > -89 && lat < 89)
          roundtrip(p, lon0 + dlon, lat, 1e-7, "ortho")
      }
      val (fx, _) = p.forward(lon0 + 175.0, -lat0) // far hemisphere
      assert(fx.isNaN)
    }
  }

  test("cassini-soldner: central-meridian arc-true, x=0 on meridian, roundtrip") {
    val p = new Crs.CassiniSoldner(A, RF, 10.0, -61.5, 430000.0, 325000.0)
    // central meridian maps to x = fe, y = fn + (M(phi) - M0): check the
    // increment against a numeric Simpson integral of the meridian radius
    val steps = 2000
    var arc = 0.0
    var k = 0
    while (k < steps) { // 10 -> 14 deg
      val a0 = math.toRadians(10.0 + 4.0 * k / steps)
      val a1 = math.toRadians(10.0 + 4.0 * (k + 1) / steps)
      arc += (a1 - a0) / 6.0 * (mRad(a0) + 4 * mRad((a0 + a1) / 2) + mRad(a1))
      k += 1
    }
    val (x14, y14) = p.forward(-61.5, 14.0)
    assert(math.abs(x14 - 430000.0) < 1e-6)
    assert(math.abs((y14 - 325000.0) - arc) < 0.002, s"meridian arc ${y14 - 325000.0} vs $arc")
    for (lat <- Seq(8.0, 10.0, 11.5, 13.0); lon <- Seq(-63.0, -61.5, -60.0))
      roundtrip(p, lon, lat, 1e-8, "cass")
    // THE Cassini property, cross-checked against an INDEPENDENT engine:
    // |x - fe| is the geodesic distance from the point to the central
    // meridian (the perpendicular foot) — minimize Vincenty distance to
    // (lon0, latF) over latF by ternary search
    for ((lon, lat) <- Seq((-60.5, 11.0), (-62.3, 9.2))) {
      val (x, _) = p.forward(lon, lat)
      def dTo(latF: Double) = Crs.geodesicDistance(lon, lat, -61.5, latF)
      var lo = lat - 1.0; var hi = lat + 1.0
      for (_ <- 0 until 200) {
        val m1 = lo + (hi - lo) / 3.0; val m2 = hi - (hi - lo) / 3.0
        if (dTo(m1) < dTo(m2)) hi = m2 else lo = m1
      }
      val perp = dTo((lo + hi) / 2.0)
      assert(math.abs(math.abs(x - 430000.0) - perp) < 0.5,
        s"cassini x ${math.abs(x - 430000.0)} vs perpendicular geodesic $perp at ($lon,$lat)")
    }
  }

  test("equidistant conic: meridians true everywhere, parallels true at both SPs, 1SP limit") {
    val p = new Crs.EquidistantConic(A, RF, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)
    for (lat <- Seq(20.0, 29.5, 35.0, 45.5, 55.0); lon <- Seq(-120.0, -96.0, -75.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      // meridian scale: |d(x,y)/dphi| / M(phi) = 1
      val h = math.hypot(j12, j22) / mRad(phi)
      assert(math.abs(h - 1.0) < 1e-6, s"meridian scale $h at ($lon,$lat)")
      // parallel scale is 1 exactly at the standard parallels
      if (lat == 29.5 || lat == 45.5) {
        val kk = math.hypot(j11, j21) / (nRad(phi) * math.cos(phi))
        assert(math.abs(kk - 1.0) < 1e-6, s"SP scale $kk at $lat")
      }
      roundtrip(p, lon, lat, 1e-8, "eqdc")
    }
    // 1SP: the analytic n = sin(phi1) limit agrees with 2SP at a tiny split
    val one = new Crs.EquidistantConic(A, RF, 30.0, -90.0, 40.0, 40.0, 0.0, 0.0)
    val two = new Crs.EquidistantConic(A, RF, 30.0, -90.0, 40.0 - 5e-7, 40.0 + 5e-7, 0.0, 0.0)
    val (xa, ya) = one.forward(-85.0, 44.0)
    val (xb, yb) = two.forward(-85.0, 44.0)
    assert(math.hypot(xa - xb, ya - yb) < 0.5, s"1SP limit ($xa,$ya) vs ($xb,$yb)")
    roundtrip(one, -85.0, 44.0, 1e-8, "eqdc1sp")
  }

  test("polyconic: equator line, parallels are N*cot(phi) arcs about the meridian, roundtrip") {
    val p = new Crs.Polyconic(A, RF, 0.0, -60.0, 0.0, 0.0)
    // equator is the straight line y = -M0 = 0 with x = a * dlam
    val (xe, ye) = p.forward(-50.0, 0.0)
    assert(math.abs(xe - A * math.toRadians(10.0)) < 1e-6 && math.abs(ye) < 1e-6)
    // each parallel is an arc of radius N cot(phi) centered on the central
    // meridian at (0, M + N cot(phi)) — the projection's construction
    for (lat <- Seq(-55.0, -20.0, 15.0, 40.0, 70.0); lon <- Seq(-90.0, -72.0, -60.0, -35.0)) {
      val phi = math.toRadians(lat)
      val ncot = nRad(phi) * math.cos(phi) / math.sin(phi)
      val (x, y) = p.forward(lon, lat)
      val (_, yc) = p.forward(-60.0, lat)
      val d = math.hypot(x - 0.0, y - (yc + ncot))
      assert(math.abs(d / math.abs(ncot) - 1.0) < 1e-9, s"parallel arc at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-7, "poly")
    }
  }

  test("two-point equidistant: both base distances preserved, side sign, roundtrip") {
    val p = new Crs.TwoPointEquidistant(A, 35.0, -10.0, 45.0, 25.0, 0.0, 0.0)
    def gc(lo1: Double, la1: Double, lo2: Double, la2: Double): Double = {
      val p1 = math.toRadians(la1); val p2 = math.toRadians(la2)
      A * math.acos(math.max(-1.0, math.min(1.0,
        math.sin(p1) * math.sin(p2) +
          math.cos(p1) * math.cos(p2) * math.cos(math.toRadians(lo2 - lo1)))))
    }
    val (b1x, b1y) = p.forward(-10.0, 35.0)
    val (b2x, b2y) = p.forward(25.0, 45.0)
    // base points land symmetric on the x axis, separation = great circle
    assert(math.abs(b1y) < 1e-6 && math.abs(b2y) < 1e-6)
    assert(math.abs(b1x + b2x) < 1e-6)
    assert(math.abs((b2x - b1x) - gc(-10.0, 35.0, 25.0, 45.0)) < 1e-6)
    for (lat <- Seq(20.0, 33.0, 47.0, 60.0); lon <- Seq(-25.0, -5.0, 10.0, 38.0)) {
      val (x, y) = p.forward(lon, lat)
      assert(math.abs(math.hypot(x - b1x, y - b1y) - gc(-10.0, 35.0, lon, lat)) < 1e-6,
        s"distance from base 1 at ($lon,$lat)")
      assert(math.abs(math.hypot(x - b2x, y - b2y) - gc(25.0, 45.0, lon, lat)) < 1e-6,
        s"distance from base 2 at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-6, "tpeqd")
    }
    // side sign: with base points on the equator, northern points get y > 0
    val eq = new Crs.TwoPointEquidistant(A, 0.0, -30.0, 0.0, 30.0, 0.0, 0.0)
    assert(eq.forward(0.0, 45.0)._2 > 0)
    assert(eq.forward(0.0, -45.0)._2 < 0)
  }

  test("robinson: published table nodes exact, monotone, roundtrip") {
    val p = new Crs.Robinson(A, 0.0, 0.0, 0.0)
    // node anchors from Robinson's table: (45deg -> 0.5571/0.8962),
    // equator, pole
    val (x45, y45) = p.forward(100.0, 45.0)
    assert(math.abs(x45 - 0.8487 * A * 0.8962 * math.toRadians(100.0)) < 1e-6)
    assert(math.abs(y45 - 1.3523 * A * 0.5571) < 1e-6)
    val (xeq, yeq) = p.forward(100.0, 0.0)
    assert(math.abs(xeq - 0.8487 * A * math.toRadians(100.0)) < 1e-6 && math.abs(yeq) < 1e-12)
    val (_, yp) = p.forward(0.0, 90.0)
    assert(math.abs(yp - 1.3523 * A) < 1e-6)
    // southern symmetry
    val (xs, ys) = p.forward(100.0, -45.0)
    assert(math.abs(xs - x45) < 1e-9 && math.abs(ys + y45) < 1e-9)
    for (lat <- Seq(-82.0, -37.5, 0.0, 12.3, 61.7, 88.0); lon <- Seq(-170.0, -45.0, 80.0))
      roundtrip(p, lon, lat, 1e-6, "robin")
  }

  test("van der grinten: equator/meridian closed forms, world circle, roundtrip") {
    val p = new Crs.VanDerGrinten(A, 0.0, 0.0, 0.0)
    // equator is x = a * dlam (the published phi=0 branch)
    val (xe, ye) = p.forward(120.0, 0.0)
    assert(math.abs(xe - A * math.toRadians(120.0)) < 1e-6 && ye == 0.0)
    // central meridian: y = pi a tan(theta/2), theta = asin(2 phi / pi)
    for (lat <- Seq(-60.0, 30.0, 75.0)) {
      val th = math.asin(math.abs(2.0 * math.toRadians(lat) / math.Pi))
      val (x, y) = p.forward(0.0, lat)
      assert(math.abs(x) < 1e-6)
      assert(math.abs(y - math.signum(lat) * math.Pi * A * math.tan(th / 2.0)) < 1e-6)
    }
    // whole map inside the circle of radius pi a
    for (lat <- Seq(-80.0, -40.0, 20.0, 70.0); lon <- Seq(-179.0, -90.0, 45.0, 179.0)) {
      val (x, y) = p.forward(lon, lat)
      assert(math.hypot(x, y) <= math.Pi * A * (1.0 + 1e-9), s"outside rim at ($lon,$lat)")
    }
    for (lat <- Seq(-70.0, -25.0, 10.0, 55.0); lon <- Seq(-150.0, -60.0, 30.0, 140.0))
      roundtrip(p, lon, lat, 1e-6, "vandg")
  }

  test("lcc 1SP: conformal, k0 at the standard parallel, roundtrip, parser") {
    // British Caribbean grids' shape: one parallel + a natural-origin k0
    val k0 = 0.9995
    val p = new Crs.LambertConic1SP(A, RF, 39.0, 39.0, -77.0, k0, 400000.0, 100000.0)
    for (lat <- Seq(30.0, 36.0, 39.0, 43.0, 48.0); lon <- Seq(-90.0, -77.0, -65.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      val hM = math.hypot(j12, j22) / mRad(phi)
      val kP = math.hypot(j11, j21) / (nRad(phi) * math.cos(phi))
      assert(math.abs(hM / kP - 1.0) < 1e-6, s"conformal h==k at ($lon,$lat)")
      assert(math.abs(j11 * j12 + j21 * j22) /
        (math.hypot(j11, j21) * math.hypot(j12, j22)) < 1e-6, "orthogonal axes")
      if (lat == 39.0)
        assert(math.abs(kP - k0) < 1e-6, s"k($lat) = $kP != k0")
      else
        assert(kP > k0 - 1e-9, "scale minimal at the single SP")
      roundtrip(p, lon, lat, 1e-8, "lcc1sp")
    }
    // natural origin lands on the false origin
    val (ox, oy) = p.forward(-77.0, 39.0)
    assert(math.abs(ox - 400000.0) < 1e-6 && math.abs(oy - 100000.0) < 1e-6)
    // parser routes lat_1 == lat_2 here now
    val viaProj = Crs.parseProj("+proj=lcc +lat_0=39 +lat_1=39 +lat_2=39 " +
      "+lon_0=-77 +k_0=0.9995 +x_0=400000 +y_0=100000 +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(-80.0, 42.0)
    val (px, py) = p.forward(-80.0, 42.0)
    assert(math.abs(vx - px) < 1e-9 && math.abs(vy - py) < 1e-9)
  }

  test("azimuthal equidistant: meridian/equator geodesic anchors, symmetry, roundtrip") {
    // a geodesic along the central meridian IS the meridian arc: y must
    // equal the Simpson integral of M(phi) d(phi) — an independent check
    // of the whole Vincenty inverse (and of the direct, via roundtrip)
    val p = new Crs.AzimuthalEquidistant(A, RF, 10.0, 25.0, 0.0, 0.0)
    val steps = 4000
    var arc = 0.0
    var k = 0
    while (k < steps) { // 10 -> 47 deg
      val a0 = math.toRadians(10.0 + 37.0 * k / steps)
      val a1 = math.toRadians(10.0 + 37.0 * (k + 1) / steps)
      arc += (a1 - a0) / 6.0 * (mRad(a0) + 4 * mRad((a0 + a1) / 2) + mRad(a1))
      k += 1
    }
    val (xm, ym) = p.forward(25.0, 47.0)
    assert(math.abs(xm) < 1e-6, "meridian geodesic has azimuth 0")
    assert(math.abs(ym - arc) < 0.001, s"meridian arc $ym vs $arc")
    // the equator is a geodesic: an equatorial center reaches (lon, 0) at
    // exactly a * dlam along azimuth 90
    val eq = new Crs.AzimuthalEquidistant(A, RF, 0.0, 0.0, 0.0, 0.0)
    val (xe, ye) = eq.forward(40.0, 0.0)
    assert(math.abs(xe - A * math.toRadians(40.0)) < 1e-6, s"equator geodesic $xe")
    assert(math.abs(ye) < 1e-6)
    // hemispheric symmetry about an equatorial center
    val (xn, yn) = eq.forward(30.0, 20.0)
    val (xs, ys) = eq.forward(30.0, -20.0)
    assert(math.abs(xn - xs) < 1e-6 && math.abs(yn + ys) < 1e-6)
    // roundtrip = Vincenty direct inverting Vincenty inverse (independent
    // iterations) across a wide service domain
    for (lat <- Seq(-45.0, -10.0, 10.0, 35.0, 70.0);
         lon <- Seq(-120.0, -30.0, 25.0, 90.0, 160.0))
      roundtrip(p, lon, lat, 1e-8, "aeqd")
    // near-antipodal returns NaN rather than a wrong point
    val (ax, _) = eq.forward(179.9, 0.0)
    assert(ax.isNaN)
    // parser route
    val viaProj = Crs.parseProj("+proj=aeqd +lat_0=10 +lon_0=25 +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(30.0, 15.0)
    val (px, py) = p.forward(30.0, 15.0)
    assert(vx == px && vy == py)
  }

  test("hotine oblique mercator: conformal, k0 on the initial line at center, axes, roundtrip") {
    // Borneo RSO shape: center 4N 115E, initial-line azimuth ~53.3 deg
    val k0 = 0.99984
    val alpha = 53.31582
    val p = new Crs.HotineObliqueMercator(A, RF, 4.0, 115.0, alpha, k0,
      Double.NaN, 590476.87, 442857.65, variantB = true)
    // variant B: the projection center lands on the false origin
    val (cx, cy) = p.forward(115.0, 4.0)
    assert(math.abs(cx - 590476.87) < 1e-4 && math.abs(cy - 442857.65) < 1e-4,
      s"center anchor ($cx,$cy)")
    for (lat <- Seq(-2.0, 1.0, 4.0, 7.0, 10.0); lon <- Seq(109.0, 112.0, 115.0, 119.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      val hM = math.hypot(j12, j22) / mRad(phi)
      val kP = math.hypot(j11, j21) / (nRad(phi) * math.cos(phi))
      assert(math.abs(hM / kP - 1.0) < 1e-6, s"conformal h==k at ($lon,$lat)")
      assert(math.abs(j11 * j12 + j21 * j22) /
        (math.hypot(j11, j21) * math.hypot(j12, j22)) < 1e-6, "orthogonal axes")
      roundtrip(p, lon, lat, 1e-8, "omerc")
    }
    // scale along the initial line AT the center is k0 (the defining
    // property); scale grows off the line
    val (jc11, _, jc21, _) = jac(p, 115.0, 4.0)
    val kC = math.hypot(jc11, jc21) / (nRad(math.toRadians(4.0)) * math.cos(math.toRadians(4.0)))
    assert(math.abs(kC - k0) < 1e-6, s"k(center) = $kC != $k0")
    val (jf11, _, jf21, _) = jac(p, 115.0, 12.0)
    val kF = math.hypot(jf11, jf21) / (nRad(math.toRadians(12.0)) * math.cos(math.toRadians(12.0)))
    assert(kF > k0, "scale grows away from the initial line")
    // the u axis at the center points along azimuth alpha: a small step
    // along the geodesic at azimuth alpha moves (to first order) along
    // the grid direction rotated by the rectified angle (gamma defaults
    // to gamma0 here) — check via two forward evaluations
    val d = 1e-4 // degrees along the azimuth, small-circle approx
    val dLat = d * math.cos(math.toRadians(alpha))
    val dLon = d * math.sin(math.toRadians(alpha)) / math.cos(math.toRadians(4.0))
    val (ax, ay) = p.forward(115.0 + dLon, 4.0 + dLat)
    val moveAz = math.atan2(ax - cx, ay - cy) // clockwise from grid north
    // with gamma = gamma0 the initial line at the center runs at the
    // rectified skew: grid azimuth == alpha - (alpha - gamma0) ~ gamma0...
    // assert only the DIRECTION is stable and oblique (0 < az < 90 deg)
    assert(moveAz > 0.1 && moveAz < math.Pi / 2 - 0.1,
      s"initial-line direction ${math.toDegrees(moveAz)}")
    // variant A (no_uoff): same map, translated — distances preserved
    val pa = new Crs.HotineObliqueMercator(A, RF, 4.0, 115.0, alpha, k0,
      Double.NaN, 0.0, 0.0, variantB = false)
    val (a1x, a1y) = pa.forward(112.0, 2.0)
    val (a2x, a2y) = pa.forward(118.0, 8.0)
    val (b1x, b1y) = p.forward(112.0, 2.0)
    val (b2x, b2y) = p.forward(118.0, 8.0)
    assert(math.abs(math.hypot(a2x - a1x, a2y - a1y) -
      math.hypot(b2x - b1x, b2y - b1y)) < 1e-6)
    // parser: azimuth form parses, two-point form and degenerate lat_0 reject
    val viaProj = Crs.parseProj("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582 " +
      "+k_0=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(113.0, 5.0)
    val (px, py) = p.forward(113.0, 5.0)
    assert(math.abs(vx - px) < 1e-9 && math.abs(vy - py) < 1e-9)
    assert(Crs.parseProj("+proj=omerc +lat_1=1 +lon_1=110 +lat_2=5 +lon_2=118").isEmpty)
    assert(Crs.parseProj("+proj=omerc +lat_0=0 +lonc=115 +alpha=53").isEmpty)
  }

  test("geostationary: sub-satellite anchor, scan-angle geometry, limb NaN, sweeps, roundtrip") {
    val h = 35786023.0 // GOES-R height above the ellipsoid
    val goes = new Crs.Geostationary(A, RF, h, -75.0, sweepX = true, 0.0, 0.0)
    val msg = new Crs.Geostationary(A, RF, 35785831.0, 0.0, sweepX = false, 0.0, 0.0)
    // sub-satellite point maps to the origin
    val (sx, sy) = goes.forward(-75.0, 0.0)
    assert(math.abs(sx) < 1e-9 && math.abs(sy) < 1e-9)
    // equatorial points: the scan angle is the exact plane triangle
    // atan(sin dlam / (rg - cos dlam)) seen from the satellite — an
    // independent 2D derivation (the ellipsoid is a circle of radius a
    // in the equatorial plane), identical for both sweep conventions
    val rgN = 1.0 + h / A
    for (dlam <- Seq(-40.0, -10.0, 15.0, 55.0)) {
      val want = h * math.atan(math.sin(math.toRadians(dlam)) /
        (rgN - math.cos(math.toRadians(dlam))))
      val (gx, gy) = goes.forward(-75.0 + dlam, 0.0)
      assert(math.abs(gx - want) < 1e-6, s"equator scan angle at dlam=$dlam: $gx vs $want")
      assert(math.abs(gy) < 1e-9)
    }
    // a point on the central meridian reads a pure y scan angle whose
    // magnitude is the satellite-frame elevation of the geocentric point
    val (mx0, my0) = goes.forward(-75.0, 45.0)
    assert(math.abs(mx0) < 1e-9 && my0 > 0)
    // beyond the visible disc: NaN, not garbage (the far side for sure)
    val (bx, _) = goes.forward(105.0, 0.0)
    assert(bx.isNaN)
    // roundtrip over the visible disc, both sweep conventions
    for (lat <- Seq(-55.0, -20.0, 0.0, 35.0, 60.0); dl <- Seq(-50.0, -15.0, 0.0, 30.0, 58.0)) {
      roundtrip(goes, -75.0 + dl, lat, 1e-7, "geos_x")
      roundtrip(msg, 0.0 + dl, lat, 1e-7, "geos_y")
    }
    // the two sweeps agree on the axes and differ off-axis
    val (gx1, gy1) = goes.forward(-60.0, 30.0)
    val swapped = new Crs.Geostationary(A, RF, h, -75.0, sweepX = false, 0.0, 0.0)
    val (gx2, gy2) = swapped.forward(-60.0, 30.0)
    assert(math.abs(gx1 - gx2) > 1.0 || math.abs(gy1 - gy2) > 1.0)
    // parser: +h required
    assert(Crs.parseProj("+proj=geos +lon_0=0").isEmpty)
    val viaProj = Crs.parseProj(
      s"+proj=geos +h=35786023 +lon_0=-75 +sweep=x +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(-60.0, 30.0)
    assert(vx == gx1 && vy == gy1)
  }

  test("equal earth: equal-area everywhere (validates the published coefficients), roundtrip") {
    val p = new Crs.EqualEarth(A, 0.0, 0.0, 0.0)
    for (lat <- Seq(-85.0, -50.0, -15.0, 0.0, 25.0, 60.0, 88.0);
         lon <- Seq(-175.0, -60.0, 0.0, 100.0, 175.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val truth = A * A * math.cos(math.toRadians(lat))
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"area scale at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-7, "eqearth")
    }
    // equator anchors: y = 0, x symmetric
    val (xe, ye) = p.forward(120.0, 0.0)
    assert(math.abs(ye) < 1e-9 && xe > 0)
    val (xw, _) = p.forward(-120.0, 0.0)
    assert(math.abs(xe + xw) < 1e-9)
    // parser + ESRI WKT name route
    val viaProj = Crs.parseProj("+proj=eqearth +lon_0=0").get
    val (vx, vy) = viaProj.forward(40.0, -20.0)
    val (px, py) = p.forward(40.0, -20.0)
    assert(vx == px && vy == py)
  }

  test("bonne: equal-area, arc-true parallels, SP anchor, roundtrip") {
    val p = new Crs.Bonne(A, RF, 45.0, 10.0, 0.0, 0.0)
    for (lat <- Seq(-30.0, 10.0, 30.0, 45.0, 60.0, 80.0);
         lon <- Seq(-60.0, -10.0, 10.0, 50.0, 80.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      val truth = mRad(phi) * nRad(phi) * math.cos(phi)
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"area scale at ($lon,$lat)")
      // every parallel has true length: plane distance per radian of
      // longitude along the parallel equals N cos(phi)
      val kP = math.hypot(j11, j21) / (nRad(phi) * math.cos(phi))
      assert(math.abs(kP - 1.0) < 1e-6, s"parallel scale $kP at ($lon,$lat)")
      roundtrip(p, lon, lat, 5e-7, "bonne")
    }
    // the central meridian at the standard parallel is the natural origin
    val (ox, oy) = p.forward(10.0, 45.0)
    assert(math.abs(ox) < 1e-9 && math.abs(oy) < 1e-9)
    // southern standard parallel: the cone opens the other way — equal
    // area and roundtrips must hold there too
    val south = new Crs.Bonne(A, RF, -30.0, 135.0, 0.0, 0.0)
    for (lat <- Seq(-60.0, -30.0, -5.0, 15.0); lon <- Seq(110.0, 135.0, 155.0)) {
      val (j11, j12, j21, j22) = jac(south, lon, lat)
      val phi = math.toRadians(lat)
      val truth = mRad(phi) * nRad(phi) * math.cos(phi)
      assert(math.abs((j11 * j22 - j12 * j21) / truth - 1.0) < 1e-5,
        s"southern area scale at ($lon,$lat)")
      roundtrip(south, lon, lat, 5e-7, "bonne_s")
    }
    // parser: lat_1 required and non-zero
    assert(Crs.parseProj("+proj=bonne +lon_0=10").isEmpty)
    assert(Crs.parseProj("+proj=bonne +lat_1=0 +lon_0=10").isEmpty)
    val viaProj = Crs.parseProj("+proj=bonne +lat_1=45 +lon_0=10 +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(20.0, 50.0)
    val (px, py) = p.forward(20.0, 50.0)
    assert(vx == px && vy == py)
  }

  test("world families: poles and antimeridian are finite, point-poles collapse to x=fe") {
    val world: Seq[(String, Crs.Projection, Boolean)] = Seq(
      ("sinu", new Crs.Sinusoidal(A, RF, 0.0, 100.0, 50.0), true),
      ("moll", new Crs.Mollweide(A, 0.0, 100.0, 50.0), true),
      ("eck4", new Crs.EckertIV(A, 0.0, 100.0, 50.0), false), // pole LINE
      ("robin", new Crs.Robinson(A, 0.0, 100.0, 50.0), false),
      ("eqearth", new Crs.EqualEarth(A, 0.0, 100.0, 50.0), false),
      ("mill", new Crs.MillerCylindrical(A, 0.0, 100.0, 50.0), false),
      ("eqdc", new Crs.EquidistantConic(A, RF, 23.0, 0.0, 29.5, 45.5, 100.0, 50.0), false))
    for ((name, p, pointPole) <- world; lat <- Seq(-90.0, 90.0); lon <- Seq(0.0, 77.0)) {
      val (x, y) = p.forward(lon, lat)
      assert(!x.isNaN && !y.isNaN && !x.isInfinite && !y.isInfinite,
        s"$name pole ($lon,$lat) -> ($x,$y)")
      if (pointPole) assert(math.abs(x - 100.0) < 1e-6,
        s"$name pole should collapse to the central meridian, got x=$x")
    }
    for ((name, p, _) <- world; lat <- Seq(-60.0, 0.0, 60.0)) {
      val (x1, y1) = p.forward(180.0, lat)
      val (x2, y2) = p.forward(-180.0, lat)
      assert(!x1.isNaN && !x2.isNaN, s"$name antimeridian")
      // symmetric rims about the central meridian
      assert(math.abs((x1 - 100.0) + (x2 - 100.0)) < 1e-6, s"$name rim symmetry")
      assert(math.abs(y1 - y2) < 1e-6)
    }
  }

  test("geodesic distance: equator/meridian anchors, sphere agreement, antipodal fallback") {
    // the equator is a geodesic of radius a
    assert(math.abs(Crs.geodesicDistance(0.0, 0.0, 10.0, 0.0) -
      A * math.toRadians(10.0)) < 1e-6)
    // a meridian is a geodesic: Vincenty must reproduce the meridian arc
    val steps = 4000
    var arc = 0.0
    var k = 0
    while (k < steps) { // 0 -> 50 deg
      val a0 = math.toRadians(50.0 * k / steps)
      val a1 = math.toRadians(50.0 * (k + 1) / steps)
      arc += (a1 - a0) / 6.0 * (mRad(a0) + 4 * mRad((a0 + a1) / 2) + mRad(a1))
      k += 1
    }
    assert(math.abs(Crs.geodesicDistance(25.0, 0.0, 25.0, 50.0) - arc) < 0.001,
      s"meridian ${Crs.geodesicDistance(25.0, 0.0, 25.0, 50.0)} vs $arc")
    // symmetry + zero
    assert(Crs.geodesicDistance(7.0, 46.0, 7.0, 46.0) == 0.0)
    assert(math.abs(Crs.geodesicDistance(7.0, 46.0, 9.0, 48.0) -
      Crs.geodesicDistance(9.0, 48.0, 7.0, 46.0)) < 1e-9)
    // sphere and spheroid agree to the flattening scale (< 0.6%)
    val dV = Crs.geodesicDistance(2.0, 41.0, 37.6, 55.7)
    val dS = Crs.sphereDistance(2.0, 41.0, 37.6, 55.7)
    assert(math.abs(dV / dS - 1.0) < 0.006, s"$dV vs $dS")
    assert(dV > 2.9e6 && dV < 3.2e6) // Barcelona -> Moscow ~3050 km
    // near-antipodal: finite fallback, never NaN, ~ half the circumference
    val anti = Crs.geodesicDistance(0.0, 0.0, 179.9, 0.3)
    assert(!anti.isNaN && anti > 1.9e7 && anti < 2.1e7)
    // forward azimuth anchors: due north along a meridian, due east along
    // the equator, due south back; general point agrees with the spherical
    // bearing to within the flattening scale
    assert(math.abs(Crs.geodesicAzimuth(25.0, 10.0, 25.0, 40.0)) < 1e-12)
    assert(math.abs(Crs.geodesicAzimuth(0.0, 0.0, 30.0, 0.0) - math.Pi / 2) < 1e-12)
    assert(math.abs(math.abs(Crs.geodesicAzimuth(25.0, 40.0, 25.0, 10.0)) - math.Pi) < 1e-12)
    val azV = Crs.geodesicAzimuth(2.0, 41.0, 37.6, 55.7)
    val p1 = math.toRadians(41.0); val p2 = math.toRadians(55.7)
    val dl = math.toRadians(35.6)
    val azS = math.atan2(math.cos(p2) * math.sin(dl),
      math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl))
    assert(math.abs(azV - azS) < 0.01, s"$azV vs spherical $azS")
  }

  test("omerc two-point form: both points + the lat_0 center lie on the straight initial line") {
    val (lat1, lon1, lat2, lon2) = (1.0, 110.0, 7.0, 120.0)
    val p = Crs.HotineObliqueMercator.twoPoint(A, RF, 4.0,
      lat1, lon1, lat2, lon2, 1.0, 0.0, 0.0, variantB = false)
    // the initial line maps to the u axis — any three of its points are
    // collinear in the plane. Find the lat_0 crossing by bisecting the
    // inverse: the point on the segment between the projections of P1/P2
    // whose latitude is lat_0 (monotone along the line here)
    val (x1, y1) = p.forward(lon1, lat1)
    val (x2, y2) = p.forward(lon2, lat2)
    var lo = 0.0; var hi = 1.0
    for (_ <- 0 until 60) {
      val mid = (lo + hi) / 2.0
      val (_, la) = p.inverse(x1 + (x2 - x1) * mid, y1 + (y2 - y1) * mid)
      if (la < 4.0) lo = mid else hi = mid
    }
    val t = (lo + hi) / 2.0
    val (clon, clat) = p.inverse(x1 + (x2 - x1) * t, y1 + (y2 - y1) * t)
    assert(math.abs(clat - 4.0) < 1e-7, s"lat_0 crossing found at $clat")
    // that crossing, projected back, must land on the P1-P2 segment (it
    // does by construction of the bisection) AND the projection must be
    // conformal + roundtrip across the domain
    for (lat <- Seq(-1.0, 2.0, 5.0, 8.0); lon <- Seq(108.0, 113.0, 118.0, 122.0)) {
      val (j11, j12, j21, j22) = jac(p, lon, lat)
      val phi = math.toRadians(lat)
      val hM = math.hypot(j12, j22) / mRad(phi)
      val kP = math.hypot(j11, j21) / (nRad(phi) * math.cos(phi))
      assert(math.abs(hM / kP - 1.0) < 1e-6, s"conformal at ($lon,$lat)")
      roundtrip(p, lon, lat, 1e-8, "omerc2pt")
    }
    // THE defining check, exact in the construction: with variant B the
    // projection CENTER maps to the false origin, and the initial line
    // (v = 0, rectified by gamma0) is a straight line THROUGH it — so the
    // origin and both given points must be collinear. A wrong lam0/gamma0
    // derivation breaks this at the first order.
    val pb = Crs.HotineObliqueMercator.twoPoint(A, RF, 4.0,
      lat1, lon1, lat2, lon2, 1.0, 0.0, 0.0, variantB = true)
    val (bx1, by1) = pb.forward(lon1, lat1)
    val (bx2, by2) = pb.forward(lon2, lat2)
    val cross = math.abs(bx1 * by2 - bx2 * by1) /
      math.max(math.hypot(bx1, by1), math.hypot(bx2, by2))
    assert(cross < 1e-4, s"P1/P2/center collinearity residual $cross m")
    // scale ON the line stays within the documented aposphere drift
    // (exactly k0 at the center, second-order along the line), and grows
    // much faster off it
    def scaleAt(lon: Double, lat: Double): Double = {
      val (j11, _, j21, _) = jac(p, lon, lat)
      math.hypot(j11, j21) / (nRad(math.toRadians(lat)) * math.cos(math.toRadians(lat)))
    }
    assert(math.abs(scaleAt(lon1, lat1) - 1.0) < 3e-3, s"k(P1) = ${scaleAt(lon1, lat1)}")
    assert(math.abs(scaleAt(lon2, lat2) - 1.0) < 3e-3, s"k(P2) = ${scaleAt(lon2, lat2)}")
    assert(scaleAt(lon1, lat1 + 6.0) > 1.004, "scale grows off the line")
    // parser: two-point records route here; scale rides along
    val viaProj = Crs.parseProj("+proj=omerc +lat_0=4 +lat_1=1 +lon_1=110 " +
      "+lat_2=7 +lon_2=120 +k_0=0.99984 +ellps=WGS84").get
    val (vx, vy) = viaProj.forward(115.0, 5.0)
    assert(!vx.isNaN && !vy.isNaN)
    val (rl, rp) = viaProj.inverse(vx, vy)
    assert(math.hypot(rl - 115.0, rp - 5.0) < 1e-8)
    // degenerate: equal-latitude points have an east-west line the
    // construction cannot express (P = 0 divides) — rejected
    assert(Crs.parseProj("+proj=omerc +lat_0=4 +lat_1=3 +lon_1=110 " +
      "+lat_2=3 +lon_2=120").isEmpty)
  }

  test("parser: every r11 family parses, composes with towgs84, rejects degenerate tpeqd") {
    // probe inside each family's service domain (cass/gnom/ortho are
    // regional by construction — a world-wide probe is out of contract)
    val recs = Seq(
      ("+proj=sinu +lon_0=10 +ellps=WGS84", 3.0, 40.0),
      ("+proj=moll +lon_0=0", 3.0, 40.0),
      ("+proj=eck4", 3.0, 40.0),
      ("+proj=mill +lon_0=-90", 3.0, 40.0),
      ("+proj=gnom +lat_0=40 +lon_0=-100", -95.0, 43.0),
      ("+proj=ortho +lat_0=52 +lon_0=5 +ellps=GRS80", 3.0, 40.0),
      ("+proj=cass +lat_0=10.44 +lon_0=-61.33 +x_0=430000 +y_0=325000 +ellps=intl",
        -61.0, 10.7),
      ("+proj=eqdc +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5", -90.0, 40.0),
      ("+proj=poly +lat_0=0 +lon_0=-54 +ellps=intl", -50.0, -12.0),
      ("+proj=tpeqd +lat_1=35 +lon_1=-10 +lat_2=45 +lon_2=25", 3.0, 40.0),
      ("+proj=robin +lon_0=0", 3.0, 40.0),
      ("+proj=vandg", 3.0, 40.0))
    recs.foreach { case (r, plon, plat) =>
      val p = Crs.parseProj(r)
      assert(p.isDefined, s"failed to parse $r")
      val (x, y) = p.get.forward(plon, plat)
      val (lo, la) = p.get.inverse(x, y)
      assert(math.hypot(lo - plon, la - plat) < 1e-5, s"$r roundtrip")
    }
    // datum wrapper still composes on the long-tail base
    val shifted = Crs.parseProj(
      "+proj=sinu +lon_0=0 +ellps=intl +towgs84=-87,-98,-121").get
    val plain = Crs.parseProj("+proj=sinu +lon_0=0 +ellps=intl").get
    val (sx, sy) = shifted.forward(7.0, 46.0)
    val (pxx, pyy) = plain.forward(7.0, 46.0)
    assert(math.hypot(sx - pxx, sy - pyy) > 50.0, "towgs84 must move the result")
    val (slo, sla) = shifted.inverse(sx, sy)
    assert(math.hypot(slo - 7.0, sla - 46.0) < 1e-6, "shifted roundtrip")
    assert(Crs.parseProj("+proj=tpeqd +lat_1=10 +lon_1=20 +lat_2=10 +lon_2=20").isEmpty,
      "coincident tpeqd base points rejected")
    // ESRI world codes resolve through the parameter table
    for (code <- Seq("ESRI:54003", "ESRI:54008", "ESRI:54009", "ESRI:54012",
        "ESRI:54030", "ESRI:54032")) {
      val p = Crs.byEpsg(code)
      val (x, y) = p.forward(15.0, 35.0)
      val (lo, la) = p.inverse(x, y)
      assert(math.hypot(lo - 15.0, la - 35.0) < 1e-5, s"$code roundtrip")
    }
    val (mx, my) = Crs.byEpsg("ESRI:54009").forward(40.0, -20.0)
    val (rx, ry) = new Crs.Mollweide(6378137.0, 0.0, 0.0, 0.0).forward(40.0, -20.0)
    assert(mx == rx && my == ry)
  }

  test("geodesicDirect: direct ⊣ inverse exactness, anchors, sphere twin") {
    // direct ⊣ inverse: the inverse problem on the direct's output must
    // recover the input distance (sub-mm) and azimuth (1e-8 rad) across
    // latitudes, bearings and distances up to 5000 km
    for (lat <- Seq(-70.0, -33.0, 0.0, 12.0, 48.0, 71.0);
         azDeg <- Seq(0.0, 37.0, 90.0, 133.0, 180.0, 245.0, 359.0);
         d <- Seq(1000.0, 250000.0, 5000000.0)) {
      val az = math.toRadians(azDeg)
      val (lo2, la2) = Crs.geodesicDirect(10.0, lat, az, d)
      val dBack = Crs.geodesicDistance(10.0, lat, lo2, la2)
      assert(math.abs(dBack - d) < 1e-3, s"dist $lat $azDeg $d -> $dBack")
      val azBack = Crs.geodesicAzimuth(10.0, lat, lo2, la2)
      val w = math.abs(azBack - az) min math.abs(math.abs(azBack - az) - 2 * math.Pi)
      assert(w < 1e-8, s"az $lat $azDeg $d -> $azBack vs $az")
    }
    // due north from the equator by the WGS84 quarter meridian reaches
    // the pole (meridian arc length: independent published constant)
    val (_, laPole) = Crs.geodesicDirect(0.0, 0.0, 0.0, 10001965.7293)
    assert(math.abs(laPole - 90.0) < 1e-5, s"quarter meridian -> $laPole")
    // the equator is a geodesic: due east stays on it, arc = d / a
    val (loE, laE) = Crs.geodesicDirect(0.0, 0.0, math.Pi / 2, 1000000.0)
    assert(math.abs(laE) < 1e-9 &&
      math.abs(loE - math.toDegrees(1000000.0 / 6378137.0)) < 1e-9)
    // sphere twin: due-north displacement is exactly degrees(d/R); wraps
    // across the antimeridian
    val (loN, laN) = Crs.sphereProject(5.0, 10.0, 0.0, 111194.9266)
    assert(math.abs(loN - 5.0) < 1e-9 &&
      math.abs(laN - (10.0 + math.toDegrees(111194.9266 / 6371008.8))) < 1e-9)
    val (loW, _) = Crs.sphereProject(179.5, 0.0, math.Pi / 2, 200000.0)
    assert(loW < -178.0, s"antimeridian wrap -> $loW")
    val (loWv, _) = Crs.geodesicDirect(179.5, 0.0, math.Pi / 2, 200000.0)
    assert(loWv < -178.0, s"spheroid antimeridian wrap -> $loWv")
  }
}
