package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** XYZ slippy-map tile math (Sfc.tileX/tileY/tileEnvelope/quadkey/
  * tileCover). Golden values computed independently (python math over the
  * OSM wiki formulas); properties assert the envelope/index round-trip
  * and the cover's exactness on a grid of probes.
  */
class TileSpec extends AnyFunSuite {
  test("golden tile indices") {
    assert(Sfc.tileX(-87.65, 17) === 33623) // Chicago
    assert(Sfc.tileY(41.85, 17) === 48729)
    assert(Sfc.tileX(139.7006793, 18) === 232798) // Tokyo
    assert(Sfc.tileY(35.6590699, 18) === 103246)
    assert(Sfc.tileX(0.0, 1) === 1)
    assert(Sfc.tileY(0.0, 1) === 1)
  }

  test("extremes clamp into the valid range") {
    assert(Sfc.tileX(-180.0, 4) === 0)
    assert(Sfc.tileX(180.0, 4) === 15)
    assert(Sfc.tileY(90.0, 4) === 0) // clamped to the Mercator limit
    assert(Sfc.tileY(-90.0, 4) === 15)
    assert(Sfc.tileX(-200.0, 3) === 0)
    assert(Sfc.tileX(200.0, 3) === 7)
  }

  test("golden quadkeys") {
    assert(Sfc.quadkey(1, 1, 1) === "3")
    assert(Sfc.quadkey(3, 3, 5) === "213")
    assert(Sfc.quadkey(2, 0, 0) === "00")
  }

  test("quadkey nests: child key extends the parent key") {
    for (z <- 1 to 6; x <- Seq(0, 3, (1 << z) - 1); y <- Seq(0, 2, (1 << z) - 1)) {
      val parent = Sfc.quadkey(z, x, y)
      for (dx <- 0 to 1; dy <- 0 to 1)
        assert(Sfc.quadkey(z + 1, 2 * x + dx, 2 * y + dy).startsWith(parent))
    }
  }

  test("golden envelope and containment round-trip") {
    val (lonMin, latMin, lonMax, latMax) = Sfc.tileEnvelope(2, 1, 1)
    assert(lonMin === -90.0 && lonMax === 0.0)
    assert(latMin === 0.0)
    assert(math.abs(latMax - 66.51326044311186) < 1e-12)
    // any interior point indexes back to its own tile
    for (lon <- Seq(-150.0, -87.65, 0.1, 139.7); lat <- Seq(-60.0, 0.3, 41.85, 80.0);
         z <- Seq(1, 5, 10)) {
      val x = Sfc.tileX(lon, z); val y = Sfc.tileY(lat, z)
      val (a, b, c, d) = Sfc.tileEnvelope(z, x, y)
      assert(lon >= a && lon <= c && lat >= b && lat <= d,
        s"($lon,$lat) z$z not inside tile ($x,$y) env [$a,$b,$c,$d]")
    }
  }

  test("tileCover is exactly the tiles a probe grid lands in") {
    val (minX, minY, maxX, maxY) = (-10.3, 20.1, 15.7, 41.9)
    val z = 6
    val cover = Sfc.tileCover(minX, minY, maxX, maxY, z).toSet
    // every sampled point in the box lands in a covered tile
    for (i <- 0 to 20; j <- 0 to 20) {
      val lon = minX + (maxX - minX) * i / 20.0
      val lat = minY + (maxY - minY) * j / 20.0
      val key = (Sfc.tileX(lon, z).toLong << 32) | (Sfc.tileY(lat, z).toLong & 0xffffffffL)
      assert(cover.contains(key))
    }
    // and the cover is tight: each covered tile's envelope intersects the box
    for (key <- cover) {
      val x = (key >> 32).toInt; val y = (key & 0xffffffffL).toInt
      val (a, b, c, d) = Sfc.tileEnvelope(z, x, y)
      assert(c >= minX && a <= maxX && d >= minY && b <= maxY)
    }
  }
}
