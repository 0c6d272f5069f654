package graft.geom

/** Space-filling-curve encoders — the reference's spatial-partitioning keys
  * (`dask_geopandas/hilbert_distance.py`, `morton_distance.py`,
  * `geohash.py`). Independent implementations of the standard public-domain
  * algorithms: Hilbert via the classic d2xy/xy2d quadrant-rotation loop
  * (Wikipedia "Hilbert curve"), Morton via magic-number bit spreading,
  * geohash via interleaved base-32 (geohash.org scheme).
  *
  * Encoding contract (used by both the Spark expressions and the DuckDB
  * oracle SQL): the geometry's envelope midpoint is scaled into
  * [0, 2^level - 1] over the given total bounds and truncated with floor();
  * empty/missing geometries are an error (same contract as reference
  * `hilbert_distance.py:28-36`).
  */
object Sfc {

  /** Quantize v in [lo,hi] to an integer cell in [0, 2^level - 1]. */
  @inline def quantize(v: Double, lo: Double, hi: Double, level: Int): Long = {
    val side = (1L << level) - 1
    if (hi <= lo) return 0L
    val rel = (v - lo) / (hi - lo)
    val clamped = if (rel < 0) 0.0 else if (rel > 1) 1.0 else rel
    math.floor(clamped * side).toLong
  }

  // ---------------------------------------------------------------- hilbert
  /** Hilbert distance of cell (x,y) on a 2^level x 2^level grid. */
  def hilbertXY2D(level: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << level
    var x = xIn; var y = yIn
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  def hilbert(g: Geometry, level: Int, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Long = {
    val e = g.envelope
    require(!e.isEmpty, "cannot compute Hilbert distance of empty geometry")
    hilbertXY2D(level,
      quantize(e.midX, minX, maxX, level),
      quantize(e.midY, minY, maxY, level))
  }

  // ----------------------------------------------------------------- morton
  /** Spread the low 32 bits of v to the even bit positions. */
  @inline def spreadBits(vIn: Long): Long = {
    var v = vIn & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton/Z-order code: x bits at even positions, y bits at odd. */
  def mortonXY(x: Long, y: Long): Long = spreadBits(x) | (spreadBits(y) << 1)

  def morton(g: Geometry, level: Int, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Long = {
    val e = g.envelope
    require(!e.isEmpty, "cannot compute Morton distance of empty geometry")
    mortonXY(
      quantize(e.midX, minX, maxX, level),
      quantize(e.midY, minY, maxY, level))
  }

  // ---------------------------------------------------------------- geohash
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of a lon/lat point. precision in [1,12] characters. */
  def geohash(lon: Double, lat: Double, precision: Int): String = {
    require(precision >= 1 && precision <= 12, "geohash precision must be 1..12")
    val sb = new StringBuilder(precision)
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Integer geohash: the leading 5*precision interleaved bits as a Long
    * (reference `geohash.py` as_string=False variant).
    */
  def geohashLong(lon: Double, lat: Double, precision: Int): Long = {
    var v = 0L
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var isLon = true
    var i = 0
    val nBits = 5 * precision
    while (i < nBits) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { v = (v << 1) | 1; lonLo = mid } else { v = v << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { v = (v << 1) | 1; latLo = mid } else { v = v << 1; latHi = mid }
      }
      isLon = !isLon
      i += 1
    }
    v
  }

  def geohashOf(g: Geometry, precision: Int): String = {
    val e = g.envelope
    require(!e.isEmpty, "cannot compute geohash of empty geometry")
    geohash(e.midX, e.midY, precision)
  }

  // -------------------------------------------------------------- xyz tiles
  // Slippy-map / XYZ Web-Mercator tile scheme (the OSM wiki
  // "Slippy map tilenames" formulas; quadkey digits per the Bing Maps tile
  // system): x counts east from lon -180, y counts SOUTH from the
  // Mercator-clamped north limit. These are the partition keys of a map
  // tile pipeline — narrow per-row math, no shuffle of their own.

  /** Web-Mercator latitude clamp: atan(sinh(pi)) in degrees. */
  val TileLatMax = 85.05112878

  def tileX(lon: Double, z: Int): Int = {
    val n = 1L << z
    val x = math.floor((lon + 180.0) / 360.0 * n).toLong
    math.max(0L, math.min(n - 1, x)).toInt
  }

  def tileY(lat: Double, z: Int): Int = {
    val n = 1L << z
    val clamped = math.max(-TileLatMax, math.min(TileLatMax, lat))
    val latRad = math.toRadians(clamped)
    val y = math.floor(
      (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)
        / 2.0 * n).toLong
    math.max(0L, math.min(n - 1, y)).toInt
  }

  /** Tile bounds in EPSG:4326: (lonMin, latMin, lonMax, latMax). */
  def tileEnvelope(z: Int, x: Int, y: Int): (Double, Double, Double, Double) = {
    val n = (1L << z).toDouble
    val lonMin = x / n * 360.0 - 180.0
    val lonMax = (x + 1) / n * 360.0 - 180.0
    def latOf(yy: Double): Double =
      math.toDegrees(math.atan(math.sinh(math.Pi * (1.0 - 2.0 * yy / n))))
    (lonMin, latOf(y + 1.0), lonMax, latOf(y.toDouble))
  }

  /** Bing-style quadkey: one base-4 digit per zoom level, MSB first. */
  def quadkey(z: Int, x: Int, y: Int): String = {
    val sb = new java.lang.StringBuilder(z)
    var i = z
    while (i > 0) {
      var digit = 0
      val mask = 1 << (i - 1)
      if ((x & mask) != 0) digit += 1
      if ((y & mask) != 0) digit += 2
      sb.append(('0' + digit).toChar)
      i -= 1
    }
    sb.toString
  }

  // ------------------------------------------------------------- hex bins
  // Pointy-top hexagonal binning on axial coordinates (the classic
  // Red Blob Games hex-grid construction): fractional axial coords from
  // the inverse basis, then cube rounding (round all three cube coords,
  // re-derive the one with the largest rounding error so q+r+s == 0
  // stays exact). Rounding uses floor(v + 0.5) so a SQL oracle can
  // mirror it bit-for-bit (plain round() differs between engines at
  // negative halves). `size` is the hexagon circumradius in data units.

  /** Axial (q, r) of the hexagon containing (x, y). */
  def hexQR(x: Double, y: Double, size: Double): (Long, Long) = {
    require(size > 0, "hex size must be positive")
    val fq = (math.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    val fr = (2.0 / 3.0 * y) / size
    val fs = -fq - fr
    var rq = math.floor(fq + 0.5)
    var rr = math.floor(fr + 0.5)
    val rs = math.floor(fs + 0.5)
    val dq = math.abs(rq - fq); val dr = math.abs(rr - fr); val ds = math.abs(rs - fs)
    if (dq > dr && dq > ds) rq = -rr - rs
    else if (dr > ds) rr = -rq - rs
    (rq.toLong, rr.toLong)
  }

  /** Center (x, y) of axial hexagon (q, r). */
  def hexCenter(q: Long, r: Long, size: Double): (Double, Double) =
    (size * math.sqrt(3.0) * (q + r / 2.0), size * 1.5 * r)

  /** Tiles whose envelope intersects [minX,maxX]x[minY,maxY] at zoom z,
    * packed `(x << 32) | y` (both fit 32 bits through z=31). The tile
    * analog of the sized-grid cell cover: explode + equi-join on the
    * packed key co-locates geometry with its tiles in one shuffle.
    */
  def tileCover(minX: Double, minY: Double, maxX: Double, maxY: Double,
      z: Int): Array[Long] = {
    val x0 = tileX(minX, z); val x1 = tileX(maxX, z)
    // y grows southward: maxY gives the smallest y
    val y0 = tileY(maxY, z); val y1 = tileY(minY, z)
    // Long arithmetic + explicit cap: a world-extent envelope at z=16 is
    // 2^32 tiles — Int math would wrap (alloc 0, AIOOBE) and even a
    // correct allocation of billions of per-row tiles is a plan bug, not
    // a workload. Fail with the remedy instead of crashing obscurely.
    val count = (x1.toLong - x0 + 1) * (y1.toLong - y0 + 1)
    require(count <= (1L << 24),
      s"tileCover: envelope covers $count tiles at z=$z (cap 2^24) — " +
        "subdivide the geometry (st_subdivide) or lower the zoom")
    val out = new Array[Long](count.toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) {
        out(i) = (x.toLong << 32) | (y.toLong & 0xffffffffL)
        i += 1
        y += 1
      }
      x += 1
    }
    out
  }
}
