package graft.sql

import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-based datum shift (.gsb) — the public binary format national
  * agencies publish their high-accuracy transformation grids in (NADCON,
  * OSTN's NTv2 distribution, the French/Australian/Canadian grids; format
  * spec: Natural Resources Canada "NTv2 Developer's Guide"). The reference
  * reaches these through pyproj's grid pipeline (`expr.py:255-257` accepts
  * any CRS + pyproj resolves grids); no grid FILES ship in this sandbox,
  * so the engine exposes the mechanism: parse any .gsb payload, register
  * it under a name, and reference it from a proj record via `+nadgrids=`.
  *
  * Format notes implemented here:
  *  - 11 header records of 16 bytes (8-char name + 8-byte value; counts
  *    are int32 little- or big-endian, detected from NUM_OREC's value);
  *  - per-subgrid 11 records (S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC
  *    in arc-seconds, GS_COUNT nodes), then GS_COUNT nodes of 4 float32
  *    (lat shift, lon shift, accuracies) in arc-seconds;
  *  - longitudes are POSITIVE WEST (the classic NTv2 gotcha) — this class
  *    converts at the boundary so callers speak positive-east degrees;
  *  - nodes run row-major from S_LAT, within a row from E_LONG (least
  *    positive-west = easternmost) increasing west.
  *  - shifts are FORWARD (source datum -> target datum); the inverse is
  *    the standard fixed-point iteration on the forward grid.
  * Bilinear interpolation inside the cell, densest (last-defined
  * smallest-increment) subgrid containing the point wins.
  */
object Ntv2 {

  final case class SubGrid(
      sLat: Double, nLat: Double,
      // stored positive-west seconds; converted on query
      eLonW: Double, wLonW: Double,
      latInc: Double, lonInc: Double,
      nLatRows: Int, nLonCols: Int,
      latShift: Array[Float], lonShift: Array[Float]) {

    /** Bilinear shift at (lonDeg, latDeg), positive-east; None outside.
      * Queries within a quarter cell of the boundary clamp onto it — the
      * fixed-point INVERSE iterates through coordinates that overshoot
      * the edge by the shift's own magnitude, and a hard boundary would
      * fail exactly the points the grid was published for.
      */
    def shiftAt(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val latS = latDeg * 3600.0
      val lonW = -lonDeg * 3600.0 // positive-west seconds
      if (latS < sLat - latInc * 0.25 || latS > nLat + latInc * 0.25 ||
        lonW < eLonW - lonInc * 0.25 || lonW > wLonW + lonInc * 0.25) return None
      val fr = math.max(0.0, math.min((latS - sLat) / latInc, nLatRows - 1.000001))
      val fc = math.max(0.0, math.min((lonW - eLonW) / lonInc, nLonCols - 1.000001))
      val r0 = math.max(0, math.floor(fr).toInt)
      val c0 = math.max(0, math.floor(fc).toInt)
      val dr = fr - r0; val dc = fc - c0
      def node(r: Int, c: Int): Int = r * nLonCols + c
      def bilerp(a: Array[Float]): Double = {
        val v00 = a(node(r0, c0)); val v01 = a(node(r0, c0 + 1))
        val v10 = a(node(r0 + 1, c0)); val v11 = a(node(r0 + 1, c0 + 1))
        (v00 * (1 - dr) * (1 - dc) + v01 * (1 - dr) * dc +
          v10 * dr * (1 - dc) + v11 * dr * dc)
      }
      // lat shift seconds positive north; lon shift seconds positive WEST
      Some((-bilerp(lonShift) / 3600.0, bilerp(latShift) / 3600.0))
    }

    def contains(lonDeg: Double, latDeg: Double): Boolean =
      shiftAt(lonDeg, latDeg).isDefined
  }

  final class Grid(val subGrids: Seq[SubGrid]) {
    /** Forward shift: source-datum lon/lat -> target-datum lon/lat.
      * None when no subgrid covers the point (callers decide whether
      * that is an error or an identity pass-through).
      */
    def forward(lon: Double, lat: Double): Option[(Double, Double)] = {
      // densest covering subgrid wins (child grids refine parents)
      val covering = subGrids.filter(_.contains(lon, lat))
      if (covering.isEmpty) None
      else {
        val g = covering.minBy(g => g.latInc * g.lonInc)
        g.shiftAt(lon, lat).map { case (dl, dp) => (lon + dl, lat + dp) }
      }
    }

    /** Inverse shift by fixed-point iteration on the forward grid (the
      * standard NTv2 inverse; converges in 2-4 rounds at grid accuracy).
      */
    def inverse(lon: Double, lat: Double): Option[(Double, Double)] = {
      var cl = lon; var cp = lat
      var i = 0
      var ok = true
      while (i < 6 && ok) {
        forward(cl, cp) match {
          case Some((fl, fp)) => cl -= fl - lon; cp -= fp - lat
          case None           => ok = false
        }
        i += 1
      }
      if (ok) Some((cl, cp)) else None
    }
  }

  /** Parse a .gsb payload. Endianness is detected from NUM_OREC (always
    * 11 in valid files).
    */
  def parse(bytes: Array[Byte]): Grid = {
    require(bytes.length >= 11 * 16, "ntv2: truncated header")
    def intAt(buf: ByteBuffer, off: Int): Int = buf.getInt(off)
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val buf = if (intAt(le, 8) == 11) le
    else if (intAt(be, 8) == 11) be
    else throw new IllegalArgumentException("ntv2: NUM_OREC != 11 (not a .gsb?)")
    def name(off: Int): String =
      new String(bytes, off, 8, "US-ASCII").trim
    require(name(0) == "NUM_OREC", s"ntv2: bad first record '${name(0)}'")
    var off = 0
    def readHeader(n: Int): Map[String, (String, Long, Double)] = {
      val m = Map.newBuilder[String, (String, Long, Double)]
      var i = 0
      while (i < n) {
        val key = name(off)
        val sval = new String(bytes, off + 8, 8, "US-ASCII").trim
        val ival = buf.getInt(off + 8).toLong
        val dval = buf.getDouble(off + 8)
        m += key -> ((sval, ival, dval))
        off += 16
        i += 1
      }
      m.result()
    }
    val fileHdr = readHeader(11)
    val numFiles = fileHdr("NUM_FILE")._2.toInt
    require(numFiles >= 1 && numFiles < 10000, s"ntv2: NUM_FILE $numFiles")
    require(fileHdr.get("GS_TYPE").forall(_._1.startsWith("SECONDS")),
      "ntv2: only GS_TYPE SECONDS supported")
    val subs = (0 until numFiles).map { _ =>
      val h = readHeader(11)
      val sLat = h("S_LAT")._3; val nLat = h("N_LAT")._3
      val eLon = h("E_LONG")._3; val wLon = h("W_LONG")._3
      val latInc = h("LAT_INC")._3; val lonInc = h("LONG_INC")._3
      val count = h("GS_COUNT")._2.toInt
      val rows = math.round((nLat - sLat) / latInc).toInt + 1
      val cols = math.round((wLon - eLon) / lonInc).toInt + 1
      require(rows * cols == count,
        s"ntv2: GS_COUNT $count != $rows x $cols")
      val latShift = new Array[Float](count)
      val lonShift = new Array[Float](count)
      var i = 0
      while (i < count) {
        latShift(i) = buf.getFloat(off)
        lonShift(i) = buf.getFloat(off + 4)
        off += 16 // 4 floats per node (two shifts + two accuracies)
        i += 1
      }
      SubGrid(sLat, nLat, eLon, wLon, latInc, lonInc, rows, cols,
        latShift, lonShift)
    }
    new Grid(subs)
  }

  // named registry so proj records can reference grids (+nadgrids=name);
  // grids register once on the driver and ride to executors inside the
  // parsed-projection closure
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Grid]()
  def register(gridName: String, bytes: Array[Byte]): Unit =
    registry.put(gridName, parse(bytes))
  def get(gridName: String): Option[Grid] = Option(registry.get(gridName))

  // Runtime grid directory (conf `spark.graft.crs.ntv2Dir`): the hook that
  // turns the parser + GridShifted mechanism into an end-to-end national-
  // grid path for user-supplied files (OSTN15_NTv2_OSGBtoETRS.gsb,
  // NTv2_0.gsb, ...). `functions.install` sets the driver-side value and
  // eagerly registers every `.gsb` in the directory (fail-fast on a
  // corrupt file at session setup, not mid-job); executors — fresh JVMs
  // with an empty registry — fall back to the task-propagated SQLConf and
  // lazy-load on first reference, which is why the directory must be
  // node-visible (shared filesystem or --files distribution).
  @volatile private var gridDir: Option[String] = None
  def setGridDir(dir: Option[String]): Unit = gridDir = dir
  private def configuredDir: Option[String] =
    gridDir.orElse(try {
      val d = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.crs.ntv2Dir", "")
      if (d.isEmpty) None else Some(d)
    } catch { case _: Throwable => None })

  /** Registry hit, else lazy-load `<ntv2Dir>/<name>[.gsb]` from the
    * configured grid directory and cache it. The `+nadgrids=` resolution
    * path (`Crs.parseProj`) calls this, so a proj record can reference a
    * national grid file that was never explicitly `register`ed.
    */
  def resolve(gridName: String): Option[Grid] = {
    val hit = registry.get(gridName)
    if (hit != null) Some(hit)
    else configuredDir.flatMap { dir =>
      Seq(s"$dir/$gridName.gsb", s"$dir/$gridName")
        .map(java.nio.file.Paths.get(_))
        .find(java.nio.file.Files.isRegularFile(_))
        .map { p =>
          val g = parse(java.nio.file.Files.readAllBytes(p))
          registry.putIfAbsent(gridName, g)
          registry.get(gridName)
        }
    }
  }

  /** Eagerly register every `.gsb` under `dir` (name = file name sans
    * extension). Driver-side fail-fast: a corrupt grid file surfaces at
    * session setup with its path, not as a per-row task failure — and so
    * does a MISSING or non-local directory: a configured-but-unreadable
    * grid dir silently degrading every transform to the approximate
    * Helmert fallback is exactly the quiet meter-level error this hook
    * exists to prevent. The path must be node-local (distribute grids
    * with `--files` or bake them into the image); remote URIs error with
    * that guidance.
    */
  def registerDir(dir: String): Seq[String] = {
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*") || dir.startsWith("file:"),
      s"ntv2: grid dir must be a node-local path (got '$dir') — NTv2 grids " +
        "are read with java.nio on each node; ship them via --files or the image")
    // `file:` URIs come in single-slash (file:/path) and triple-slash
    // (file:///path) forms; strip the scheme TEXTUALLY — java.net.URI
    // rejects unescaped spaces and returns null paths for opaque forms,
    // both of which a directory path may legitimately contain.
    val local =
      if (dir.startsWith("file:"))
        dir.stripPrefix("file:").replaceFirst("^//+", "/")
      else dir
    val d = java.nio.file.Paths.get(local)
    require(java.nio.file.Files.isDirectory(d),
      s"ntv2: configured grid dir '$dir' is not a readable directory on this node")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.toLowerCase.endsWith(".gsb"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".gsb").stripSuffix(".GSB")
        try register(name, java.nio.file.Files.readAllBytes(p))
        catch { case e: Exception => throw new IllegalArgumentException(
          s"ntv2: failed to parse grid file $p: ${e.getMessage}", e) }
        name
      }.toSeq
  }
}
