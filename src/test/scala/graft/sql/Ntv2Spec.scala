package graft.sql

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** NTv2 grid-shift: no national .gsb files ship in this sandbox, so the
  * spec SYNTHESIZES a spec-conformant .gsb payload (little-endian, one
  * subgrid, positive-west longitudes, 4-float32 nodes) and verifies the
  * parser, bilinear interpolation, the positive-west sign convention, the
  * fixed-point inverse, outside-coverage pass-through, and the
  * `+nadgrids=` end-to-end path through the proj-record parser.
  */
class Ntv2Spec extends AnyFunSuite {

  /** One-subgrid .gsb: lat 50..54N, lon 2W..2E. Lat shift grows linearly
    * north (3.6" at the south edge, +0.36"/row); lon shift constant
    * -7.2" positive-west = +7.2" (0.002 deg) EAST.
    */
  private def synthGsb(): Array[Byte] = {
    val latInc = 1800.0 // 0.5 deg in seconds
    val lonInc = 1800.0
    val sLat = 50 * 3600.0; val nLat = 54 * 3600.0
    val eLonW = -2 * 3600.0; val wLonW = 2 * 3600.0
    val rows = ((nLat - sLat) / latInc).toInt + 1
    val cols = ((wLonW - eLonW) / lonInc).toInt + 1
    val count = rows * cols
    val buf = ByteBuffer.allocate(16 * 22 + 16 * count)
      .order(ByteOrder.LITTLE_ENDIAN)
    def rec(name: String)(fill: ByteBuffer => Unit): Unit = {
      buf.put(String.format("%-8s", name).getBytes("US-ASCII"))
      val before = buf.position()
      fill(buf)
      // pad the value field to 8 bytes
      while (buf.position() < before + 8) buf.put(0.toByte)
    }
    rec("NUM_OREC")(_.putInt(11))
    rec("NUM_SREC")(_.putInt(11))
    rec("NUM_FILE")(_.putInt(1))
    rec("GS_TYPE")(_.put("SECONDS ".getBytes("US-ASCII")))
    rec("VERSION")(_.put("NTv2.0  ".getBytes("US-ASCII")))
    rec("SYSTEM_F")(_.put("TESTSRC ".getBytes("US-ASCII")))
    rec("SYSTEM_T")(_.put("WGS84   ".getBytes("US-ASCII")))
    rec("MAJOR_F")(_.putDouble(6378137.0))
    rec("MINOR_F")(_.putDouble(6356752.314))
    rec("MAJOR_T")(_.putDouble(6378137.0))
    rec("MINOR_T")(_.putDouble(6356752.314))
    rec("SUB_NAME")(_.put("TESTGRID".getBytes("US-ASCII")))
    rec("PARENT")(_.put("NONE    ".getBytes("US-ASCII")))
    rec("CREATED")(_.put("20260813".getBytes("US-ASCII")))
    rec("UPDATED")(_.put("20260813".getBytes("US-ASCII")))
    rec("S_LAT")(_.putDouble(sLat))
    rec("N_LAT")(_.putDouble(nLat))
    rec("E_LONG")(_.putDouble(eLonW))
    rec("W_LONG")(_.putDouble(wLonW))
    rec("LAT_INC")(_.putDouble(latInc))
    rec("LONG_INC")(_.putDouble(lonInc))
    rec("GS_COUNT")(_.putInt(count))
    for (r <- 0 until rows; _ <- 0 until cols) {
      buf.putFloat((3.6 + 0.36 * r).toFloat) // lat shift seconds
      buf.putFloat(-7.2f)                    // lon shift seconds (pos WEST)
      buf.putFloat(0.01f)
      buf.putFloat(0.01f)
    }
    buf.array()
  }

  test("parse + bilinear + signs + inverse + coverage") {
    val grid = Ntv2.parse(synthGsb())
    assert(grid.subGrids.size == 1)
    // at the south edge (lat 50): lat shift 3.6" = 0.001 deg; lon shift
    // -7.2" positive-west = +0.002 deg east
    val (lo1, la1) = grid.forward(0.0, 50.0).get
    assert(math.abs(lo1 - 0.002) < 1e-9, s"lon $lo1")
    assert(math.abs(la1 - 50.001) < 1e-9, s"lat $la1")
    // bilinear between rows: lat 50.25 sits halfway between row 0 (3.6")
    // and row 1 (3.96") -> 3.78" = 0.00105 deg
    val (_, la2) = grid.forward(1.0, 50.25).get
    assert(math.abs(la2 - (50.25 + 3.78 / 3600.0)) < 1e-9, s"lat $la2")
    // inverse recovers the source coordinates at grid accuracy
    val (bl, bp) = grid.inverse(lo1, la1).get
    assert(math.abs(bl) < 1e-9 && math.abs(bp - 50.0) < 1e-9)
    // outside coverage: None
    assert(grid.forward(10.0, 50.0).isEmpty)
    assert(grid.forward(0.0, 40.0).isEmpty)
  }

  test("+nadgrids end-to-end through the proj-record parser") {
    import graft.sql.Crs
    Ntv2.register("test_shift", synthGsb())
    val rec = Crs.parseProj(
      "+proj=tmerc +lat_0=49 +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 " +
        "+nadgrids=test_shift").get
    val plain = Crs.parseProj(
      "+proj=tmerc +lat_0=49 +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84").get
    // forward: WGS84 input is grid-INVERSE-shifted to the native datum
    // first, so the result differs from the unshifted projection by the
    // grid shift (~0.002 deg lon = ~140 m at lat 52)
    val (gx, gy) = rec.forward(1.0, 52.0)
    val (px, py) = plain.forward(1.0, 52.0)
    val gap = math.hypot(gx - px, gy - py)
    assert(gap > 120.0 && gap < 400.0, s"grid shift gap $gap m")
    // roundtrip through the grid datum is exact at grid accuracy
    val (lo, la) = rec.inverse(gx, gy)
    assert(math.abs(lo - 1.0) < 1e-8 && math.abs(la - 52.0) < 1e-8)
    // outside the grid coverage the datum passes through as identity
    val (ox, oy) = rec.forward(10.0, 52.0)
    val (qx, qy) = plain.forward(10.0, 52.0)
    assert(ox == qx && oy == qy)
    // unregistered grid name -> unsupported record, not mis-parsed
    assert(Crs.parseProj("+proj=tmerc +ellps=WGS84 +nadgrids=nope").isEmpty)
  }

  test("registerDir accepts single-slash and double-slash file: URIs") {
    val dir = java.nio.file.Files.createTempDirectory("ntv2uri")
    java.nio.file.Files.write(dir.resolve("uritest.gsb"), synthGsb())
    // single-slash form (java.net.URI canonical): file:/tmp/...
    assert(Ntv2.registerDir("file:" + dir.toAbsolutePath) == Seq("uritest"))
    // double-slash empty-authority form: file:///tmp/...
    assert(Ntv2.registerDir("file://" + dir.toAbsolutePath) == Seq("uritest"))
    // paths with spaces must survive (java.net.URI would reject them)
    val spaced = java.nio.file.Files.createTempDirectory("ntv2 uri sp")
    java.nio.file.Files.write(spaced.resolve("sptest.gsb"), synthGsb())
    assert(Ntv2.registerDir("file:" + spaced.toAbsolutePath) == Seq("sptest"))
    // remote URIs still refuse loudly
    val e = intercept[IllegalArgumentException](Ntv2.registerDir("s3://bucket/grids"))
    assert(e.getMessage.contains("node-local"))
  }

  test("runtime grid hook: spark.graft.crs.ntv2Dir loads user .gsb files end-to-end") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ntv2hook")
    java.nio.file.Files.write(dir.resolve("ostest.gsb"), synthGsb())
    spark.conf.set("spark.graft.crs.ntv2Dir", dir.toAbsolutePath.toString)
    try {
      // install re-run triggers the eager registerDir path (the conf block
      // sits before install's functions-exist early return)
      graft.sql.functions.install(spark)
      // the grid name = file name sans .gsb, referenced with NO explicit
      // Ntv2.register call — the OSTN15 usage documented in the README
      val rec = "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
        "+x_0=400000 +y_0=-100000 +ellps=WGS84 +nadgrids=ostest"
      assert(Crs.projFor(rec).isDefined)
      // executor path: st_transform over a DataFrame applies the grid
      // (lat 52, lon 0 is inside the synthesized coverage; the shift is
      // ~0.002 deg lon, so the grid route differs from the plain record
      // by >100 m)
      val plain = rec.replace(" +nadgrids=ostest", "")
      val df = spark.range(1).select(st_point(lit(0.0), lit(52.0)).as("g"))
      val Array(gx, gy) = df.select(
          st_x(st_transform(col("g"), lit("EPSG:4326"), lit(rec))),
          st_y(st_transform(col("g"), lit("EPSG:4326"), lit(rec))))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val Array(px, py) = df.select(
          st_x(st_transform(col("g"), lit("EPSG:4326"), lit(plain))),
          st_y(st_transform(col("g"), lit("EPSG:4326"), lit(plain))))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val gap = math.hypot(gx - px, gy - py)
      assert(gap > 100.0 && gap < 500.0, s"grid-vs-plain gap $gap m")
    } finally {
      spark.conf.unset("spark.graft.crs.ntv2Dir")
      Ntv2.setGridDir(None)
    }
  }
}
