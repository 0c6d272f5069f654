package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary MapInfo TAB quad (.tab/.dat/.map/.id): roundtrip across every
  * geometry class + NONE rows + attribute types, value cross-check against
  * the MIF/MID text twin of the same frame, the exact 1e6-transform
  * contract, and the read_file dispatcher route. (No OGR in this sandbox,
  * so real-MapInfo fixtures can't be generated — the .tab/.dat/.id layouts
  * follow the published format; see TabIO's validation caveat.)
  */
class TabIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("tabio").toString + "/out"

  private def sample() = {
    val wkts = Seq(
      (1L, "alpha", 2.5, true, "POINT (10.25 20.5)"),
      (2L, "beta", -1.0, false, "LINESTRING (0 0, 5.5 0, 5.5 9.25)"),
      (3L, "gamma, quoted", 0.0, true,
        "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (4L, "delta", 123.456789, false,
        "MULTIPOLYGON (((20 20, 26 20, 26 26, 20 26, 20 20)), ((40 0, 44 0, 44 4, 40 0)))"),
      (5L, "eps", 7.0, true, "MULTILINESTRING ((0 30, 3 33), (5 35, 9 39, 9 30))"),
      (6L, "zeta", -3.25, false, "MULTIPOINT ((1 1), (2 3), (4 5))"),
      (7L, "none-row", 9.5, true, null))
    val df = wkts.toDF("id", "name", "w", "flag", "wkt")
      .withColumn("geometry",
        when($"wkt".isNotNull, st_geomFromWKT($"wkt")).otherwise(lit(null)))
      .drop("wkt")
    GeoDataFrame(df).setCrs("EPSG:4326")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select($"id", $"name", $"w", $"flag",
      when($"geometry".isNull, "NONE").otherwise(st_asText(st_normalize($"geometry"))).as("g"))
    .as[(Long, String, Double, Boolean, String)].collect().sortBy(_._1).toSeq

  test("roundtrip: all geometry classes, NONE rows, attribute types, crs") {
    val src = sample()
    val dir = tmpDir()
    TabIO.write(src, dir)
    // the quad exists per partition
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.exists(_.endsWith(".tab")) && files.exists(_.endsWith(".dat")) &&
      files.exists(_.endsWith(".map")) && files.exists(_.endsWith(".id")), files.mkString(","))
    val back = TabIO.read(spark, dir)
    assert(back.crs.contains("EPSG:4326"))
    assert(canon(back.df) == canon(src.df))
  }

  test("values cross-check the MIF/MID text twin of the same frame") {
    val src = sample()
    val tabDir = tmpDir(); val mifDir = tmpDir()
    TabIO.write(src, tabDir)
    MapInfoIO.write(src, mifDir)
    val viaTab = canon(TabIO.read(spark, tabDir).df)
    val viaMif = canon(MapInfoIO.read(spark, mifDir).df)
    assert(viaTab == viaMif)
  }

  test("1e6 integer transform: returns the nearest double to the 6-decimal value") {
    val pts = (0 until 50).map { i =>
      (i.toLong, i * 0.000001 + 10.123456, 20.0 - i * 0.25)
    }
    val src = GeoDataFrame(pts.toDF("id", "x", "y")
      .withColumn("geometry", st_point($"x", $"y")).select($"id", $"geometry"))
    val dir = tmpDir()
    TabIO.write(src, dir)
    val back = TabIO.read(spark, dir).df
      .select($"id", st_x($"geometry").as("x"), st_y($"geometry").as("y"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    pts.zip(back).foreach { case ((_, x, y), (_, bx, by)) =>
      // the quad stores round(v*1e6) ints: the read-back value is the
      // nearest double to that 6-decimal decimal (== the computed input
      // up to the 1-ulp drift of accumulated double sums)
      assert(bx == math.rint(x * 1e6) / 1e6 && by == math.rint(y * 1e6) / 1e6,
        s"($x,$y) -> ($bx,$by)")
      assert(math.abs(bx - x) <= 5e-7 && math.abs(by - y) <= 5e-7)
    }
  }

  test("read_file dispatcher routes .tab files and directories") {
    val src = sample()
    val dir = tmpDir()
    TabIO.write(src, dir)
    // directory of .tab
    assert(canon(GeoDataFrame.readFile(spark, dir).df) == canon(src.df))
    // single .tab file
    val one = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tab")).sorted.head
    val got = GeoDataFrame.readFile(spark, s"$dir/$one").df
    assert(got.count() >= 1)
  }

  test(".dat record size is validated against the .tab Fields") {
    val src = sample()
    val dir = tmpDir()
    TabIO.write(src, dir)
    val tab = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tab")).head
    // corrupt the declared Char width -> loud mismatch, not silent garbage
    // (drop the Hadoop .crc sidecar so the edit isn't masked by a
    // checksum error before the validation runs)
    val txt = new String(java.nio.file.Files.readAllBytes(tab.toPath), "UTF-8")
      .replace("Char (64)", "Char (63)")
    java.nio.file.Files.write(tab.toPath, txt.getBytes("UTF-8"))
    val crc = new java.io.File(tab.getParentFile, "." + tab.getName + ".crc")
    if (crc.exists()) crc.delete()
    val ex = intercept[Exception] { TabIO.read(spark, dir).df.count() }
    assert(ex.getMessage != null && (ex.getMessage.contains("record size") ||
      Option(ex.getCause).exists(_.getMessage.contains("record size"))),
      s"expected the record-size validation, got: ${ex.getMessage}")
  }

  test("multi-partition write keeps all rows, one quad per partition") {
    val n = 200
    val src = GeoDataFrame(spark.range(n).toDF("id")
      .withColumn("geometry", st_point($"id".cast("double"),
        ($"id" % 17).cast("double")))
      .repartition(4).select($"id", $"geometry"))
    val dir = tmpDir()
    TabIO.write(src, dir)
    val tabs = new java.io.File(dir).listFiles().count(_.getName.endsWith(".tab"))
    assert(tabs == 4, s"expected 4 quads, got $tabs")
    val back = TabIO.read(spark, dir).df
    assert(back.count() == n)
    assert(back.select(sum($"id")).head.getLong(0) == (0L until n).sum)
  }
}
