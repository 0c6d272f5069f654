package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MapInfoIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all-geometry-type roundtrip with typed attributes; crs attached") {
    val dir = java.nio.file.Files.createTempDirectory("mif_rt").toString
    val src = GeoDataFrame(Seq(
      (1L, "point, with \"quotes\"", 1.5, true, "POINT (3.25 -7.5)"),
      (2L, "line", -2.25, false, "LINESTRING (0 0, 1 1, 2 0.5)"),
      (3L, "mline", 0.0, true, "MULTILINESTRING ((0 0, 1 0), (2 0, 3 1, 4 0))"),
      (4L, "poly", 9.75, false,
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
      (5L, "mpoly", 1.0, true,
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"),
      (6L, "mpoint", 2.5, false, "MULTIPOINT ((1 2), (3 4))"),
      (7L, null.asInstanceOf[String], 0.5, true, null.asInstanceOf[String]))
      .toDF("id", "name", "score", "flag", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")).setCrs("EPSG:4326")
    MapInfoIO.write(src, dir)
    val back = GeoDataFrame.readFile(spark, dir)
    assert(back.crs.contains("EPSG:4326"))
    val got = back.df
      .select($"id", $"name", $"score", $"flag", st_asText($"geometry").as("wkt"))
      .as[(Long, Option[String], Double, Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, Some("point, with \"quotes\""), 1.5, true, Some("POINT (3.25 -7.5)"))))
    assert(got(1)._5.contains("LINESTRING (0 0, 1 1, 2 0.5)"))
    assert(got(2)._5.contains("MULTILINESTRING ((0 0, 1 0), (2 0, 3 1, 4 0))"))
    assert(got(3)._5.contains(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"))
    assert(got(4)._5.contains(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"))
    assert(got(5)._5.contains("MULTIPOINT ((1 2), (3 4))"))
    assert(got(6) == ((7L, None, 0.5, true, None))) // NONE geometry + null attr
  }

  test("hand-written MIF: style clauses skipped, RECT, LINE, tab delimiter default") {
    val dir = java.nio.file.Files.createTempDirectory("mif_hand")
    val mif = dir.resolve("data.mif")
    val mid = dir.resolve("data.mid")
    // header without DELIMITER line → tab-delimited MID by spec; style
    // clauses (Pen/Brush/Symbol/Smooth/Center) interleaved with geometry
    java.nio.file.Files.write(mif,
      """Version 300
        |Charset "Neutral"
        |Columns 2
        |  label Char(32)
        |  n Integer
        |Data
        |
        |Point 5 6
        |  Symbol (34,0,12)
        |Line 0 0 10 10
        |  Pen (1,2,0)
        |Rect 1 1 4 3
        |  Brush (2,16777215,16777215)
        |  Pen (1,2,0)
        |Region 1
        |  4
        |0 0
        |8 0
        |8 8
        |0 8
        |  Pen (1,2,0)
        |  Center 4 4
        |""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(mid,
      "\"pt\"\t1\n\"ln\"\t2\n\"rect\"\t3\n\"open ring\"\t4\n".getBytes("UTF-8"))
    val back = MapInfoIO.read(spark, mif.toString)
    val got = back.df.select($"label", $"n", st_asText($"geometry").as("wkt"))
      .as[(String, Long, String)].collect().sortBy(_._2).toSeq
    assert(got(0) == (("pt", 1L, "POINT (5 6)")))
    assert(got(1) == (("ln", 2L, "LINESTRING (0 0, 10 10)")))
    assert(got(2) == (("rect", 3L, "POLYGON ((1 1, 4 1, 4 3, 1 3, 1 1))")))
    // unclosed REGION ring is closed on read
    assert(got(3) == (("open ring", 4L, "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))")))
  }

  test("region ring classification: nested holes and islands by containment parity") {
    val dir = java.nio.file.Files.createTempDirectory("mif_nest")
    val mif = dir.resolve("n.mif")
    // one REGION with outer (0..20), hole (5..15), island-in-hole (8..12):
    // parity 0/1/2 → polygon-with-hole + island polygon = MultiPolygon
    java.nio.file.Files.write(mif,
      """Version 300
        |Delimiter ","
        |Columns 0
        |Data
        |Region 3
        |5
        |0 0
        |20 0
        |20 20
        |0 20
        |0 0
        |5
        |5 5
        |15 5
        |15 15
        |5 15
        |5 5
        |5
        |8 8
        |12 8
        |12 12
        |8 12
        |8 8
        |""".stripMargin.getBytes("UTF-8"))
    val back = MapInfoIO.read(spark, mif.toString)
    val wkt = back.df.select(st_asText($"geometry")).as[String].collect().head
    assert(wkt.startsWith("MULTIPOLYGON"))
    val area = back.df.select(st_area($"geometry")).as[Double].collect().head
    assert(math.abs(area - (400.0 - 100.0 + 16.0)) < 1e-9)
  }
}
