package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GpxIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("waypoint roundtrip: coords, name, desc, ele; crs attached") {
    val dir = java.nio.file.Files.createTempDirectory("gpx_wpt").toString
    val pts = GeoDataFrame(Seq(
      (1L, "alpha", "first", 120.5, 7.44, 46.95),
      (2L, "beta", null.asInstanceOf[String], 88.0, -0.13, 51.5),
      (3L, "gam<ma>&", "xml&escaping<ok>", 0.25, 151.2, -33.87))
      .toDF("id", "name", "desc", "ele", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
      .select("name", "desc", "ele", "geometry"))
    GpxIO.write(pts, dir)
    val back = GpxIO.read(spark, dir)
    assert(back.crs.contains("EPSG:4326"))
    val got = back.df
      .select($"layer", $"name", $"desc", $"ele",
        st_x($"geometry").as("lon"), st_y($"geometry").as("lat"))
      .as[(String, String, Option[String], Double, Double, Double)]
      .collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("waypoints", "alpha", Some("first"), 120.5, 7.44, 46.95),
      ("waypoints", "beta", None, 88.0, -0.13, 51.5),
      ("waypoints", "gam<ma>&", Some("xml&escaping<ok>"), 0.25, 151.2, -33.87)))
  }

  test("route and track roundtrip; readFile dispatch; polygon rejected") {
    val dir = java.nio.file.Files.createTempDirectory("gpx_rte").toString
    val geoms = GeoDataFrame(Seq(
      ("r1", "LINESTRING (0 0, 1 1, 2 0.5)"),
      ("t1", "MULTILINESTRING ((0 0, 1 0), (2 0, 3 1, 4 0))"))
      .toDF("name", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt"))
    GpxIO.write(geoms, dir)
    val back = GeoDataFrame.readFile(spark, dir)
    val got = back.df.select($"layer", $"name", st_asText($"geometry"))
      .as[(String, String, String)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("routes", "r1", "LINESTRING (0 0, 1 1, 2 0.5)"),
      ("tracks", "t1", "MULTILINESTRING ((0 0, 1 0), (2 0, 3 1, 4 0))")))
    val poly = GeoDataFrame(Seq(("p", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("name", "wkt").withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt"))
    val err = intercept[org.apache.spark.SparkException] {
      GpxIO.write(poly, java.nio.file.Files.createTempDirectory("gpx_bad").toString)
    }
    assert(err.getMessage.contains("no polygon model") ||
      Option(err.getCause).exists(_.getMessage.contains("no polygon model")))
  }
}
