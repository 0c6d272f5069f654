package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArrowInterchangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample(): GeoDataFrame = {
    val df = Seq(
      (1L, "a", 1.5, "POINT (1 2)"),
      (2L, "b", -0.5, "POINT (3 4)"),
      (3L, null.asInstanceOf[String], 2.25, "POINT (-5 10)"))
      .toDF("id", "name", "score", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")
    GeoDataFrame(df).setCrs("EPSG:4326")
  }

  test("WKB roundtrip preserves rows, schema, crs, geometry column") {
    val gdf = sample()
    val bytes = GeoArrowInterchange.toArrowBytes(gdf)
    assert(bytes.length > 0)
    val back = GeoArrowInterchange.fromArrowBytes(spark, bytes)
    assert(back.geometryColumn == "geometry")
    assert(back.crs.contains("EPSG:4326"))
    val got = back.df.select($"id", $"name", $"score",
        st_asText($"geometry").as("wkt"))
      .as[(Long, Option[String], Double, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("a"), 1.5, "POINT (1 2)"),
      (2L, Some("b"), -0.5, "POINT (3 4)"),
      (3L, None, 2.25, "POINT (-5 10)")))
  }

  test("geoarrow encoding roundtrip: points and polygons") {
    val pts = sample()
    val b1 = GeoArrowInterchange.toArrowBytes(pts, encoding = "geoarrow")
    val back1 = GeoArrowInterchange.fromArrowBytes(spark, b1)
    assert(back1.df.select(st_asText($"geometry")).as[String].collect().toSet ==
      Set("POINT (1 2)", "POINT (3 4)", "POINT (-5 10)"))
    val polys = GeoDataFrame(Seq(
      (1L, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
      (2L, "POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10), (11 11, 12 11, 12 12, 11 12, 11 11))"))
      .toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")).setCrs("EPSG:3857")
    val b2 = GeoArrowInterchange.toArrowBytes(polys, encoding = "geoarrow")
    val back2 = GeoArrowInterchange.fromArrowBytes(spark, b2)
    assert(back2.crs.contains("EPSG:3857"))
    val areas = back2.df.select($"id", st_area($"geometry")).as[(Long, Double)]
      .collect().toMap
    assert(areas(1L) == 16.0 && areas(2L) == 15.0) // hole survives
  }

  test("plain Arrow stream without geo metadata imports as a wrapped DataFrame") {
    // strip the geo metadata by rebuilding the stream from a plain df
    val plain = GeoDataFrame(Seq((1L, 2.0)).toDF("id", "v").withColumn(
      "geometry", st_point($"v", $"v")))
    val bytes = GeoArrowInterchange.toArrowBytes(plain)
    val back = GeoArrowInterchange.fromArrowBytes(spark, bytes)
    assert(back.df.count() == 1)
  }
}
