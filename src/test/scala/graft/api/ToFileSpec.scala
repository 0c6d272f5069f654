package graft.api

import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `toFile` suffix dispatch — the reference's single `to_file` entry
  * point: whatever `toFile(path)` writes, `readFile(path)` reads back.
  * One closed-form point set swept across the catalog formats and the
  * directory-of-parts formats.
  */
class ToFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("tofile_").resolve(name).toString

  private def pts(n: Int) = GeoDataFrame(
    (1 to n).map(i => (i.toLong, s"p_$i")).toDF("fid", "nm")
      .withColumn("geometry", st_point($"fid" * 2.0, $"fid" * 3.0)),
    "geometry").setCrs("EPSG:4326")

  private def xySum(g: GeoDataFrame): (Long, Double, Double) =
    g.df.select(count(lit(1)), sum(st_x($"geometry")), sum(st_y($"geometry")))
      .as[(Long, Double, Double)].head()

  test("toFile/readFile roundtrip across suffixes") {
    val n = 120
    val want = (n.toLong, (1 to n).map(_ * 2.0).sum, (1 to n).map(_ * 3.0).sum)
    for (sfx <- Seq(".gpkg", ".gdb", ".sqlite", ".fgb", ".shp", ".geojsonl",
        ".tab", ".mif", ".geojson", ".parquet", ".feather", ".kml", ".gml",
        ".dxf")) {
      val loc = tmp(s"out$sfx")
      pts(n).toFile(loc, layer = "pts")
      val back = GeoDataFrame.readFile(spark, loc,
        layer = if (sfx == ".gpkg" || sfx == ".gdb" || sfx == ".sqlite")
          Some("pts") else None)
      assert(xySum(back) == want, s"suffix $sfx")
    }
    // topojson quantizes coordinates — roundtrip within the grid
    val loc = tmp("out.topojson")
    pts(n).toFile(loc)
    val (cnt, sx, sy) = xySum(GeoDataFrame.readFile(spark, loc))
    assert(cnt == n && math.abs(sx - want._2) < 0.1 * n &&
      math.abs(sy - want._3) < 0.1 * n)
  }

  test("catalog formats carry the layer name") {
    val loc = tmp("named.gpkg")
    pts(10).toFile(loc, layer = "roads")
    assert(graft.io.GeoPackageIO.featureMeta(spark, loc).keySet == Set("roads"))
    val loc2 = tmp("named.sqlite")
    pts(10).toFile(loc2, layer = "roads")
    assert(graft.io.SpatiaLiteIO.geometryColumns(spark, loc2).keySet == Set("roads"))
  }

  test("writeLayers dispatches the catalog formats; rejects single-layer suffixes") {
    for (sfx <- Seq(".gpkg", ".sqlite", ".gdb")) {
      val loc = tmp(s"ml$sfx")
      GeoDataFrame.writeLayers(loc, Seq("a" -> pts(30), "b" -> pts(12)))
      val a = GeoDataFrame.readFile(spark, loc, layer = Some("a"))
      val b = GeoDataFrame.readFile(spark, loc, layer = Some("b"))
      assert(a.df.count() == 30 && b.df.count() == 12, s"suffix $sfx")
    }
    val e = intercept[IllegalArgumentException](
      GeoDataFrame.writeLayers(tmp("x.fgb"), Seq("a" -> pts(3))))
    assert(e.getMessage.contains("catalog"))
  }

  test("gdb writeLayers: per-layer CRS and geometry-column names honored") {
    val loc = tmp("mixed.gdb")
    val a = pts(20) // EPSG:4326, geometry column "geometry"
    val bdf = (1 to 8).map(i => (i.toLong, s"q_$i")).toDF("fid", "nm")
      .withColumn("shape", st_point($"fid" * 10.0, $"fid" * 20.0))
    val b = GeoDataFrame(bdf, "shape").setCrs("EPSG:3857")
    GeoDataFrame.writeLayers(loc, Seq("wgs" -> a, "merc" -> b))
    val backA = GeoDataFrame.readFile(spark, loc, layer = Some("wgs"))
    val backB = GeoDataFrame.readFile(spark, loc, layer = Some("merc"))
    assert(backA.crs.contains("EPSG:4326"))
    assert(backB.crs.contains("EPSG:3857"))
    assert(backA.df.count() == 20 && backB.df.count() == 8)
    val sx = backB.df.select(sum(st_x($"geometry"))).head().getDouble(0)
    assert(math.abs(sx - (1 to 8).map(_ * 10.0).sum) < 1e-6)
  }

  test("unknown suffix errors with the supported list") {
    val e = intercept[IllegalArgumentException](pts(3).toFile(tmp("x.xyz")))
    assert(e.getMessage.contains(".gpkg") && e.getMessage.contains(".sqlite"))
  }
}
