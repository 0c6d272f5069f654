package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoArrowParquetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wkts = Map(
    "point" -> Seq("POINT (1 2)", "POINT (-3.5 7.25)"),
    "linestring" -> Seq("LINESTRING (0 0, 1 1, 2 0.5)", "LINESTRING (5 5, 6 7)"),
    "polygon" -> Seq(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",
      "POLYGON ((10 10, 12 10, 11 12, 10 10))"),
    "multipoint" -> Seq("MULTIPOINT ((1 2), (3 4))", "MULTIPOINT ((0 0))"),
    "multilinestring" -> Seq(
      "MULTILINESTRING ((0 0, 1 0), (2 0, 3 1, 4 0))", "MULTILINESTRING ((9 9, 8 8))"),
    "multipolygon" -> Seq(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))",
      "MULTIPOLYGON (((20 20, 21 20, 21 21, 20 20)))"))

  test("native-encoded roundtrip for all six kinds; footer declares the kind") {
    wkts.foreach { case (kind, ws) =>
      val dir = java.nio.file.Files.createTempDirectory(s"ga_$kind").toString
      val src = GeoDataFrame(ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "wkt")
        .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt"))
        .setCrs("EPSG:4326")
      GeoParquetIO.write(src, dir, geometryEncoding = "geoarrow")
      // on-disk column is nested, not binary
      val rawType = spark.read.parquet(dir).schema("geometry").dataType
      assert(rawType != org.apache.spark.sql.types.BinaryType,
        s"$kind still wrote WKB binary")
      val meta = GeoParquetIO.readMeta(spark, dir).get
      assert(meta.encoding == kind, s"footer encoding ${meta.encoding} != $kind")
      val back = GeoParquetIO.read(spark, dir)
      assert(back.crs.contains("EPSG:4326"))
      val got = back.df.select($"id", st_asText($"geometry"))
        .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
      assert(got == ws, s"$kind roundtrip mismatch: $got")
    }
  }

  test("multiple geometry columns: each keeps its own footer CRS through the roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("multi_geom").toString
    val src = GeoDataFrame(Seq((1L, 4.9, 52.37), (2L, 2.35, 48.86))
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
      .withColumn("geometry2", st_transform(
        st_point($"lon", $"lat"), lit("EPSG:4326"), lit("EPSG:3857"))))
      .setCrs("EPSG:4326")
      .setCrsFor("geometry2", "EPSG:3857")
    GeoParquetIO.write(src, dir, extraGeometry = Seq("geometry2"))
    val meta = GeoParquetIO.readMeta(spark, dir).get
    assert(meta.extraColumns == Seq(("geometry2", Some("EPSG:3857"))))
    val back = GeoParquetIO.read(spark, dir)
    assert(back.crs.contains("EPSG:4326"))
    assert(back.crsFor("geometry2").contains("EPSG:3857"))
    // switching the active geometry reads that column's CRS (geopandas
    // GeoSeries.crs per column)
    assert(back.setGeometry("geometry2").crs.contains("EPSG:3857"))
    val xs = back.setGeometry("geometry2").df
      .select(st_x($"geometry2")).as[Double].collect().sorted
    // 2.35E in web mercator: R · radians(2.35)
    assert(math.abs(xs(0) - 6378137.0 * math.toRadians(2.35)) < 1e-6)
  }

  test("explicit kind, cx file pruning through the rebuild hook, mixed-type failure") {
    val dir = java.nio.file.Files.createTempDirectory("ga_prune").toString
    // two spatially separated partitions → two files with disjoint bboxes
    val pts = GeoDataFrame(
      (1 to 100).map(i => (i.toLong, if (i <= 50) i.toDouble else i + 1000.0, i.toDouble))
        .toDF("id", "x", "y")
        .repartitionByRange(2, $"x")
        .withColumn("geometry", st_point($"x", $"y")))
    GeoParquetIO.write(pts, dir, geometryEncoding = "point")
    val back = GeoParquetIO.read(spark, dir)
    val pruned = back.cx(0.0, 0.0, 100.0, 100.0)
    val ids = pruned.df.select($"id").as[Long].collect().sorted.toSeq
    assert(ids == (1L to 50L), s"cx over native-encoded dataset wrong: $ids")
    // the re-planned scan must have dropped the far file
    val scannedFiles = pruned.df.select(input_file_name()).distinct().count()
    assert(scannedFiles == 1, s"expected 1 surviving file, scanned $scannedFiles")

    // single-type contract: a linestring in a point-encoded write fails
    val mixed = GeoDataFrame(Seq(
      (1L, "POINT (0 0)"), (2L, "LINESTRING (0 0, 1 1)"))
      .toDF("id", "wkt").withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt"))
    val err = intercept[Exception] {
      GeoParquetIO.write(mixed,
        java.nio.file.Files.createTempDirectory("ga_bad").toString,
        geometryEncoding = "point")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("single-type")),
      s"unexpected error: ${err.getMessage}")
  }
}
