package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Format-parity sweep: one frame, five on-disk formats, identical content
  * back from every reader. This is the "a user could switch" guarantee at
  * the IO layer — any format-specific encode/decode drift (attribute
  * typing, null handling, coordinate precision, row identity) fails here
  * before it can reach an oracle.
  */
class CrossFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out"
  }

  test("same frame through geoparquet/feather/shapefile/gpkg/fgb reads back identically") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 150).map { i =>
      (i.toLong, s"name_$i", rnd.nextDouble() * 1000 - 500,
        Wkb.write(Point(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)))
    }
    val base = rows.toDF("id", "nm", "score", "geometry").repartition(3)
    val gdf = GeoDataFrame(base, "geometry").setCrs("EPSG:4326")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Double, Double, Double)] =
      df.select(col("id").cast("long"), col("nm"), col("score"),
          expr("round(st_x(geometry), 9)"), expr("round(st_y(geometry), 9)"))
        .as[(Long, String, Double, Double, Double)]
        .collect().sortBy(_._1).toSeq

    val want = canon(base)

    // GeoParquet
    val pq = tmp("xfmt_pq")
    GeoParquetIO.write(gdf, pq)
    assert(canon(GeoParquetIO.read(spark, pq).df) == want, "geoparquet drift")

    // Feather WKB + GeoArrow
    val fw = tmp("xfmt_feather")
    GeoFeatherIO.write(gdf, fw)
    assert(canon(GeoFeatherIO.read(spark, fw).df) == want, "feather wkb drift")
    val fa = tmp("xfmt_geoarrow")
    GeoFeatherIO.write(gdf, fa, encoding = "geoarrow")
    assert(canon(GeoFeatherIO.read(spark, fa).df) == want, "feather geoarrow drift")

    // Shapefile (dbf numerics: score survives the N-field formatting)
    val shp = tmp("xfmt_shp")
    ShapefileIO.write(gdf.df, shp)
    val shpBack = ShapefileIO.read(spark, shp)
    val shpGot = shpBack.select(col("id").cast("long"), col("nm"), col("score"),
        expr("round(st_x(geometry), 9)"), expr("round(st_y(geometry), 9)"))
      .as[(Long, String, Double, Double, Double)].collect().sortBy(_._1).toSeq
    // dbf stores doubles as fixed-width decimal text: compare at its precision
    want.zip(shpGot).foreach { case ((id, nm, sc, x, y), (id2, nm2, sc2, x2, y2)) =>
      assert(id == id2 && nm == nm2, s"shp identity drift at $id")
      assert(math.abs(sc - sc2) < 1e-9, s"shp score drift at $id")
      assert(x == x2 && y == y2, s"shp coord drift at $id")
    }

    // GeoPackage (needs a fid primary key; coordinates are exact doubles)
    val gpkgFile = tmp("xfmt_gpkg") + ".gpkg"
    val withFid = GeoDataFrame(
      gdf.df.withColumn("fid", col("id") + 1).orderBy("fid")
        .select(col("fid"), col("id"), col("nm"), col("score"), col("geometry")),
      "geometry").setCrs("EPSG:4326")
    GeoPackageIO.write(withFid, gpkgFile, "t")
    assert(canon(GeoPackageIO.read(spark, gpkgFile, "t").drop("fid")) == want, "gpkg drift")

    // FlatGeobuf single file + directory
    val fgb = tmp("xfmt_fgb") + ".fgb"
    FlatGeobufIO.write(gdf, fgb)
    assert(canon(FlatGeobufIO.read(spark, fgb)) == want, "fgb drift")
    val fgbDir = tmp("xfmt_fgbdir")
    FlatGeobufIO.writeDir(gdf, fgbDir)
    assert(canon(FlatGeobufIO.read(spark, fgbDir)) == want, "fgb dir drift")

    // FileGDB (r14): coordinates quantize at 1e-9 — exact at round(.,9)
    val gdb = tmp("xfmt_gdb") + ".gdb"
    FileGdbIO.write(gdf.df, gdb, crs = Some("EPSG:4326"))
    assert(canon(FileGdbIO.read(spark, gdb).df) == want, "filegdb drift")
    assert(FileGdbIO.read(spark, gdb).crs.contains("EPSG:4326"))

    // CRS survives every geo-metadata-bearing format
    assert(GeoParquetIO.read(spark, pq).crs.contains("EPSG:4326"))
    assert(GeoFeatherIO.read(spark, fw).crs.contains("EPSG:4326"))
    assert(GeoDataFrame.readFlatGeobuf(spark, fgb).crs.contains("EPSG:4326"))
    assert(GeoDataFrame.readGeoPackage(spark, gpkgFile, "t").crs.contains("EPSG:4326"))
  }

  test("r11 end-to-end: .prj-carrying shapefile -> auto CRS -> toCrs equal-area -> area") {
    import graft.sql.functions._
    // a geodesy-real scenario: city points written WITH a .prj sidecar,
    // read back with auto-detected CRS, reprojected through a proj record
    // (Equal Earth) via toCrs, and measured — no explicit CRS strings on
    // the read path anywhere
    val dir = java.nio.file.Files.createTempDirectory("e2e_prj").toString
    val src = Seq((1L, 7.44, 46.95), (2L, 2.35, 48.85), (3L, -0.13, 51.5),
        (4L, 13.4, 52.5), (5L, -3.7, 40.4))
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point(col("lon"), col("lat")))
      .select(col("id"), col("geometry"))
    ShapefileIO.write(src, dir, crs = Some("EPSG:4326"))
    val back = GeoDataFrame.readFile(spark, dir)
    assert(back.crs.contains("EPSG:4326"), "auto-detected from the sidecar")
    val ee = back.toCrs("+proj=eqearth +lon_0=0")
    assert(ee.crs.contains("+proj=eqearth +lon_0=0"))
    // projected coordinates match the kernel directly
    val got = ee.df.select(col("id"), st_x(col("geometry")), st_y(col("geometry")))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val k = new graft.sql.Crs.EqualEarth(6378137.0, 0.0, 0.0, 0.0)
    val (bx, by) = k.forward(7.44, 46.95)
    assert(math.abs(got(1L)._1 - bx) < 1e-6 && math.abs(got(1L)._2 - by) < 1e-6)
    // the convex hull's ellipsoidal area agrees between st_areaspheroid on
    // the ORIGINAL lon/lat frame and planar area in the equal-area frame
    val hullLl = back.df.agg(st_convexHull(st_collectAgg(col("geometry"))).as("h"))
      .select(st_areaSpheroid(col("h"))).head.getDouble(0)
    val hullEe = ee.df.agg(st_convexHull(st_collectAgg(col("geometry"))).as("h"))
      .select(st_area(col("h"))).head.getDouble(0)
    // ~0.4% apart at this continental hull: the edges are straight in
    // DIFFERENT projections (LAEA vs Equal Earth) — exactly the documented
    // long-edge caveat; densified edges converge (FunctionsSpec pins the
    // densified case at 2e-6)
    assert(math.abs(hullLl / hullEe - 1.0) < 0.01,
      s"spheroid area $hullLl vs equal-area-plane $hullEe")
  }
}
