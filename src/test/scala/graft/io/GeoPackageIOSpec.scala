package graft.io

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoPackageIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "fixtures/supplier_pts.gpkg"

  test("reads the committed gpkg fixture: schema, rowid alias, geometry, nulls") {
    val df = GeoPackageIO.read(spark, fixture, "supplier_pts")
    assert(df.schema.fieldNames.toSeq ==
      Seq("fid", "s_suppkey", "s_name", "weight", "note", "geom"))
    assert(df.count() == 500)
    val rows = df.select($"fid", $"s_suppkey", $"s_name", $"weight", $"note",
        expr("st_x(st_geomfromwkb(geom))"), expr("st_y(st_geomfromwkb(geom))"))
      .as[(Long, Long, String, Double, Option[String], Double, Double)]
      .collect().sortBy(_._1)
    rows.zipWithIndex.foreach { case ((fid, key, name, w, note, x, y), i) =>
      assert(fid == i + 1, "INTEGER PRIMARY KEY must surface from the rowid")
      assert(key == i && name == s"sup_$i")
      assert(w == i * 0.5 - 25.0)
      assert(note == (if (i % 7 == 0) None else Some(s"note_${i % 13}")))
      assert(x == i * 3.25 - 100.0 && y == (i % 100) * 7.5)
    }
  }

  test("root subtrees become read partitions (multi-level b-tree)") {
    val df = GeoPackageIO.read(spark, fixture, "supplier_pts")
    // the fixture's 1 KiB pages force an interior root with dozens of children
    assert(df.rdd.getNumPartitions > 10, s"got ${df.rdd.getNumPartitions}")
    // partition union must equal the table exactly (no dup/missing rowids)
    val ids = df.select($"fid").as[Long].collect().sorted.toSeq
    assert(ids == (1L to 500L))
  }

  test("GeoDataFrame.readGeoPackage wires geometry column + EPSG crs") {
    val g = graft.api.GeoDataFrame.readGeoPackage(spark, fixture, "supplier_pts")
    assert(g.geometryColumn == "geom")
    assert(g.crs.contains("EPSG:4326"))
    assert(g.cx(-50, 0, 50, 200).df.count() ==
      g.df.filter(expr("st_x(st_geomfromwkb(geom)) BETWEEN -50 AND 50") &&
        expr("st_y(st_geomfromwkb(geom)) BETWEEN 0 AND 200")).count())
  }

  test("gpkg metadata tables are readable and list the geometry column") {
    assert(GeoPackageIO.geometryColumns(spark, fixture) ==
      Map("supplier_pts" -> "geom"))
    val contents = GeoPackageIO.read(spark, fixture, "gpkg_contents")
    assert(contents.select($"table_name").as[String].collect().toSeq ==
      Seq("supplier_pts"))
    val ex = intercept[IllegalArgumentException] {
      GeoPackageIO.read(spark, fixture, "no_such_table")
    }
    assert(ex.getMessage.contains("no table"))
    // plain attribute tables are not GeoDataFrames: loud read-time feedback
    val ex2 = intercept[IllegalArgumentException] {
      graft.api.GeoDataFrame.readGeoPackage(spark, fixture, "gpkg_contents")
    }
    assert(ex2.getMessage.contains("no gpkg_geometry_columns entry"))
  }
}
