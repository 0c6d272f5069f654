package graft.io

import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoPackageDataSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val path: String = {
    val f = java.io.File.createTempFile("gpkgdsv2", ".gpkg")
    f.deleteOnExit()
    val rows = (0 until 400).map { i =>
      (i.toLong, s"name_$i", i * 0.5, Wkb.write(Point(i % 20 * 5.0, i / 20 * 5.0)))
    }
    val gdf = graft.api.GeoDataFrame(
      rows.toDF("fid", "nm", "score", "geom"), "geom")
    GeoPackageIO.write(gdf, f.getAbsolutePath, "pts")
    f.getAbsolutePath
  }

  test("format read agrees with GeoPackageIO.read") {
    val v2 = spark.read.format("geopackage").option("table", "pts").load(path)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"fid", $"nm", $"score", expr("st_astext(geom)").as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq.sorted
    val want = canon(GeoPackageIO.read(spark, path, "pts"))
    val got = canon(v2)
    assert(got == want && got.size == 400)
  }

  test("column pruning reaches the scan; bbox prunes via the R*-tree") {
    val pruned = spark.read.format("geopackage").option("table", "pts").load(path)
      .select($"fid", $"nm")
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.schema.fieldNames.toSeq).head
    assert(scanSchema == Seq("fid", "nm"), scanSchema)
    assert(pruned.count() == 400)

    val want = GeoPackageIO.read(spark, path, "pts", bbox = Some((0.0, 0.0, 42.0, 27.0)))
      .select($"fid").as[Long].collect().sorted.toSeq
    val got = spark.read.format("geopackage").option("table", "pts")
      .option("bbox", "0,0,42,27").load(path)
      .select($"fid").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty && got.size < 400)
  }

  test("count(*) answers from gpkg_ogr_contents (written by our writer)") {
    val df = spark.read.format("geopackage").option("table", "pts").load(path)
    val counted = df.groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("metadata count(*)"), plan)
    assert(counted.collect().head.getLong(0) == 400L)
    // a filter disables the metadata shortcut and still counts correctly
    val filtered = df.filter($"score" < 10).groupBy().count()
    assert(!filtered.queryExecution.executedPlan.toString.contains("metadata count(*)"))
    assert(filtered.collect().head.getLong(0) == 20L)
  }

  test("SQL: CREATE TEMPORARY VIEW USING geopackage") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gpkg_ds_spec
      USING geopackage OPTIONS (path '$path', table 'pts')""")
    assert(spark.sql("SELECT count(*) FROM gpkg_ds_spec").collect()(0).getLong(0) == 400)
    val r = spark.sql(
      "SELECT nm, st_x(geom) AS x FROM gpkg_ds_spec WHERE fid = 21").collect()(0)
    assert(r.getString(0) == "name_21" && r.getDouble(1) == 5.0)
  }

  test("unknown table names the available tables") {
    val e = intercept[Exception] {
      spark.read.format("geopackage").option("table", "nope").load(path).collect()
    }
    assert(e.getMessage.contains("pts"))
  }
}
