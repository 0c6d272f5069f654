package graft.io

import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 route (`spark.read.format("shapefile")`) must agree
  * with ShapefileIO.read, honor column pruning down to the decode (incl.
  * skipping the .shp geometry decode when the geometry column is
  * pruned), and resolve from plain SQL.
  */
class ShapefileDataSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("shpdsv2").toString
    val rows = (0 until 400).map { i =>
      (i.toLong, s"n_$i", i * 0.25, Wkb.write(Point(i % 20 * 5.0, i / 20 * 5.0)))
    }
    ShapefileIO.write(
      rows.toDF("id", "nm", "score", "geometry").repartition(3), dir)
    dir
  }

  test("format read agrees with ShapefileIO.read") {
    val v2 = spark.read.format("shapefile").load(path)
    assert(v2.schema.fieldNames.toSeq == Seq("id", "nm", "score", "geometry"))
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"nm", $"score", expr("st_astext(geometry)").as("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq.sorted
    val got = dump(v2)
    assert(got == dump(ShapefileIO.read(spark, path)) && got.size == 400)
  }

  test("column pruning reaches the decode; geometry pruned for attribute-only scans") {
    val pruned = spark.read.format("shapefile").load(path).select($"id", $"score")
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.schema.fieldNames.toSeq).head
    assert(scanSchema == Seq("id", "score"), scanSchema)
    assert(pruned.as[(Long, Double)].collect().sorted.toSeq.take(2) ==
      Seq((0L, 0.0), (1L, 0.25)))
    // pure count: no columns at all survive pruning
    assert(spark.read.format("shapefile").load(path).count() == 400)
  }

  test("SQL resolution via the registered short name (USING shapefile)") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW shp_ds_spec
      USING shapefile OPTIONS (path '$path')""")
    val n = spark.sql(
      "SELECT count(*) FROM shp_ds_spec WHERE st_x(geometry) < 50").collect()(0).getLong(0)
    // x in {0,5,...,95}; x < 50 -> 10 of 20 columns of the grid
    assert(n == 200)
  }
}
