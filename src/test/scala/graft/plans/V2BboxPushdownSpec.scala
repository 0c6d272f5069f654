package graft.plans

import graft.geom.{Point, Wkb}
import graft.io.{FlatGeobufIO, GeoPackageIO, ShapefileIO}
import graft.sql.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2Relation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declarative spatial filter pushdown for the file-format DSv2
  * connectors: a PLAIN `.filter(st_*)` — no `bbox` option, no `.cx` —
  * must prune input partitions through each format's native index, and
  * must never change results (the filter stays as the exact residual).
  */
class V2BboxPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b
    }.get

  private def nParts(df: DataFrame): Int = scanOf(df).inputPartitions.size

  // ---- shapefile: file-header envelope pruning ---------------------------

  private lazy val shpDir: String = {
    val merged = java.nio.file.Files.createTempDirectory("v2bboxshp").toString
    val near = (0 until 100).map(i =>
      (i.toLong, Wkb.write(Point(i % 10 * 1.0, i / 10 * 1.0))))
    val far = (100 until 200).map(i =>
      (i.toLong, Wkb.write(Point(1000.0 + i, 1000.0))))
    val tmp = java.nio.file.Files.createTempDirectory("v2bboxshpw").toString
    ShapefileIO.write(near.toDF("id", "geometry").coalesce(1), tmp + "/a")
    ShapefileIO.write(far.toDF("id", "geometry").coalesce(1), tmp + "/b")
    for ((sub, tag) <- Seq(("a", "n"), ("b", "f"));
         f <- new java.io.File(tmp, sub).listFiles())
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(merged, tag + f.getName))
    merged
  }

  test("shapefile: plain st_intersectsbox filter prunes files, results exact") {
    val base = spark.read.format("shapefile").load(shpDir)
    assert(nParts(base) == 2)
    val q = base.filter(expr("st_intersectsbox(geometry, 0, 0, 4.5, 4.5)"))
    assert(nParts(q) == 1, "far file must be pruned by the plain filter")
    val got = q.select($"id").as[Long].collect().sorted.toSeq
    val want = (0 until 100).filter(i => i % 10 <= 4 && i / 10 <= 4).map(_.toLong)
    assert(got == want)
    // fully-outside window -> zero partitions planned, zero rows
    val none = base.filter(expr("st_intersectsbox(geometry, 1e7, 1e7, 2e7, 2e7)"))
    assert(nParts(none) == 0 && none.count() == 0)
  }

  test("shapefile: st_dwithin / st_distance / st_within literal masks prune too") {
    val base = spark.read.format("shapefile").load(shpDir)
    // st_dwithin around a far-away point: near file pruned as well
    val dw = base.filter(expr("st_dwithin(geometry, st_point(5000, 5000), 10)"))
    assert(nParts(dw) == 0 && dw.count() == 0)
    // distance comparison form, selective window around the near block
    val dist = base.filter(expr("st_distance(geometry, st_point(0, 0)) <= 2.1"))
    assert(nParts(dist) == 1)
    assert(dist.count() ==
      (0 until 100).count(i => math.hypot(i % 10, i / 10) <= 2.1))
    // st_within a literal polygon mask
    val within = base.filter(expr(
      "st_within(geometry, st_geomfromwkt('POLYGON((-1 -1, 3.5 -1, 3.5 3.5, -1 3.5, -1 -1))'))"))
    assert(nParts(within) == 1)
    assert(within.count() == (0 until 100).count(i => i % 10 <= 3 && i / 10 <= 3))
  }

  // ---- flatgeobuf: part-file envelope + Hilbert R-tree pruning -----------

  private lazy val fgbDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("v2bboxfgb").toString
    val rows = (0 until 400).map { i =>
      (i.toLong, Wkb.write(Point(i % 20 * 5.0, i / 20 * 5.0)))
    }
    // range-partition on id -> y-banded part files with disjoint envelopes
    graft.api.GeoDataFrame(
      rows.toDF("id", "geometry").repartitionByRange(4, $"id"), "geometry")
      .df.write.format("flatgeobuf").mode("overwrite").save(dir)
    dir
  }

  test("flatgeobuf: plain spatial filter prunes part files, results exact") {
    val base = spark.read.format("flatgeobuf").load(fgbDir)
    val all = nParts(base)
    assert(all >= 4)
    // low-y window: only the first y-band survives
    val q = base.filter(expr("st_intersectsbox(geometry, 0, 0, 100, 20)"))
    assert(nParts(q) < all, s"expected < $all partitions, got ${nParts(q)}")
    val got = q.select($"id").as[Long].collect().sorted.toSeq
    val want = (0 until 400).filter(i => i / 20 * 5.0 <= 20.0).map(_.toLong)
    assert(got == want)
    // st_intersects with a literal mask routes the same way
    val q2 = base.filter(expr(
      "st_intersects(geometry, st_geomfromwkt('POLYGON((0 0, 100 0, 100 20, 0 20, 0 0))'))"))
    assert(nParts(q2) < all)
    assert(q2.select($"id").as[Long].collect().sorted.toSeq == want)
    val none = base.filter(expr("st_intersectsbox(geometry, 1e6, 1e6, 2e6, 2e6)"))
    assert(nParts(none) == 0 && none.count() == 0)
  }

  // ---- geopackage: R*-tree candidate pruning -----------------------------

  test("geopackage: plain spatial filter routes through the R*-tree, results exact") {
    // the committed fixture carries a real SQLite R*-tree (writer files don't)
    val fixture = "fixtures/supplier_pts.gpkg"
    assert(GeoPackageIO.hasRtree(spark, fixture, "supplier_pts"))
    val base = spark.read.format("geopackage")
      .option("table", "supplier_pts").load(fixture)
    val all = nParts(base)
    val q = base.filter(expr("st_intersectsbox(geom, 100, 0, 300, 400)"))
    // the rebuilt scan carries the derived bbox -> R*-tree candidate plan
    assert(scanOf(q).scan.description().contains("bbox="), scanOf(q).scan.description())
    assert(nParts(q) < all, s"expected < $all partitions, got ${nParts(q)}")
    val want = GeoPackageIO.read(spark, fixture, "supplier_pts",
        bbox = Some((100.0, 0.0, 300.0, 400.0)))
      .select($"fid").as[Long].collect().sorted.toSeq
    val got = q.select($"fid").as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty && got.size < 500)
    val none = base.filter(expr("st_intersectsbox(geom, 1e6, 1e6, 2e6, 2e6)"))
    assert(nParts(none) == 0 && none.count() == 0)
  }

  // ---- rule mechanics ----------------------------------------------------

  test("conjuncts intersect; user bbox option is narrowed, never widened") {
    val base = spark.read.format("shapefile").option("bbox", "0,0,100,100").load(shpDir)
    // plain filter intersected with the option: window shrinks to (0,0,3,3)
    val q = base.filter(expr("st_intersectsbox(geometry, -10, -10, 3, 3)") &&
      expr("st_intersectsbox(geometry, 0, 0, 50, 50)"))
    assert(scanOf(q).scan.description().contains("bbox=(0.0,0.0,3.0,3.0)"),
      scanOf(q).scan.description())
    assert(q.count() == (0 until 100).count(i => i % 10 <= 3 && i / 10 <= 3))
  }

  test("pre-pushdown shape (spark.sql.extensions route): bbox option injected on the relation") {
    val analyzed = spark.read.format("shapefile").load(shpDir)
      .filter(expr("st_intersectsbox(geometry, 0, 0, 4.5, 4.5)"))
      .queryExecution.analyzed
    val out = V2BboxPushdown(analyzed)
    val rels = out.collect { case r: DataSourceV2Relation => r }
    assert(rels.nonEmpty)
    assert(rels.head.options.get("bbox") == "0.0,0.0,4.5,4.5", rels.head.options)
    // idempotent: a second application leaves the plan unchanged
    assert(V2BboxPushdown(out) == out)
  }

  test("non-literal / non-geometry filters never derive a bbox") {
    val base = spark.read.format("shapefile").load(shpDir)
    // attribute filter only: no bbox, full partition set
    val q1 = base.filter($"id" < 50)
    assert(!scanOf(q1).scan.description().contains("bbox="))
    // geometry on both sides (non-foldable mask): no bbox
    val q2 = base.filter(expr("st_intersects(geometry, geometry)"))
    assert(!scanOf(q2).scan.description().contains("bbox="))
    assert(q2.count() == 200)
  }
}
