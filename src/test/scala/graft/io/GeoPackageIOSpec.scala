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

  test("bbox read prunes through the fixture's SQLite R-tree") {
    assert(GeoPackageIO.hasRtree(spark, fixture, "supplier_pts"))
    val full = GeoPackageIO.read(spark, fixture, "supplier_pts")
    val window = (100.0, 0.0, 300.0, 400.0)
    val pruned = GeoPackageIO.read(spark, fixture, "supplier_pts", Some(window))
    val want = full
      .filter(expr("st_x(st_geomfromwkb(geom)) BETWEEN 100 AND 300") &&
        expr("st_y(st_geomfromwkb(geom)) BETWEEN 0 AND 400"))
      .select($"fid").as[Long].collect().sorted.toSeq
    val got = pruned.select($"fid").as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.size < 500)
    // far-outside window: zero candidates, zero tasks worth of rows
    assert(GeoPackageIO.read(spark, fixture, "supplier_pts",
      Some((10000.0, 10000.0, 10001.0, 10001.0))).count() == 0)
    // the cx hook rides the same path on a CRS-bearing frame
    val g = graft.api.GeoDataFrame.readGeoPackage(spark, fixture, "supplier_pts")
    assert(g.boxSource.exists(_.validFor(g.df)))
    val viaCx = g.cx(100, 0, 300, 400).df.select($"fid").as[Long].collect().sorted.toSeq
    assert(viaCx == want)
  }

  private def tmpGpkg(): String = {
    val d = java.nio.file.Files.createTempDirectory("gpkg").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/out.gpkg"
  }

  test("write + read roundtrip: attrs, nulls, geometry, crs, metadata tables") {
    val out = tmpGpkg()
    val df = (0 until 200).map { i =>
      (i.toLong, s"name_$i", i * 0.25 - 10.0,
        if (i % 5 == 0) null else s"tag_${i % 3}", i * 2.0, -i * 1.5)
    }.toDF("k", "nm", "score", "tag", "x", "y")
      .withColumn("geom", expr("st_asbinary(st_point(x, y))"))
      .drop("x", "y")
    val g = graft.api.GeoDataFrame(df, "geom").setCrs("EPSG:3857")
    GeoPackageIO.write(g, out, "layer1")
    // read back through the existing reader
    val back = graft.api.GeoDataFrame.readGeoPackage(spark, out, "layer1")
    assert(back.geometryColumn == "geom")
    assert(back.crs.contains("EPSG:3857"))
    val rows = back.df.select($"fid", $"k", $"nm", $"score", $"tag",
        expr("st_x(st_geomfromwkb(geom))"), expr("st_y(st_geomfromwkb(geom))"))
      .as[(Long, Long, String, Double, Option[String], Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.length == 200)
    rows.zipWithIndex.foreach { case ((fid, k, nm, score, tag, x, y), i) =>
      assert(fid == i + 1 && k == i && nm == s"name_$i")
      assert(score == i * 0.25 - 10.0)
      assert(tag == (if (i % 5 == 0) None else Some(s"tag_${i % 3}")))
      assert(x == i * 2.0 && y == -i * 1.5)
    }
    // spec tables: contents carries the layer bbox; srs registry has 3857
    val contents = GeoPackageIO.read(spark, out, "gpkg_contents")
      .select($"table_name", $"min_x", $"min_y", $"max_x", $"max_y", $"srs_id")
      .as[(String, Double, Double, Double, Double, Long)].head()
    assert(contents == (("layer1", 0.0, -199 * 1.5, 199 * 2.0, 0.0, 3857L)))
    val srs = GeoPackageIO.read(spark, out, "gpkg_spatial_ref_sys")
      .select($"srs_id", $"organization").as[(Long, String)].collect().toSet
    assert(srs.contains((3857L, "EPSG")) && srs.contains((4326L, "EPSG")))
    assert(srs.contains((-1L, "NONE")) && srs.contains((0L, "NONE")))
  }

  test("writeLayers: multi-table gpkg, per-layer rtree + catalog, readFile layer=") {
    val out = tmpGpkg()
    def pts(n: Int, dx: Double) = {
      val df = (1 to n).map(i => (i.toLong, s"p_$i"))
        .toDF("fid", "nm")
        .withColumn("geom",
          expr(s"st_asbinary(st_point(fid * 1.0 + $dx, fid * 2.0))"))
      graft.api.GeoDataFrame(df, "geom").setCrs("EPSG:4326")
    }
    GeoPackageIO.writeLayers(
      Seq("roads" -> pts(300, 0.0), "parks" -> pts(80, 1000.0)), out)
    // catalog: one contents/geometry_columns/ogr_contents row per layer
    val meta = GeoPackageIO.featureMeta(spark, out)
    assert(meta.keySet == Set("roads", "parks"))
    val counts = GeoPackageIO.read(spark, out, "gpkg_ogr_contents")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("roads" -> 300L, "parks" -> 80L))
    // per-layer rtree: both prune
    assert(GeoPackageIO.hasRtree(spark, out, "roads"))
    assert(GeoPackageIO.hasRtree(spark, out, "parks"))
    val win = GeoPackageIO.read(spark, out, "roads",
        bbox = Some((10.0, 0.0, 20.0, 1000.0)))
      .select($"fid").as[Long].collect().sorted
    assert(win.toSeq == (10L to 20L))
    // readFile layer selection + the no-layer refusal naming both
    val roads = graft.api.GeoDataFrame.readFile(spark, out, layer = Some("roads"))
    val parks = graft.api.GeoDataFrame.readFile(spark, out, layer = Some("parks"))
    assert(roads.df.count() == 300 && parks.df.count() == 80)
    assert(roads.crs.contains("EPSG:4326"))
    val e = intercept[IllegalArgumentException](
      graft.api.GeoDataFrame.readFile(spark, out))
    assert(e.getMessage.contains("roads") && e.getMessage.contains("parks"))
    // DSv2 count pushdown answers per layer from gpkg_ogr_contents
    val n = spark.read.format("geopackage").option("table", "parks")
      .load(out).count()
    assert(n == 80)
  }

  test("EMPTY geometries roundtrip as EMPTY (not null); bbox ignores them") {
    val out = tmpGpkg()
    val df = Seq(
      (1L, "a", "POINT (5 5)"),
      (2L, "b", "GEOMETRYCOLLECTION EMPTY"),
      (3L, "c", "POINT (9 9)")).toDF("fid", "nm", "wkt")
      .withColumn("geom", expr("st_asbinary(st_geomfromwkt(wkt))")).drop("wkt")
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"), out, "t")
    val back = graft.api.GeoDataFrame.readGeoPackage(spark, out, "t").df
      .select($"fid", expr("st_isempty(st_geomfromwkb(geom))").as("e"),
        $"geom".isNull.as("n"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    // the empty row comes back as a geometry that IS empty, never null
    assert(back.toSeq == Seq((1L, false, false), (2L, true, false),
      (3L, false, false)))
    // contents bbox covers only the real points (+/-Inf never stamped)
    val c = GeoPackageIO.read(spark, out, "gpkg_contents")
      .select($"min_x", $"min_y", $"max_x", $"max_y")
      .as[(Double, Double, Double, Double)].head()
    assert(c == ((5.0, 5.0, 9.0, 9.0)))
  }

  test("fid rowid alias: IntegerType works, case-insensitive, bad type refused") {
    val out = tmpGpkg()
    val df = Seq((7, "x"), (9, "y")).toDF("FID", "nm")
      .withColumn("geom", expr("st_asbinary(st_point(1.0, 2.0))"))
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"), out, "t")
    val fids = GeoPackageIO.read(spark, out, "t")
      .select($"FID").as[Long].collect().sorted
    assert(fids.toSeq == Seq(7L, 9L))
    val bad = Seq(("a", "x")).toDF("fid", "nm")
      .withColumn("geom", expr("st_asbinary(st_point(1.0, 2.0))"))
    val e = intercept[IllegalArgumentException](
      GeoPackageIO.write(graft.api.GeoDataFrame(bad, "geom"), tmpGpkg(), "t"))
    assert(e.getMessage.contains("fid"))
  }

  test("identifiers with embedded quotes or control chars are refused " +
      "(DDL-splice corruption guard, gpkg + spatialite)") {
    val df = Seq((1L, "x")).toDF("id", "nm")
      .withColumn("geom", expr("st_asbinary(st_point(1.0, 2.0))"))
    val g = graft.api.GeoDataFrame(df, "geom")
    val e1 = intercept[IllegalArgumentException](
      GeoPackageIO.write(g, tmpGpkg(), "bad\"name"))
    assert(e1.getMessage.contains("double quote"))
    val ctl = df.withColumnRenamed("nm", "n\tm")
    val e2 = intercept[IllegalArgumentException](
      GeoPackageIO.write(graft.api.GeoDataFrame(ctl, "geom"), tmpGpkg(), "t"))
    assert(e2.getMessage.contains("control"))
    // the shared encodeLayer guards the spatialite route too
    val e3 = intercept[IllegalArgumentException](
      SpatiaLiteIO.writeLayers(Seq("ta\"ble" -> g),
        tmpGpkg().stripSuffix(".gpkg") + ".sqlite"))
    assert(e3.getMessage.contains("double quote"))
  }

  test("write emits the R*-tree: bbox reads prune on our own files") {
    val out = tmpGpkg()
    val df = (0 until 3000).map { i =>
      (i.toLong, (i % 60) * 10.0, (i / 60) * 10.0)
    }.toDF("k", "x", "y")
      .withColumn("geom", expr("st_asbinary(st_point(x, y))"))
      .drop("x", "y")
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"), out, "pts")
    assert(GeoPackageIO.hasRtree(spark, out, "pts"))
    // pruned read == exact filter, and candidates came from the rtree
    val box = (95.0, 95.0, 255.0, 255.0)
    val got = GeoPackageIO.read(spark, out, "pts", bbox = Some(box))
      .select($"k").as[Long].collect().sorted
    val want = (0 until 3000).filter { i =>
      val x = (i % 60) * 10.0; val y = (i / 60) * 10.0
      x >= 95 && x <= 255 && y >= 95 && y <= 255
    }.map(_.toLong)
    assert(got.toSeq == want && want.nonEmpty)
    // multi-level tree: 3000 entries at 40 cells/node needs 2+ levels —
    // the parent shadow table must be populated
    val parents = GeoPackageIO.read(spark, out, "rtree_pts_geom_parent")
    assert(parents.count() >= 75) // >= number of leaf nodes
    // and the cx hook re-plans through it via readGeoPackage
    val g = graft.api.GeoDataFrame.readGeoPackage(spark, out, "pts")
    val viaCx = g.cx(box._1, box._2, box._3, box._4).df
      .select($"k").as[Long].collect().sorted
    assert(viaCx.toSeq == want)
  }

  test("write rtree: shuffled row order still packs tight leaves; empties excluded") {
    val out = tmpGpkg()
    // spatially coherent grid in RANDOMIZED row order — rowid-order
    // packing would give every leaf the full layer box and the index
    // would degenerate; hilbert packing must keep candidates local
    val rnd = new scala.util.Random(99)
    val shuffled = rnd.shuffle((0 until 3000).toVector)
    val df = shuffled.zipWithIndex.map { case (i, k) =>
      (k.toLong, (i % 60) * 10.0, (i / 60) * 10.0)
    }.toDF("k", "x", "y")
      .withColumn("geom", when($"k" === 7L,
          expr("st_asbinary(st_geomfromwkt('GEOMETRYCOLLECTION EMPTY'))"))
        .otherwise(expr("st_asbinary(st_point(x, y))")))
      .drop("x", "y")
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"), out, "pts")
    // pruned read == exact residual on a small window
    val box = (95.0, 95.0, 155.0, 155.0)
    val got = GeoPackageIO.read(spark, out, "pts", bbox = Some(box)).count()
    val want = shuffled.zipWithIndex.count { case (i, k) =>
      k != 7 && {
        val x = (i % 60) * 10.0; val y = (i / 60) * 10.0
        x >= 95 && x <= 155 && y >= 95 && y <= 155
      }
    }
    assert(got == want && want > 0)
    // tightness: the rtree candidate set for the small window must be a
    // small fraction of the table (degenerate packing returns ~all rows)
    val src = GeoPackageIO.openSource(spark.sessionState.newHadoopConf(), out)
    val nCand = try {
      val master = GeoPackageIO.readMaster(src)
      val node = master.find(_.name == "rtree_pts_geom_node").get
      GeoPackageIO.rtreeCandidates(src, node.rootPage,
        box._1, box._2, box._3, box._4).length
    } finally src.close()
    assert(nCand < 600, s"rtree candidates $nCand of 3000 — leaves not tight")
    // the empty geometry is indexed nowhere but still reads back
    val rowids = GeoPackageIO.read(spark, out, "rtree_pts_geom_rowid").count()
    assert(rowids == 2999)
    assert(GeoPackageIO.read(spark, out, "pts").count() == 3000)
  }

  test("write rtree: packing boundaries (1 / 40 / 41 / 1601 entries)") {
    for (n <- Seq(1, 40, 41, 1601)) {
      val out = tmpGpkg()
      val df = (0 until n).map(i => (i.toLong, (i % 40) * 10.0, (i / 40) * 10.0))
        .toDF("k", "x", "y")
        .withColumn("geom", expr("st_asbinary(st_point(x, y))"))
        .drop("x", "y")
      GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"), out, "pts")
      assert(GeoPackageIO.hasRtree(spark, out, "pts"), s"n=$n")
      // every rowid maps to a leaf; pruned full-extent read sees all rows
      assert(GeoPackageIO.read(spark, out, "rtree_pts_geom_rowid").count() == n)
      val got = GeoPackageIO.read(spark, out, "pts",
        bbox = Some((-1.0, -1.0, 1e6, 1e6))).count()
      assert(got == n, s"n=$n got $got")
      // small-window exactness at each boundary
      val small = GeoPackageIO.read(spark, out, "pts",
        bbox = Some((0.0, 0.0, 95.0, 0.0))).count()
      val want = (0 until n).count(i => i / 40 == 0 && (i % 40) * 10.0 <= 95.0)
      assert(small == want, s"n=$n small $small want $want")
    }
    // spatialIndex = false writes no index and reads still work
    val out2 = tmpGpkg()
    val df2 = (0 until 50).map(i => (i.toLong, i * 1.0, i * 2.0))
      .toDF("k", "x", "y")
      .withColumn("geom", expr("st_asbinary(st_point(x, y))"))
      .drop("x", "y")
    GeoPackageIO.write(graft.api.GeoDataFrame(df2, "geom"), out2, "pts",
      spatialIndex = false)
    assert(!GeoPackageIO.hasRtree(spark, out2, "pts"))
    assert(GeoPackageIO.read(spark, out2, "pts",
      bbox = Some((0.0, 0.0, 10.0, 20.0))).count() == 11)
  }

  test("write: oversized records spill to overflow chains and read back intact") {
    val out = tmpGpkg()
    // strings far beyond usable-35 at pageSize 512 force multi-page chains
    val big = (0 until 20).map(i => (i.toLong, "x" * (300 + i * 137) + s"#$i"))
      .toDF("k", "payload")
      .withColumn("geom", expr("st_asbinary(st_point(k * 1.0, 2.0))"))
    GeoPackageIO.write(graft.api.GeoDataFrame(big, "geom"), out, "big", pageSize = 512)
    val back = GeoPackageIO.read(spark, out, "big")
      .select($"k", $"payload").as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 20)
    back.zipWithIndex.foreach { case ((k, p), i) =>
      assert(k == i && p == "x" * (300 + i * 137) + s"#$i")
    }
  }

  test("write: multi-level b-tree at small page size partitions the read") {
    val out = tmpGpkg()
    val df = (0 until 500).map(i => (i.toLong, s"v_$i", i * 1.25))
      .toDF("k", "s", "d")
      .withColumn("geom", expr("st_asbinary(st_point(k * 1.0, k * 2.0))"))
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom").setCrs("EPSG:4326"),
      out, "pts", pageSize = 512)
    val back = GeoPackageIO.read(spark, out, "pts")
    assert(back.rdd.getNumPartitions > 5, s"got ${back.rdd.getNumPartitions}")
    assert(back.select($"fid").as[Long].collect().sorted.toSeq == (1L to 500L))
    assert(back.select(sum($"d")).head().getDouble(0) == (0 until 500).map(_ * 1.25).sum)
  }

  test("write: an existing LongType fid column supplies the rowids") {
    val out = tmpGpkg()
    // read the committed fixture and write it back: fids must survive
    val g = graft.api.GeoDataFrame.readGeoPackage(spark, fixture, "supplier_pts")
    GeoPackageIO.write(g, out, "supplier_pts")
    val a = graft.api.GeoDataFrame.readGeoPackage(spark, out, "supplier_pts").df
      .select($"fid", $"s_suppkey", $"s_name", $"weight", $"note",
        expr("st_x(st_geomfromwkb(geom))").as("x"))
      .as[(Long, Long, String, Double, Option[String], Double)].collect().sortBy(_._1).toSeq
    val b = g.df
      .select($"fid", $"s_suppkey", $"s_name", $"weight", $"note",
        expr("st_x(st_geomfromwkb(geom))").as("x"))
      .as[(Long, Long, String, Double, Option[String], Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
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
