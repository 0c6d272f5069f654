package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoParquetIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("geoparquet").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/ds"
  }

  private def sample() = {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    GeoDataFrame.pointsFromXY(rows.toDF("id", "x", "y"), "x", "y").setCrs("EPSG:3857")
  }

  test("write + read roundtrip preserves data, crs, geometry column") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(4),
      calculatePartitions = false)
    GeoParquetIO.write(g, path)
    val back = GeoParquetIO.read(spark, path)
    assert(back.geometryColumn == "geometry")
    assert(back.crs.contains("EPSG:3857"))
    assert(back.df.count() == 500)
    val origSum = sample().df.agg(sum($"x")).head().getDouble(0)
    val backSum = back.df.agg(sum($"x")).head().getDouble(0)
    assert(math.abs(origSum - backSum) < 1e-6)
  }

  test("footer crs OBJECT (real-geopandas PROJJSON) passes through verbatim") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // GeoParquet-spec footers carry PROJJSON objects, not strings
    val obj = m.readTree(
      """{"type":"GeographicCRS","name":"WGS 84","id":{"authority":"EPSG","code":4326}}""")
    val got = graft.io.GeoParquetIO.crsNodeToString(obj)
    assert(got.isDefined && got.get.startsWith("{"), got.toString)
    // ...and the engine reduces the passed-through JSON at use time
    assert(graft.sql.WktCrs.parseProjJson(got.get).contains("EPSG:4326"))
    // strings still read as strings; null/absent reads as None
    assert(graft.io.GeoParquetIO.crsNodeToString(m.readTree("\"EPSG:3857\""))
      .contains("EPSG:3857"))
    assert(graft.io.GeoParquetIO.crsNodeToString(null).isEmpty)
  }

  test("footer geo metadata carries per-file bbox") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(4),
      calculatePartitions = false)
    GeoParquetIO.write(g, path)
    val meta = GeoParquetIO.readMeta(spark, path).get
    assert(meta.primaryColumn == "geometry")
    assert(meta.fileBBoxes.size == 4)
    // bboxes cover the data domain
    val all = meta.fileBBoxes.values.reduce(_ union _)
    assert(all.minX >= 0 && all.maxX <= 100)
    // hilbert-clustered files should have distinctly smaller extent than the domain
    assert(meta.fileBBoxes.values.exists(e => e.area < all.area * 0.9))
  }

  test("readPruned skips files by footer bbox") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(8),
      calculatePartitions = false)
    GeoParquetIO.write(g, path)
    val meta = GeoParquetIO.readMeta(spark, path).get
    val hit = meta.fileBBoxes.values.count(_.intersects(graft.geom.Envelope(0, 0, 15, 15)))
    assert(hit < 8, s"expected pruning, all $hit files hit")
    val pruned = GeoParquetIO.readPruned(spark, path, 0, 0, 15, 15)
    val want = sample().df.filter($"x" <= 15 && $"y" <= 15).count()
    assert(pruned.df.count() == want)
  }

  test("covering bbox column: declared in footer, cx pushes nested range filters") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(4),
      calculatePartitions = false)
    GeoParquetIO.write(g, path, covering = true)
    // footer declares the covering column (GeoParquet 1.1)
    val meta = GeoParquetIO.readMeta(spark, path).get
    assert(meta.covering.contains("geometry_bbox"))
    val back = GeoParquetIO.read(spark, path)
    assert(back.df.columns.contains("geometry_bbox"))
    // cx: value-correct vs the raw coordinate filter...
    val got = back.cx(0, 0, 15, 15).df.select($"id").as[Long].collect().sorted.toSeq
    val want = sample().df.filter($"x" >= 0 && $"x" <= 15 && $"y" >= 0 && $"y" <= 15)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(got == want)
    // ...and the bbox range predicates reach the parquet scan as pushed
    // filters on the nested fields (row-group min/max skipping)
    val scanStr = back.cx(0, 0, 15, 15).df.queryExecution.executedPlan.toString
    // the null-tolerant form pushes as Or(IsNull(bbox), And(ranges...)) —
    // the display truncates, so assert on the leading range predicate
    assert(scanStr.contains("PushedFilters") &&
      scanStr.contains("GreaterThanOrEqual(geometry_bbox.xmax"), scanStr.take(2000))
    // a transform that rewrites the geometry drops the covering hint
    val moved = back.withColumn("geometry", st_affine(back.geom,
      lit(1.0), lit(0.0), lit(0.0), lit(1.0), lit(500.0), lit(0.0)))
    val movedPlan = moved.cx(0, 0, 15, 15).df.queryExecution.executedPlan.toString
    assert(!movedPlan.contains("geometry_bbox.xmin"), "stale covering filter survived")
  }

  test("hive-partitioned write: footers in partition dirs, pruned read keeps partition column") {
    val path = tmpDir()
    val g = sample()
    val withCell = GeoDataFrame(g.df.withColumn("cell", ($"x" / 25.0).cast("int")),
      g.geometryColumn).setCrs("EPSG:3857")
    GeoParquetIO.write(withCell, path, partitionBy = Seq("cell"))
    // footers found recursively under cell=*/ dirs
    val meta = GeoParquetIO.readMeta(spark, path).get
    assert(meta.primaryColumn == "geometry")
    assert(meta.crs.contains("EPSG:3857"))
    assert(meta.fileBBoxes.nonEmpty)
    assert(meta.fileBBoxes.keys.forall(_.contains("cell=")), meta.fileBBoxes.keys.head)
    // full read roundtrips rows and the partition column
    val back = GeoParquetIO.read(spark, path)
    assert(back.df.count() == 500)
    assert(back.df.columns.contains("cell"))
    // pruned read returns the right rows and keeps the partition column
    val pruned = GeoParquetIO.readPruned(spark, path, 0, 0, 20, 100)
    val want = sample().df.filter($"x" <= 20).count()
    assert(pruned.df.count() == want)
    assert(pruned.df.columns.contains("cell"))
    // partitioning actually pruned whole files
    val hit = meta.fileBBoxes.values.count(_.intersects(graft.geom.Envelope(0, 0, 20, 100)))
    assert(hit < meta.fileBBoxes.size, s"expected file pruning, all $hit hit")
  }

  test("feather (arrow IPC) roundtrip preserves data, schema, crs, partitioning") {
    val path = tmpDir()
    val g0 = sample()
    val g = GeoDataFrame(g0.df.repartition(3)
        .withColumn("name", concat(lit("row-"), $"id"))
        .withColumn("flag", ($"id" % 2 === 0)),
      g0.geometryColumn).setCrs("EPSG:3857")
    GeoFeatherIO.write(g, path)
    // one .arrow file per partition, like the reference's to_feather
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".arrow"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val back = GeoFeatherIO.read(spark, path)
    assert(back.geometryColumn == "geometry")
    assert(back.crs.contains("EPSG:3857"))
    assert(back.df.count() == 500)
    assert(back.df.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(back.df.schema("flag").dataType == org.apache.spark.sql.types.BooleanType)
    val origSum = g.df.agg(sum($"x")).head().getDouble(0)
    val backSum = back.df.agg(sum($"x")).head().getDouble(0)
    assert(math.abs(origSum - backSum) < 1e-6)
    // geometry column survives as parseable WKB
    val n = back.df.filter(st_x($"geometry") >= 0).count()
    assert(n == 500)
    // strings and nulls roundtrip
    assert(back.df.filter($"name" === "row-7").count() == 1)
  }

  test("feather geoarrow point encoding: roundtrip, bbox, cross-read with WKB files") {
    val path = tmpDir()
    val g = GeoDataFrame(sample().df.repartition(2), "geometry").setCrs("EPSG:4326")
    GeoFeatherIO.write(g, path, encoding = "geoarrow")
    // the arrow schema really is FixedSizeList (zero-copy for arrow tools):
    // read back and verify values + bbox filtering work through the decode
    val back = GeoFeatherIO.read(spark, path)
    assert(back.crs.contains("EPSG:4326"))
    assert(back.df.count() == 500)
    val xs = back.df.select(sum(st_x($"geometry"))).head().getDouble(0)
    val want = g.df.select(sum($"x")).head().getDouble(0)
    assert(math.abs(xs - want) < 1e-6)
    val box = graft.geom.Envelope(0, 0, 50, 50)
    val pruned = GeoFeatherIO.read(spark, path, bbox = Some(box)).df.count()
    val expect = g.df.filter($"x" <= 50 && $"y" <= 50).count()
    assert(pruned == expect)
    // cross-read: drop a WKB-encoded file into the same dataset directory —
    // both encodings must decode side by side
    val wkbPath = tmpDir()
    val extra = GeoDataFrame(
      Seq((9000L, 1.0, 2.0)).toDF("id", "x", "y")
        .withColumn("geometry", st_point($"x", $"y")), "geometry").setCrs("EPSG:4326")
    GeoFeatherIO.write(extra, wkbPath, encoding = "WKB")
    val src = new java.io.File(wkbPath).listFiles().filter(_.getName.endsWith(".arrow")).head
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(path, "part-zz-wkb.arrow").toPath)
    val mixed = GeoFeatherIO.read(spark, path)
    assert(mixed.df.count() == 501)
    assert(mixed.df.filter($"id" === 9000L)
      .select(st_x($"geometry")).head().getDouble(0) == 1.0)
    // MIXED geometry types refuse the geoarrow encoding loudly (the
    // single-type rule): the layout follows the sampled first type, any
    // other type in the data fails the write
    val mixedTypes = GeoDataFrame(Seq(
        (1L, "POINT (1 2)"),
        (2L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("id", "wkt").withColumn("geometry", st_geomFromWKT($"wkt"))
      .select($"id", $"geometry").coalesce(1), "geometry")
    val ex = intercept[org.apache.spark.SparkException] {
      GeoFeatherIO.write(mixedTypes, tmpDir(), encoding = "geoarrow")
    }
    assert(ex.getMessage.contains("single-type") || ex.getCause != null)
  }

  test("feather geoarrow nested encodings: linestring/polygon/multi* roundtrip") {
    def wktFrame(wkts: Seq[String]) = GeoDataFrame(
      wkts.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "wkt").withColumn("geometry", st_geomFromWKT($"wkt"))
        .select($"id", $"geometry"), "geometry").setCrs("EPSG:4326")
    val cases: Seq[(String, Seq[String])] = Seq(
      "geoarrow.linestring" -> Seq(
        "LINESTRING (0 0, 1 2, 3 1)", "LINESTRING (5 5, 6 7, 8 9, 10 2)"),
      "geoarrow.multipoint" -> Seq(
        "MULTIPOINT ((1 1), (2 3))", "MULTIPOINT ((5 5), (6 6), (7 8))"),
      "geoarrow.polygon" -> Seq(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        // hole exercises the second ring
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
      "geoarrow.multilinestring" -> Seq(
        "MULTILINESTRING ((0 0, 1 1), (5 5, 6 7, 8 9))",
        "MULTILINESTRING ((2 2, 3 3))"),
      "geoarrow.multipolygon" -> Seq(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 7 5, 7 7, 5 5)))",
        "MULTIPOLYGON (((9 9, 10 9, 10 10, 9 9)))"))
    cases.foreach { case (expectedEnc, wkts) =>
      val path = tmpDir()
      val g = wktFrame(wkts)
      GeoFeatherIO.write(g, path, encoding = "geoarrow")
      val back = GeoFeatherIO.read(spark, path)
      assert(back.crs.contains("EPSG:4326"), expectedEnc)
      val got = back.df.orderBy($"id").select(st_asText($"geometry"))
        .collect().map(_.getString(0))
      val want = g.df.orderBy($"id").select(st_asText($"geometry"))
        .collect().map(_.getString(0))
      assert(got.toSeq == want.toSeq, expectedEnc)
    }
    // MULTI-BATCH nested write: offsets must restart cleanly after each
    // batch flush (vector reset) — 300 polygons at batchSize 64 forces 5
    // batches through the nested list writers
    val mb = tmpDir()
    val many = GeoDataFrame(
      (0 until 300).map { i =>
        val x = (i % 20) * 10.0; val y = (i / 20) * 10.0
        (i.toLong, s"POLYGON (($x $y, ${x + 4} $y, ${x + 4} ${y + 4}, $x ${y + 4}, $x $y))")
      }.toDF("id", "wkt").withColumn("geometry", st_geomFromWKT($"wkt"))
        .select($"id", $"geometry").coalesce(1), "geometry")
    GeoFeatherIO.write(many, mb, batchSize = 64, encoding = "geoarrow")
    val mbBack = GeoFeatherIO.read(spark, mb).df
      .select($"id", round(st_area($"geometry"), 6).as("a")).orderBy($"id").collect()
    assert(mbBack.length == 300)
    assert(mbBack.forall(_.getDouble(1) == 16.0),
      s"nested offsets corrupt after batch flush: ${mbBack.take(5).mkString(",")}")

    // bbox filtering through a nested cell: scan coordinates in place
    val path = tmpDir()
    GeoFeatherIO.write(wktFrame(Seq(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((100 100, 104 100, 104 104, 100 104, 100 100))")), path,
      encoding = "geoarrow")
    val hit = GeoFeatherIO.read(spark, path,
      bbox = Some(graft.geom.Envelope(1, 1, 3, 3))).df
    assert(hit.count() == 1)
    assert(hit.select($"id").head().getLong(0) == 0L)
  }

  test("feather cx re-plans as a footer-pruned bbox read; declines when nothing prunes") {
    // PRUNE path: range-partitioned on x, so part files carry disjoint
    // footer bboxes and a narrow window drops whole files
    val path = tmpDir()
    val g = GeoDataFrame(sample().df.repartitionByRange(4, $"x"), "geometry")
      .setCrs("EPSG:4326")
    GeoFeatherIO.write(g, path)
    val back = GeoFeatherIO.read(spark, path)
    assert(back.boxSource.exists(_.validFor(back.df)),
      "cx hook must be pinned to the final frame df")
    val window = back.cx(0, 0, 50, 50)
    assert(window.df.rdd.getNumPartitions < 4,
      s"expected footer file pruning, got ${window.df.rdd.getNumPartitions} tasks")
    val got = window.df.count()
    val want = g.df.filter($"x" >= 0 && $"x" <= 50 && $"y" >= 0 && $"y" <= 50).count()
    assert(got == want)
    assert(window.crs.contains("EPSG:4326"))

    // DECLINE path: every file intersects the window -> the hook returns
    // None and cx keeps the original scan (same task count), same rows
    val wide = back.cx(-1000, -1000, 1000, 1000)
    assert(wide.df.rdd.getNumPartitions == back.df.rdd.getNumPartitions,
      "no-prune window must keep the original scan")
    assert(wide.df.count() == g.df.count())

    // a bbox read must NOT install the hook (it would widen the window)
    assert(GeoFeatherIO.read(spark, path,
      bbox = Some(graft.geom.Envelope(0, 0, 10, 10))).boxSource.isEmpty)
  }

  test("feather: non-geometry double-pair column stays array<double>, never WKB") {
    // cross-read scenario: another Arrow tool writes a FixedSizeList<double>[2]
    // attribute (e.g. a [min,max] stats pair) with NO geo metadata declaring
    // it a geometry — the reader must surface it as array<double>, not
    // silently corrupt it into point blobs
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
    val dir = new java.io.File(tmpDir()); dir.mkdirs()
    val alloc = new RootAllocator()
    val child = new Field("item",
      FieldType.nullable(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    val schema = new ASchema(java.util.List.of(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("stats", FieldType.nullable(new ArrowType.FixedSizeList(2)),
        java.util.List.of(child))))
    val root = VectorSchemaRoot.create(schema, alloc)
    try {
      root.allocateNew()
      val idv = root.getVector("id").asInstanceOf[BigIntVector]
      val sv = root.getVector("stats").asInstanceOf[org.apache.arrow.vector.complex.FixedSizeListVector]
      val dv = sv.getDataVector.asInstanceOf[Float8Vector]
      (0 until 3).foreach { i =>
        idv.setSafe(i, i.toLong)
        sv.setNotNull(i)
        dv.setSafe(i * 2, i * 1.5)
        dv.setSafe(i * 2 + 1, i * 2.5 + 10)
      }
      root.setRowCount(3)
      val out = new java.io.FileOutputStream(new java.io.File(dir, "part-0.arrow"))
      val w = new ArrowFileWriter(root, null, out.getChannel)
      w.start(); w.writeBatch(); w.end(); w.close(); out.close()
    } finally { root.close(); alloc.close() }
    val back = GeoFeatherIO.read(spark, dir.getAbsolutePath)
    val f = back.df.schema("stats")
    assert(f.dataType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType), f.dataType.toString)
    val got = back.df.orderBy($"id").select($"stats").as[Seq[Double]].collect()
    assert(got(1) == Seq(1.5, 12.5), got.mkString(";"))
  }

  test("feather read streams multi-batch files; columns + bbox push into decode") {
    val path = tmpDir()
    val g0 = sample()
    val g = GeoDataFrame(g0.df.repartition(2)
        .withColumn("name", concat(lit("row-"), $"id")),
      g0.geometryColumn).setCrs("EPSG:3857")
    // batchSize 64 over 250 rows/partition -> several record batches per file
    GeoFeatherIO.write(g, path, batchSize = 64)

    // full read across batch boundaries
    val back = GeoFeatherIO.read(spark, path)
    assert(back.df.count() == 500)

    // column projection: only requested columns come back, geometry intact
    val proj = GeoFeatherIO.read(spark, path, columns = Seq("id", "geometry"))
    assert(proj.df.columns.toSeq == Seq("id", "geometry"))
    assert(proj.geometryColumn == "geometry")
    assert(proj.crs.contains("EPSG:3857"))
    assert(proj.df.count() == 500)

    // projection without geometry degrades to a plain wrapped frame
    val plain = GeoFeatherIO.read(spark, path, columns = Seq("id", "name"))
    assert(plain.df.columns.toSeq == Seq("id", "name"))
    assert(plain.df.count() == 500)

    // bbox filter drops rows at decode time, even when geometry not projected
    val box = graft.geom.Envelope(0, 0, 30, 30)
    val want = sample().df.filter($"x" <= 30 && $"y" <= 30).count()
    val filtered = GeoFeatherIO.read(spark, path, bbox = Some(box))
    assert(filtered.df.count() == want)
    val filteredProj = GeoFeatherIO.read(spark, path, columns = Seq("id"), bbox = Some(box))
    assert(filteredProj.df.columns.toSeq == Seq("id"))
    assert(filteredProj.df.count() == want)
  }

  test("feather attribute filters (DNF) drop rows at decode time") {
    val path = tmpDir()
    val g0 = sample()
    val g = GeoDataFrame(g0.df.repartition(2)
        .withColumn("name", concat(lit("row-"), $"id")),
      g0.geometryColumn).setCrs("EPSG:3857")
    GeoFeatherIO.write(g, path, batchSize = 64)

    // conjunction; numeric literals compare widened (Int literal vs Double col)
    val conj = GeoFeatherIO.read(spark, path,
      filters = Seq(Seq(("x", ">=", 10.0), ("x", "<", 40))))
    val wantConj = sample().df.filter($"x" >= 10 && $"x" < 40).count()
    assert(conj.df.count() == wantConj)

    // DNF: OR of two clauses
    val dnf = GeoFeatherIO.read(spark, path,
      filters = Seq(Seq(("x", "<", 5.0)), Seq(("x", ">", 90.0))))
    assert(dnf.df.count() == sample().df.filter($"x" < 5 || $"x" > 90).count())

    // string equality and `in`; the filter column need not be projected
    val one = GeoFeatherIO.read(spark, path, columns = Seq("id"),
      filters = Seq(Seq(("name", "=", "row-7"))))
    assert(one.df.columns.toSeq == Seq("id"))
    assert(one.df.count() == 1)
    val ins = GeoFeatherIO.read(spark, path,
      filters = Seq(Seq(("id", "in", Seq(1L, 2L, 3L)))))
    assert(ins.df.count() == 3)

    // filters compose with the bbox decode filter
    val both = GeoFeatherIO.read(spark, path,
      bbox = Some(graft.geom.Envelope(0, 0, 30, 30)),
      filters = Seq(Seq(("x", ">=", 10.0))))
    val wantBoth = sample().df.filter($"x" <= 30 && $"y" <= 30 && $"x" >= 10).count()
    assert(both.df.count() == wantBoth)

    // unknown column / unsupported op rejected at plan time, driver-side
    intercept[IllegalArgumentException] {
      GeoFeatherIO.read(spark, path, filters = Seq(Seq(("nope", "=", 1))))
    }
    intercept[IllegalArgumentException] {
      GeoFeatherIO.read(spark, path, filters = Seq(Seq(("x", "like", 1))))
    }
  }

  test("feather footer bboxes prune whole files on bbox reads") {
    val path = tmpDir()
    // hilbert-clustered partitions -> per-file extents much smaller than the
    // domain, so a tight bbox must drop files
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(8),
      calculatePartitions = false)
    GeoFeatherIO.write(g, path)
    val bx = GeoFeatherIO.fileBBoxes(spark, path)
    assert(bx.size == 8)
    val box = graft.geom.Envelope(0, 0, 15, 15)
    val hit = bx.values.count(_.intersects(box))
    assert(hit < 8, s"expected file pruning, all $hit hit")
    val got = GeoFeatherIO.read(spark, path, bbox = Some(box))
    val want = sample().df.filter($"x" <= 15 && $"y" <= 15).count()
    assert(got.df.count() == want)
    // empty-intersection bbox reads nothing but keeps the schema
    val none = GeoFeatherIO.read(spark, path, bbox = Some(graft.geom.Envelope(-500, -500, -400, -400)))
    assert(none.df.count() == 0)
    assert(none.df.columns.contains("geometry"))
  }

  test("readMeta gatherBBoxes=false skips per-file bbox gathering") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(4),
      calculatePartitions = false)
    GeoParquetIO.write(g, path)
    val meta = GeoParquetIO.readMeta(spark, path, gatherBBoxes = false).get
    assert(meta.primaryColumn == "geometry")
    assert(meta.crs.contains("EPSG:3857"))
    assert(meta.fileBBoxes.isEmpty)
  }

  test("read then cx prunes whole files from footer bboxes without a job") {
    val path = tmpDir()
    val g = sample().spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(8),
      calculatePartitions = false)
    GeoParquetIO.write(g, path)
    val back = GeoParquetIO.read(spark, path)
    assert(back.fileSource.exists(_.bboxes.size == 8))
    val allFiles = back.df.inputFiles.length

    // pruning is metadata-only: no Spark job may run while cx plans
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val pruned = try {
      val p = back.cx(0, 0, 15, 15)
      Thread.sleep(500) // let the async listener bus drain
      p
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0, s"cx launched ${jobs.get()} jobs — pruning must be metadata-only")

    assert(pruned.df.inputFiles.length < allFiles,
      s"expected fewer input files than $allFiles")
    val want = sample().df.filter($"x" <= 15 && $"y" <= 15).count()
    assert(pruned.df.count() == want)
  }

  test("geojsonseq roundtrip: features per line, properties as json, crs84") {
    val path = tmpDir()
    val g = GeoDataFrame(sample().df.repartition(3)
      .withColumn("name", concat(lit("row-"), $"id")), "geometry")
    GeoJsonIO.writeSeq(g, path)
    val back = GeoJsonIO.readSeq(spark, path)
    assert(back.crs.contains("OGC:CRS84"))
    assert(back.df.count() == 500)
    // coordinates survive exactly; properties parse back by schema
    val parsed = back.df.select(
      get_json_object($"properties", "$.id").cast("long").as("id"),
      st_x($"geometry").as("px"),
      get_json_object($"properties", "$.x").cast("double").as("x"))
    assert(parsed.filter($"px" =!= $"x").count() == 0)
    assert(parsed.select(sum($"id")).head().getLong(0) == (0L until 500L).sum)
  }

  test("read of plain parquet (no geo footer) degrades gracefully") {
    val path = tmpDir()
    Seq((1L, 2.0)).toDF("id", "v").write.parquet(path)
    val g = GeoParquetIO.read(spark, path)
    assert(g.df.count() == 1)
  }
}
