package graft.io

import graft.geom.{GeometryCollection, LineString, MultiLineString, MultiPoint,
  MultiPolygon, Point, Polygon, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FlatGeobufIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpFile(): String = {
    val f = java.io.File.createTempFile("fgbspec", ".fgb")
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("packed R-tree level math matches the flatbush family layout") {
    // 179 leaves at node size 16: levels 179, 12, 1 -> 192 nodes,
    // leaves occupy [13, 192), root is node 0
    val lb = FlatGeobufIO.PackedRTree.levelBounds(179L, 16)
    assert(lb(0) == ((13L, 192L)))
    assert(lb.last == ((0L, 1L)))
    assert(FlatGeobufIO.PackedRTree.numNodes(179L, 16) == 192L)
    assert(FlatGeobufIO.PackedRTree.numNodes(1L, 16) == 1L)
    assert(FlatGeobufIO.PackedRTree.indexSize(179L, 16) == 192L * 40)
  }

  test("R-tree search over a built index finds exactly the intersecting leaves") {
    // 100 unit squares along the diagonal, feature i at [i, i+1]^2
    val items = Array.tabulate(100) { i =>
      (i.toDouble, i.toDouble, i + 1.0, i + 1.0, i.toLong * 10)
    }
    val bytes = FlatGeobufIO.PackedRTree.build(items, 16)
    def readAt(off: Long, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len)
    val hits = FlatGeobufIO.PackedRTree.search(readAt, 100L, 16, 40.5, 40.5, 43.5, 43.5)
    // squares 40..43 intersect the window
    assert(hits.map(_._2).toSeq == Seq(40L, 41L, 42L, 43L))
    assert(hits.map(_._1).toSeq == Seq(400L, 410L, 420L, 430L))
    // far-outside window: nothing
    assert(FlatGeobufIO.PackedRTree.search(readAt, 100L, 16, 500, 500, 600, 600).isEmpty)
  }

  test("geometry codec roundtrips every geometry family") {
    val geoms: Seq[graft.geom.Geometry] = Seq(
      Point(1.5, -2.25),
      LineString(Array(0.0, 0.0, 1.0, 2.0, 3.0, 1.0)),
      Polygon(Array(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0))),
      // polygon with a hole exercises the ends vector
      Polygon(Array(
        Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0),
        Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0, 2.0, 2.0))),
      MultiPoint(Array(Point(1, 1), Point(2, 3))),
      MultiLineString(Array(
        LineString(Array(0.0, 0.0, 1.0, 1.0)),
        LineString(Array(5.0, 5.0, 6.0, 7.0, 8.0, 9.0)))),
      MultiPolygon(Array(
        Polygon(Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0))),
        Polygon(Array(Array(5.0, 5.0, 7.0, 5.0, 7.0, 7.0, 5.0, 5.0))))),
      GeometryCollection(Array(
        Point(9, 9),
        LineString(Array(0.0, 1.0, 2.0, 3.0)))))
    geoms.foreach { g =>
      val b = new FlatGeobufIO.FbBuilder(64)
      val off = FlatGeobufIO.writeGeometry(b, g)
      val bytes = b.finish(off)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val t = new FlatGeobufIO.FbTable(bb, bb.getInt(0))
      val back = FlatGeobufIO.readGeometry(t, FlatGeobufIO.GtUnknown)
      assert(Wkb.write(back).toSeq == Wkb.write(g).toSeq, s"mismatch for $g")
    }
  }

  test("file roundtrip: mixed attribute types incl. nulls, hilbert-reordered") {
    val path = tmpFile()
    val rows = (0 until 200).map { i =>
      (i.toLong, s"name_$i", i * 1.5, i % 2 == 0,
        if (i % 7 == 0) null else s"note_${i % 13}",
        Wkb.write(Point(i * 3.25 - 100.0, (i % 100) * 7.5)))
    }
    val df = rows.toDF("id", "nm", "score", "flag", "note", "geometry")
    val gdf = graft.api.GeoDataFrame(df, "geometry").setCrs("EPSG:4326")
    FlatGeobufIO.write(gdf, path, name = "pts", nodeSize = 16)

    val meta = FlatGeobufIO.readMeta(spark, path)
    assert(meta.name == "pts")
    assert(meta.featuresCount == 200L)
    assert(meta.nodeSize == 16)
    assert(meta.crs.contains("EPSG:4326"))
    assert(meta.columns.map(_.name).toSeq == Seq("id", "nm", "score", "flag", "note"))

    val back = FlatGeobufIO.read(spark, path, chunkSize = 13)
    assert(back.schema.fieldNames.toSeq == Seq("id", "nm", "score", "flag", "note", "geometry"))
    assert(back.count() == 200)
    val got = back
      .select($"id", $"nm", $"score", $"flag", $"note",
        expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .orderBy($"id")
      .collect()
    rows.zip(got).foreach { case ((id, nm, score, flag, note, _), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == nm)
      assert(r.getDouble(2) == score)
      assert(r.getBoolean(3) == flag)
      assert(r.getString(4) == note)
      assert(r.getDouble(5) == id * 3.25 - 100.0)
      assert(r.getDouble(6) == (id % 100) * 7.5)
    }
  }

  test("bbox read prunes chunks through the index and matches a full-scan filter") {
    val path = tmpFile()
    // 30x30 grid of points
    val rows = (0 until 900).map { i =>
      (i.toLong, Wkb.write(Point((i % 30).toDouble, (i / 30).toDouble)))
    }
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry"),
      path, nodeSize = 8)
    val window = (3.5, 3.5, 8.5, 8.5)
    val pruned = FlatGeobufIO.read(spark, path, chunkSize = 16, bbox = Some(window))
      .select($"id").as[Long].collect().sorted
    val full = FlatGeobufIO.read(spark, path)
      .select($"id", expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .filter($"x" >= 3.5 && $"x" <= 8.5 && $"y" >= 3.5 && $"y" <= 8.5)
      .select($"id").as[Long].collect().sorted
    assert(pruned.toSeq == full.toSeq)
    assert(pruned.length == 25) // 5x5 interior points

    // the tree really pruned: candidate leaves ≪ total features
    val meta = FlatGeobufIO.readMeta(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      def readAt(off: Long, len: Int): Array[Byte] = {
        val a = new Array[Byte](len)
        in.readFully(meta.headerEnd + off, a)
        a
      }
      val hits = FlatGeobufIO.PackedRTree.search(
        readAt, meta.featuresCount, meta.nodeSize, 3.5, 3.5, 8.5, 8.5)
      assert(hits.length >= 25 && hits.length < 200,
        s"index should prune most of 900 features, got ${hits.length} candidates")
    } finally in.close()
  }

  test("mixed geometry types in one file read back via per-feature type bytes") {
    val path = tmpFile()
    val geoms: Seq[(Long, Array[Byte])] = Seq(
      1L -> Wkb.write(Point(0, 0)),
      2L -> Wkb.write(LineString(Array(0.0, 0.0, 5.0, 5.0))),
      3L -> Wkb.write(Polygon(Array(Array(0.0, 0.0, 2.0, 0.0, 2.0, 2.0, 0.0, 0.0)))),
      4L -> Wkb.write(MultiPolygon(Array(
        Polygon(Array(Array(3.0, 3.0, 4.0, 3.0, 4.0, 4.0, 3.0, 3.0)))))))
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(geoms.toDF("id", "geometry"), "geometry"), path)
    val back = FlatGeobufIO.read(spark, path)
      .select($"id", expr("st_geometrytype(geometry)").as("gt"))
      .orderBy($"id").collect()
    assert(back.map(_.getString(1)).toSeq ==
      Seq("Point", "LineString", "Polygon", "MultiPolygon"))
  }

  test("withIndex=false writes a readable unindexed file (single sequential chunk)") {
    val path = tmpFile()
    val rows = (0 until 50).map(i => (i.toLong, Wkb.write(Point(i, -i))))
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry"),
      path, withIndex = false)
    val meta = FlatGeobufIO.readMeta(spark, path)
    assert(meta.nodeSize == 0)
    assert(meta.indexSize == 0L)
    val back = FlatGeobufIO.read(spark, path)
    assert(back.count() == 50)
    assert(back.rdd.getNumPartitions == 1) // no random access without an index
  }

  test("api wrappers: toFlatGeobuf/readFlatGeobuf carry CRS; readFile dispatches") {
    val path = tmpFile()
    val rows = (0 until 30).map(i => (i.toLong, Wkb.write(Point(i, i * 2.0))))
    val gdf = graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry")
      .setCrs("EPSG:3857")
    gdf.toFlatGeobuf(path, name = "wrap")
    val back = graft.api.GeoDataFrame.readFlatGeobuf(spark, path)
    assert(back.crs.contains("EPSG:3857"))
    assert(back.df.count() == 30)
    // extension dispatch lands on the same reader
    val viaDispatch = graft.api.GeoDataFrame.readFile(spark, path)
    assert(viaDispatch.crs.contains("EPSG:3857"))
    assert(viaDispatch.df.count() == 30)
    intercept[IllegalArgumentException] {
      graft.api.GeoDataFrame.readFile(spark, "/tmp/nope.xyz")
    }
  }

  test("cx on a FlatGeobuf read re-plans through the packed R-tree") {
    val path = tmpFile()
    val rows = (0 until 900).map { i =>
      (i.toLong, Wkb.write(Point((i % 30).toDouble, (i / 30).toDouble)))
    }
    // CRS on the file: setCrs rewrites the frame's df, so this guards the
    // hook being pinned to the FINAL frame (a pre-setCrs pin dies silently)
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry")
        .setCrs("EPSG:4326"),
      path, nodeSize = 8)
    val gdf = graft.api.GeoDataFrame.readFlatGeobuf(spark, path, chunkSize = 32)
    assert(gdf.crs.contains("EPSG:4326"))
    assert(gdf.boxSource.exists(_.validFor(gdf.df)),
      "cx hook must be identity-pinned to the frame's final df")
    val fullParts = gdf.df.rdd.getNumPartitions
    val window = gdf.cx(3.5, 3.5, 8.5, 8.5)
    // pruned re-plan: fewer scan tasks than the full chunked read
    assert(window.df.rdd.getNumPartitions < fullParts,
      s"expected pruned read, got ${window.df.rdd.getNumPartitions} of $fullParts tasks")
    val ids = window.df.select($"id").as[Long].collect().sorted
    assert(ids.length == 25)
    // matches the unpruned exact path: same frame with the hook disabled
    val unpruned = gdf.copy(boxSource = None).cx(3.5, 3.5, 8.5, 8.5)
      .df.select($"id").as[Long].collect().sorted
    assert(ids.toSeq == unpruned.toSeq)
    // a derived frame must NOT re-plan (identity pin), or a filter placed
    // before cx would be silently dropped by the fresh scan
    val derived = graft.api.GeoDataFrame(gdf.df.filter($"id" % 2 === 0), "geometry",
      boxSource = gdf.boxSource)
    val dIds = derived.cx(3.5, 3.5, 8.5, 8.5).df.select($"id").as[Long].collect().sorted
    assert(dIds.toSeq == ids.filter(_ % 2 == 0).toSeq)
  }

  test("directory write/read: per-task part files, whole-file bbox pruning") {
    val d = java.nio.file.Files.createTempDirectory("fgbdir").toFile
    d.deleteOnExit()
    val dir = d.getAbsolutePath + "/parts"
    // 4 partitions with DISJOINT x-extents: partition p covers x in [100p, 100p+90]
    val rows = (0 until 400).map { i =>
      val p = i % 4
      (i.toLong, Wkb.write(Point(100.0 * p + (i / 4) % 91, (i % 50).toDouble)))
    }
    // range partitioning puts each id%4 group in its own partition (hash
    // repartition can collide two groups into one partition)
    val df = rows.toDF("id", "geometry").repartitionByRange(4, $"id" % 4)
    graft.api.GeoDataFrame(df, "geometry").setCrs("EPSG:4326").toFlatGeobufDir(dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".fgb"))
    assert(parts.length == 4)

    // full read returns everything; crs flows from the first part's header
    val gdf = graft.api.GeoDataFrame.readFlatGeobuf(spark, dir)
    assert(gdf.crs.contains("EPSG:4326"))
    assert(gdf.df.count() == 400)

    // a window inside one partition's extent prunes the other FILES from
    // their header envelopes alone: the read plans tasks for 1 part only
    val window = FlatGeobufIO.read(spark, dir, bbox = Some((210.0, 0.0, 280.0, 60.0)))
    assert(window.rdd.getNumPartitions <= 4,
      s"expected header-envelope file pruning + gap-merged runs, " +
        s"got ${window.rdd.getNumPartitions} tasks")
    val ids = window.select($"id").as[Long].collect().sorted
    val expect = rows.collect {
      case (id, wkb) if {
        val e = Wkb.envelopeOf(wkb)
        e.minX >= 210.0 && e.maxX <= 280.0
      } => id
    }.sorted
    assert(ids.toSeq == expect.toSeq)

    // cx on the directory read re-plans through the same pruning
    val viaCx = gdf.cx(210.0, 0.0, 280.0, 60.0).df.select($"id").as[Long].collect().sorted
    assert(viaCx.toSeq == expect.toSeq)
  }

  test("randomized roundtrip sweep: 200 mixed geometries + attrs survive bytes-exact") {
    val rnd = new scala.util.Random(20260813)
    def pt() = Point(rnd.nextDouble() * 1000 - 500, rnd.nextDouble() * 1000 - 500)
    def ls(n: Int) = LineString(Array.fill(2 * n)(rnd.nextDouble() * 100))
    def ring(cx: Double, cy: Double, r: Double, n: Int): Array[Double] = {
      // closed CCW ring
      val xy = new Array[Double](2 * (n + 1))
      for (i <- 0 to n) {
        val a = 2 * math.Pi * i / n
        xy(2 * i) = cx + r * math.cos(a); xy(2 * i + 1) = cy + r * math.sin(a)
      }
      xy
    }
    def poly(holes: Int) = {
      val cx = rnd.nextDouble() * 200; val cy = rnd.nextDouble() * 200
      Polygon(Array(ring(cx, cy, 10 + rnd.nextDouble() * 5, 3 + rnd.nextInt(6))) ++
        Array.fill(holes)(ring(cx, cy, 1 + rnd.nextDouble(), 3 + rnd.nextInt(3))))
    }
    val geoms: Seq[graft.geom.Geometry] = (0 until 200).map { i =>
      rnd.nextInt(7) match {
        case 0 => pt()
        case 1 => ls(2 + rnd.nextInt(10))
        case 2 => poly(rnd.nextInt(3))
        case 3 => MultiPoint(Array.fill(1 + rnd.nextInt(5))(pt()))
        case 4 => MultiLineString(Array.fill(1 + rnd.nextInt(4))(ls(2 + rnd.nextInt(5))))
        case 5 => MultiPolygon(Array.fill(1 + rnd.nextInt(3))(poly(rnd.nextInt(2))))
        case 6 => GeometryCollection(Array(pt(), ls(3), poly(0)))
      }
    }
    val path = tmpFile()
    val rows = geoms.zipWithIndex.map { case (g, i) =>
      (i.toLong, if (i % 11 == 0) null else s"attr_$i", rnd.nextDouble(), Wkb.write(g))
    }
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(rows.toDF("id", "tag", "w", "geometry"), "geometry"),
      path, nodeSize = 5)
    val back = FlatGeobufIO.read(spark, path, chunkSize = 17)
      .select($"id", $"tag", $"w", $"geometry").orderBy($"id").collect()
    assert(back.length == 200)
    rows.sortBy(_._1).zip(back).foreach { case ((id, tag, w, wkb), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == tag, s"tag mismatch id=$id")
      assert(r.getDouble(2) == w)
      assert(r.getAs[Array[Byte]](3).toSeq == wkb.toSeq, s"geometry bytes differ id=$id")
    }
    // random windows: pruned read == full-scan envelope filter, every time
    for (_ <- 0 until 10) {
      val x0 = rnd.nextDouble() * 800 - 500; val y0 = rnd.nextDouble() * 800 - 500
      val (x1, y1) = (x0 + rnd.nextDouble() * 300, y0 + rnd.nextDouble() * 300)
      val got = FlatGeobufIO.read(spark, path, bbox = Some((x0, y0, x1, y1)))
        .select($"id").as[Long].collect().sorted
      val want = rows.collect {
        case (id, _, _, wkb) if {
          val e = Wkb.envelopeOf(wkb)
          e.minX <= x1 && e.maxX >= x0 && e.minY <= y1 && e.maxY >= y0
        } => id
      }.sorted
      assert(got.toSeq == want.toSeq, s"window ($x0,$y0,$x1,$y1)")
    }
  }

  test("readFile dispatches a directory by the extension of its contents") {
    val d = java.nio.file.Files.createTempDirectory("fgbdisp").toFile
    d.deleteOnExit()
    val dir = d.getAbsolutePath + "/parts"
    val rows = (0 until 20).map(i => (i.toLong, Wkb.write(Point(i, i))))
    graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry")
      .setCrs("EPSG:4326").toFlatGeobufDir(dir)
    val g = graft.api.GeoDataFrame.readFile(spark, dir + "/")
    assert(g.df.count() == 20)
    assert(g.crs.contains("EPSG:4326"))
  }

  test("empty frame writes a valid header-only file that reads back empty") {
    val path = tmpFile()
    val df = Seq.empty[(Long, Array[Byte])].toDF("id", "geometry")
    FlatGeobufIO.write(graft.api.GeoDataFrame(df, "geometry"), path)
    val meta = FlatGeobufIO.readMeta(spark, path)
    assert(meta.featuresCount == 0L)
    assert(meta.columns.map(_.name).toSeq == Seq("id"))
    val back = FlatGeobufIO.read(spark, path)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "geometry"))
  }

  test("columns= prunes attributes but keeps geometry") {
    val path = tmpFile()
    val rows = (0 until 40).map { i =>
      (i.toLong, s"n_$i", i * 2.0, Wkb.write(Point(i, i)))
    }
    FlatGeobufIO.write(
      graft.api.GeoDataFrame(rows.toDF("id", "nm", "score", "geometry"), "geometry"), path)
    val back = FlatGeobufIO.read(spark, path, columns = Some(Seq("id", "score")))
    assert(back.schema.fieldNames.toSeq == Seq("id", "score", "geometry"))
    assert(back.agg(sum($"score")).head().getDouble(0) == (0 until 40).map(_ * 2.0).sum)
    intercept[IllegalArgumentException] {
      FlatGeobufIO.read(spark, path, columns = Some(Seq("nope")))
    }
  }
}
