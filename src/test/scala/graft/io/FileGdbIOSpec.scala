package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ESRI File Geodatabase (.gdb): roundtrip across geometry classes +
  * null-geometry rows + attribute types (incl. nulls and timestamps),
  * quantization behavior, catalog/layer selection, chunked distributed
  * reads, and the read_file dispatcher route. (No GDAL in this sandbox —
  * see FileGdbIO's validation caveat; layouts follow the published
  * rouault/dump_gdbtable spec.)
  */
class FileGdbIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpGdb(): String =
    java.nio.file.Files.createTempDirectory("fgdb").toString + "/data.gdb"

  private def sample() = {
    val wkts = Seq(
      (1L, "alpha", 2.5, "POINT (10.25 20.5)"),
      (2L, "beta", -1.0, "LINESTRING (0 0, 5.5 0, 5.5 9.25)"),
      (3L, "gamma", 0.0,
        "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
      (4L, null, 123.456789,
        "MULTIPOLYGON (((20 20, 26 20, 26 26, 20 26, 20 20)), ((40 0, 44 0, 44 4, 40 0)))"),
      (5L, "eps", 7.0, "MULTILINESTRING ((0 30, 3 33), (5 35, 9 39, 9 30))"),
      (6L, "zeta", -3.25, "MULTIPOINT ((1 1), (2 3), (4 5))"),
      (7L, "none-row", 9.5, null))
    val df = wkts.toDF("id", "name", "w", "wkt")
      .withColumn("geometry",
        when($"wkt".isNotNull, st_geomFromWKT($"wkt")).otherwise(lit(null)))
      .drop("wkt")
    GeoDataFrame(df)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select($"id".cast("long").as("id"), $"name", $"w",
      when($"geometry".isNull, "NONE")
        .otherwise(st_asText(st_normalize($"geometry"))).as("g"))
    .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq

  test("roundtrip: geometry classes, null rows, attributes, objectid, crs") {
    val src = sample()
    val gdb = tmpGdb()
    FileGdbIO.write(src.df, gdb, layerName = "features", crs = Some("EPSG:4326"))
    val files = new java.io.File(gdb).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // drop Hadoop-local .crc sidecars
    assert(files.toSeq == Seq("a00000001.gdbtable", "a00000001.gdbtablx",
      "a00000002.gdbtable", "a00000002.gdbtablx",
      "a00000003.gdbtable", "a00000003.gdbtablx",
      "a00000004.gdbtable", "a00000004.gdbtablx",
      "a00000005.gdbtable", "a00000005.gdbtablx",
      "a00000005.gspx"), files.mkString(","))
    val back = FileGdbIO.read(spark, gdb)
    assert(back.crs.contains("EPSG:4326"))
    // OBJECTID surfaces as a long column, dense 1..n
    assert(back.df.select(sum($"OBJECTID")).head().getLong(0) == 28L)
    assert(canon(back.df) == canon(src.df))
  }

  test("quantization: coordinates snap to 1/xyScale, exact at 1e-9") {
    val gdb = tmpGdb()
    val src = Seq((1L, 12.123456789, 45.987654321))
      .toDF("id", "x", "y").withColumn("geometry", st_point($"x", $"y"))
      .drop("x", "y")
    FileGdbIO.write(src, gdb, xyScale = 1e9)
    val r = FileGdbIO.read(spark, gdb).df
      .select(st_x($"geometry"), st_y($"geometry")).head()
    assert(math.abs(r.getDouble(0) - 12.123456789) < 1e-9)
    assert(math.abs(r.getDouble(1) - 45.987654321) < 1e-9)
  }

  test("chunked distributed read: many tasks, same rows") {
    val gdb = tmpGdb()
    val n = 3000
    val src = (1 to n).map(i => (i.toLong, s"r$i", i * 0.5))
      .toDF("id", "name", "v")
      .withColumn("geometry", st_point($"id" * 1.0, $"id" * 2.0))
    FileGdbIO.write(src, gdb)
    val back = FileGdbIO.read(spark, gdb, chunkSize = 256)
    assert(back.df.rdd.getNumPartitions == (n + 255) / 256)
    assert(back.df.count() == n)
    val got = back.df.select(sum($"id"), sum(st_x($"geometry"))).head()
    assert(got.getLong(0) == n.toLong * (n + 1) / 2)
    assert(math.abs(got.getDouble(1) - n.toLong * (n + 1) / 2.0) < 1e-6)
  }

  test("out-of-order tablx offsets fall back to positioned reads") {
    val gdb = tmpGdb()
    val src = (1 to 10).map(i => (i.toLong, s"r$i"))
      .toDF("id", "name")
      .withColumn("geometry", st_point($"id" * 1.0, lit(0.0)))
    FileGdbIO.write(src, gdb)
    // swap the first two row offsets in the tablx (an edited gdb shape):
    // 5-byte LE entries at byte 16 and 21
    val tablx = new java.io.File(gdb, "a00000005.gdbtablx")
    val bytes = java.nio.file.Files.readAllBytes(tablx.toPath)
    val tmp = new Array[Byte](5)
    System.arraycopy(bytes, 16, tmp, 0, 5)
    System.arraycopy(bytes, 21, bytes, 16, 5)
    System.arraycopy(tmp, 0, bytes, 21, 5)
    java.nio.file.Files.write(tablx.toPath, bytes)
    // the out-of-band edit invalidates Hadoop-local's .crc sidecar
    new java.io.File(gdb, ".a00000005.gdbtablx.crc").delete()
    val back = FileGdbIO.read(spark, gdb).df
      .select($"OBJECTID", $"id".cast("long"), st_x($"geometry"))
      .collect().sortBy(_.getLong(0))
    assert(back.length == 10)
    // content follows the offsets: objectid 1 now carries row id=2
    assert(back(0).getLong(1) == 2L && back(1).getLong(1) == 1L)
    assert(back(0).getDouble(2) == 2.0 && back(1).getDouble(2) == 1.0)
    (2 until 10).foreach(k => assert(back(k).getLong(1) == k + 1L))
  }

  test("catalog: layer selection by name; unknown layer errors with names") {
    val gdb = tmpGdb()
    FileGdbIO.write(sample().df, gdb, layerName = "parcels")
    val cat = FileGdbIO.catalog(spark.sessionState.newHadoopConf(), gdb)
    assert(cat.map(_._2).toSet == Set("GDB_SystemCatalog", "GDB_DBTune",
      "GDB_SpatialRefs", "GDB_Items", "parcels"))
    assert(FileGdbIO.read(spark, gdb, layer = Some("PARCELS")).df.count() == 7)
    val e = intercept[IllegalArgumentException](
      FileGdbIO.read(spark, gdb, layer = Some("nope")))
    assert(e.getMessage.contains("parcels"))
  }

  test("timestamps roundtrip through the 1899-12-30 float64 epoch") {
    val gdb = tmpGdb()
    val src = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-06-15 12:34:56")),
      (2L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "ts")
      .withColumn("geometry", st_point($"id" * 1.0, lit(0.0)))
    FileGdbIO.write(src, gdb)
    val back = FileGdbIO.read(spark, gdb).df
      .select($"id".cast("long"), $"ts").collect().sortBy(_.getLong(0))
    assert(back(0).getTimestamp(1) == java.sql.Timestamp.valueOf("2020-06-15 12:34:56"))
    assert(back(1).get(1) == null)
  }

  test("Z geometries roundtrip (pointZ / polylineZ payloads, 1e-4 z grid)") {
    val gdb = tmpGdb()
    val src = Seq(
      (1L, "POINT Z (1.5 2.5 30.25)"),
      (2L, "LINESTRING Z (0 0 1, 3 4 2.5, 6 4 -3)"),
      (3L, "POINT (9 9)")) // XY row in the same layer stays XY
      .toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")
    FileGdbIO.write(src, gdb)
    val got = FileGdbIO.read(spark, gdb).df
      .select($"id".cast("long"), st_asText($"geometry"))
      .as[(Long, String)].collect().sortBy(_._1).toMap
    assert(got(1L) == "POINT Z (1.5 2.5 30.25)")
    assert(got(2L) == "LINESTRING Z (0 0 1, 3 4 2.5, 6 4 -3)")
    assert(got(3L) == "POINT (9 9)")
  }

  test("sparse .gdbtablx refuses loudly instead of misattributing rows") {
    val gdb = tmpGdb()
    FileGdbIO.write(sample().df, gdb)
    val tablx = new java.io.File(gdb, "a00000005.gdbtablx")
    val bytes = java.nio.file.Files.readAllBytes(tablx.toPath)
    // zero the 1024-block count (header bytes 4-7) -> blocks*1024 < rows
    bytes(4) = 0; bytes(5) = 0; bytes(6) = 0; bytes(7) = 0
    java.nio.file.Files.write(tablx.toPath, bytes)
    new java.io.File(gdb, ".a00000005.gdbtablx.crc").delete()
    val e = intercept[IllegalArgumentException](
      FileGdbIO.read(spark, gdb).df.count())
    assert(e.getMessage.contains("sparse"))
  }

  test("zipped .gdb dispatches through the .zip route") {
    val gdb = tmpGdb()
    FileGdbIO.write(sample().df, gdb, layerName = "zipped")
    val zip = gdb.stripSuffix("data.gdb") + "data_gdb.zip"
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zip))
    new java.io.File(gdb).listFiles().filterNot(_.getName.startsWith(".")).foreach { f =>
      zout.putNextEntry(new java.util.zip.ZipEntry("data.gdb/" + f.getName))
      java.nio.file.Files.copy(f.toPath, zout)
      zout.closeEntry()
    }
    zout.close()
    val back = GeoDataFrame.readFile(spark, zip)
    assert(back.df.count() == 7)
  }

  test("GeoDataFrame.toFileGdb carries the frame's CRS") {
    val gdb = tmpGdb()
    graft.api.GeoDataFrame(sample().df).setCrs("EPSG:3857")
      .toFileGdb(gdb, "export")
    val back = FileGdbIO.read(spark, gdb, layer = Some("export"))
    assert(back.crs.contains("EPSG:3857"))
    assert(back.df.count() == 7)
  }

  test("writeLayers: multi-layer gdb, layer selection reads each back") {
    val gdb = tmpGdb()
    val pts = (1 to 20).map(i => (i.toLong, s"p$i"))
      .toDF("id", "name").withColumn("geometry", st_point($"id" * 1.0, lit(0.0)))
    val boxes = (1 to 5).map(i => (i.toLong, i * 2.0))
      .toDF("id", "w").withColumn("geometry",
        st_makeEnvelope(lit(0.0), lit(0.0), $"w", $"w"))
    FileGdbIO.writeLayers(Seq("points" -> pts, "boxes" -> boxes), gdb,
      crs = Some("EPSG:4326"))
    val cat = FileGdbIO.catalog(spark.sessionState.newHadoopConf(), gdb)
    assert(cat.map(_._2) == Seq("GDB_SystemCatalog", "GDB_DBTune",
      "GDB_SpatialRefs", "GDB_Items", "points", "boxes"))
    assert(FileGdbIO.read(spark, gdb, layer = Some("points")).df.count() == 20)
    val area = FileGdbIO.read(spark, gdb, layer = Some("boxes")).df
      .select(sum(st_area($"geometry"))).head().getDouble(0)
    assert(math.abs(area - (1 to 5).map(i => 4.0 * i * i).sum) < 1e-6)
    // no-layer default refuses with the layer names
    val e = intercept[IllegalArgumentException](FileGdbIO.read(spark, gdb))
    assert(e.getMessage.contains("points") && e.getMessage.contains("boxes"))
  }

  test("GDB_Items-driven layer discovery (the OpenFileGDB route) finds " +
      "written layers, incl. XML-special names, and reads through them") {
    val gdb = tmpGdb()
    val weird = "a&b <x>'\"" // must be XML-escaped in the Definition doc
    val pts = (1 to 20).map(i => (i.toLong, s"p$i"))
      .toDF("id", "name").withColumn("geometry", st_point($"id" * 1.0, lit(0.0)))
    val boxes = (1 to 5).map(i => (i.toLong, i * 2.0))
      .toDF("id", "w").withColumn("geometry",
        st_makeEnvelope(lit(0.0), lit(0.0), $"w", $"w"))
    FileGdbIO.writeLayers(Seq("roads" -> pts, weird -> boxes), gdb)
    val conf = spark.sessionState.newHadoopConf()
    // discovery goes through the Definition XML (a real parse — malformed
    // escaping would fail here), NOT GDB_SystemCatalog name filtering
    val items = FileGdbIO.layersFromItems(conf, gdb)
    assert(items.map(_._1).toSet == Set("roads", weird))
    assert(items.forall(_._3), "both layers registered as feature classes")
    // the Items name must round back through the ordinary layer read
    items.foreach { case (name, tablePath, _) =>
      assert(new java.io.File(tablePath.stripPrefix("file:")).exists(),
        s"Items maps '$name' to a missing table file $tablePath")
      val n = FileGdbIO.read(spark, gdb, layer = Some(name)).df.count()
      assert(n == (if (name == "roads") 20 else 5))
    }
    // public listing prefers the Items route when file 4 exists
    assert(FileGdbIO.listLayers(spark, gdb).map(_._1).toSet ==
      Set("roads", weird))
  }

  test("bbox read: layer-extent whole prune + exact residual; cx re-plans") {
    val gdb = tmpGdb()
    val src = (1 to 100).map(i => (i.toLong, i * 1.0))
      .toDF("id", "x").withColumn("geometry", st_point($"x", $"x" * 2.0))
      .drop("x")
    FileGdbIO.write(src, gdb)
    // residual: x in [10,20] -> ids 10..20
    val got = FileGdbIO.read(spark, gdb, bbox = Some((10.0, 0.0, 20.0, 100.0)))
      .df.select($"id".cast("long")).as[Long].collect().sorted
    assert(got.toSeq == (10L to 20L))
    // disjoint window: exact residual returns zero rows by default; with
    // the opt-in extent trust the whole layer prunes to zero chunk tasks
    val resid = FileGdbIO.read(spark, gdb, bbox = Some((5000.0, 5000.0, 6000.0, 6000.0)))
    assert(resid.df.count() == 0)
    spark.conf.set("spark.graft.gdb.pruneOnExtent", "true")
    try {
      val pruned = FileGdbIO.read(spark, gdb,
        bbox = Some((5000.0, 5000.0, 6000.0, 6000.0)))
      assert(pruned.df.rdd.getNumPartitions <= 1 && pruned.df.count() == 0)
    } finally spark.conf.unset("spark.graft.gdb.pruneOnExtent")
    // cx over the dispatcher route re-plans through the bbox read
    val g = GeoDataFrame.readFile(spark, gdb)
    val cxGot = g.cx(10.0, 0.0, 20.0, 100.0).df
      .select($"id".cast("long")).as[Long].collect().sorted
    assert(cxGot.toSeq == (10L to 20L))
  }

  test("fuzz: 200 random geometries roundtrip within the 1e-9 grid") {
    val rnd = new scala.util.Random(20260816)
    def coord(): Double = (rnd.nextDouble() * 2000 - 1000) +
      rnd.nextInt(1000) * 1e-6
    def ring(cx: Double, cy: Double, r: Double, n: Int): String =
      (0 to n).map { k =>
        val a = 2 * math.Pi * (k % n) / n
        s"${cx + r * math.cos(a)} ${cy + r * math.sin(a)}"
      }.mkString("(", ", ", ")")
    val wkts = (0 until 200).map { i =>
      i % 5 match {
        case 0 => s"POINT (${coord()} ${coord()})"
        case 1 => s"LINESTRING (${coord()} ${coord()}, ${coord()} ${coord()}, ${coord()} ${coord()})"
        case 2 => s"POLYGON (${ring(coord(), coord(), 1 + rnd.nextInt(50), 3 + rnd.nextInt(8))})"
        case 3 => s"MULTIPOINT ((${coord()} ${coord()}), (${coord()} ${coord()}))"
        case 4 =>
          val c1 = (coord(), coord()); val c2 = (coord() + 500, coord() + 500)
          s"MULTIPOLYGON ((${ring(c1._1, c1._2, 2, 4)}), (${ring(c2._1, c2._2, 3, 5)}))"
      }
    }
    val gdb = tmpGdb()
    val src = wkts.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "wkt").withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")
    FileGdbIO.write(src, gdb)
    val back = FileGdbIO.read(spark, gdb, chunkSize = 64).df
      .select($"id".cast("long"), st_asText(st_normalize($"geometry")))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 200)
    val want = spark.createDataset(wkts.zipWithIndex.map { case (w, i) => (i.toLong, w) })
      .select($"_1", st_asText(st_normalize(st_geomFromWKT($"_2"))))
      .as[(Long, String)].collect().sortBy(_._1)
    // quantization at 1e9 is far below the printed precision, so the
    // normalized WKT must match exactly coordinate-by-coordinate at 1e-9
    back.zip(want).foreach { case ((ib, wb), (iw, ww)) =>
      assert(ib == iw)
      val num = "-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?".r
      val nb = num.findAllIn(wb).map(_.toDouble).toArray
      val nw = num.findAllIn(ww).map(_.toDouble).toArray
      assert(nb.length == nw.length, s"id $ib: $wb vs $ww")
      nb.zip(nw).foreach { case (a, b) =>
        assert(math.abs(a - b) < 2e-9, s"id $ib: $wb vs $ww")
      }
    }
  }

  test("read_file dispatches .gdb directories") {
    val gdb = tmpGdb()
    FileGdbIO.write(sample().df, gdb, crs = Some("EPSG:3857"))
    val back = GeoDataFrame.readFile(spark, gdb)
    assert(back.crs.contains("EPSG:3857"))
    assert(back.df.count() == 7)
  }

  // -------------------------------------------- chunk-envelope index

  /** 20k points on a line (x = i, y = 0): block b of 4096 rows covers
    * x in [b*4096+1, (b+1)*4096], so a window inside one block must
    * plan exactly the chunks of that block.
    */
  private def lineGdb(n: Int = 20000): String = {
    val gdb = tmpGdb()
    val src = (1 to n).map(i => (i.toLong, s"r$i"))
      .toDF("id", "name")
      .withColumn("geometry", st_point($"id".cast("double"), lit(0.0)))
    FileGdbIO.write(src, gdb)
    gdb
  }

  test("windowed read prunes chunks through the .gspx sidecar") {
    val gdb = lineGdb()
    assert(new java.io.File(gdb, "a00000005.gspx").exists())
    val box = Some((100.0, -1.0, 200.0, 1.0)) // inside block 0
    val full = FileGdbIO.read(spark, gdb, chunkSize = 4096)
    assert(full.df.rdd.getNumPartitions == 5)
    val win = FileGdbIO.read(spark, gdb, chunkSize = 4096, bbox = box)
    assert(win.df.rdd.getNumPartitions == 1) // 4 of 5 chunks pruned
    val ids = win.df.select($"id").as[Long].collect().sorted
    assert(ids.toSeq == (100L to 200L))
    // a window spanning the block-2/3 seam keeps exactly those chunks
    val seam = FileGdbIO.read(spark, gdb, chunkSize = 4096,
      bbox = Some((12000.0, -1.0, 13000.0, 1.0)))
    assert(seam.df.rdd.getNumPartitions == 2)
    assert(seam.df.count() == 1001)
  }

  test("third-party gdb (no sidecar): lazy env index still prunes") {
    val gdb = lineGdb()
    assert(new java.io.File(gdb, "a00000005.gspx").delete())
    new java.io.File(gdb, ".a00000005.gspx.crc").delete()
    val win = FileGdbIO.read(spark, gdb, chunkSize = 4096,
      bbox = Some((100.0, -1.0, 200.0, 1.0)))
    assert(win.df.rdd.getNumPartitions == 1)
    assert(win.df.count() == 101)
  }

  test("spark.graft.gdb.envIndex=off scans every chunk (correct, unpruned)") {
    val gdb = lineGdb()
    spark.conf.set("spark.graft.gdb.envIndex", "off")
    try {
      val win = FileGdbIO.read(spark, gdb, chunkSize = 4096,
        bbox = Some((100.0, -1.0, 200.0, 1.0)))
      assert(win.df.rdd.getNumPartitions == 5)
      assert(win.df.count() == 101)
    } finally spark.conf.unset("spark.graft.gdb.envIndex")
  }

  test("DSv2 windowed scan plans only env-index candidate partitions") {
    val gdb = lineGdb()
    val df = spark.read.format("filegdb")
      .option("chunkSize", "4096")
      .option("bbox", "100,-1,200,1").load(gdb)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 101)
  }

  test("a stale sidecar (older than an edited tablx) is ignored") {
    val gdb = lineGdb(5000)
    val tablx = new java.io.File(gdb, "a00000005.gdbtablx")
    val sidecar = new java.io.File(gdb, "a00000005.gspx")
    // make the sidecar strictly older than the tablx edit
    assert(sidecar.setLastModified(tablx.lastModified() - 60000))
    assert(tablx.setLastModified(tablx.lastModified() + 60000))
    // the read must fall back to the lazily computed index, not trust
    // the stale file — same answer either way here, but the partitions
    // are still pruned (compute path ran)
    val win = FileGdbIO.read(spark, gdb, chunkSize = 4096,
      bbox = Some((100.0, -1.0, 200.0, 1.0)))
    assert(win.df.rdd.getNumPartitions == 1)
    assert(win.df.count() == 101)
  }

  test("a poisoned same-tick v1 sidecar is ignored (identity/strict-mtime " +
      "guard); pruning never drops rows") {
    val gdb = lineGdb(5000)
    val table = new java.io.File(gdb, "a00000005.gdbtable")
    val sidecar = new java.io.File(gdb, "a00000005.gspx")
    // forge a v1 sidecar whose block envelopes are all DISJOINT from the
    // query window, stamped with mtime EQUAL to the table's — the
    // coarse-mtime same-tick-edit hazard. If trusted, every chunk would
    // prune and the read would drop all 101 rows.
    val nBlocks = (5000 + FileGdbIO.EnvBlockRows - 1) / FileGdbIO.EnvBlockRows
    val bb = java.nio.ByteBuffer.allocate(16 + nBlocks * 32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x58505347); bb.putInt(1)
    bb.putInt(FileGdbIO.EnvBlockRows); bb.putInt(nBlocks)
    (0 until nBlocks).foreach { _ =>
      bb.putDouble(1e9); bb.putDouble(1e9); bb.putDouble(2e9); bb.putDouble(2e9)
    }
    java.nio.file.Files.write(sidecar.toPath, bb.array())
    new java.io.File(gdb, ".a00000005.gspx.crc").delete()
    assert(sidecar.setLastModified(table.lastModified()))
    val win = FileGdbIO.read(spark, gdb, chunkSize = 4096,
      bbox = Some((100.0, -1.0, 200.0, 1.0)))
    assert(win.df.count() == 101) // fell back to the computed index
    assert(win.df.rdd.getNumPartitions == 1) // and still pruned
  }

  test("a v2 sidecar with a stale embedded identity is ignored") {
    val gdb = lineGdb(5000)
    val tablx = new java.io.File(gdb, "a00000005.gdbtablx")
    // simulate an in-place tablx edit that keeps the length: bump mtime
    // only — the v2 identity (mtime+len of both data files) must miss
    assert(tablx.setLastModified(tablx.lastModified() + 60000))
    val win = FileGdbIO.read(spark, gdb, chunkSize = 4096,
      bbox = Some((100.0, -1.0, 200.0, 1.0)))
    assert(win.df.count() == 101)
    assert(win.df.rdd.getNumPartitions == 1)
  }

  // ------------------------------------------------ negative hardening

  test("truncated .gdbtable fails loudly with the file named") {
    val gdb = lineGdb(5000)
    val table = new java.io.File(gdb, "a00000005.gdbtable")
    val bytes = java.nio.file.Files.readAllBytes(table.toPath)
    java.nio.file.Files.write(table.toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2))
    new java.io.File(gdb, ".a00000005.gdbtable.crc").delete()
    new java.io.File(gdb, "a00000005.gspx").delete()
    new java.io.File(gdb, ".a00000005.gspx.crc").delete()
    val e = intercept[org.apache.spark.SparkException](
      FileGdbIO.read(spark, gdb).df.count())
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"))
  }

  test("a table declaring two geometry fields is refused by name") {
    val gdb = tmpGdb()
    val src = Seq((1L, "a")).toDF("id", "name")
      .withColumn("geometry", st_point(lit(1.0), lit(2.0)))
    FileGdbIO.write(src.select($"geometry"), gdb) // OBJECTID + SHAPE only
    val table = new java.io.File(gdb, "a00000005.gdbtable")
    val bytes = java.nio.file.Files.readAllBytes(table.toPath)
    // field section at offset 40: i32 secLen, i32 version, 4 flag bytes,
    // i16 nFields, OBJECTID descriptor (21 bytes: 1+16+1+1+2), then the
    // geometry descriptor to the section end — duplicate it, bump counts
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val secLen = bb.getInt(40)
    val geomDescStart = 40 + 4 + 4 + 4 + 2 + 21
    val geomDesc = java.util.Arrays.copyOfRange(bytes, geomDescStart, 40 + 4 + secLen)
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, 40 + 4 + secLen)
    out.write(geomDesc)
    out.write(bytes, 40 + 4 + secLen, bytes.length - (40 + 4 + secLen))
    val patched = out.toByteArray
    val pb = java.nio.ByteBuffer.wrap(patched)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pb.putInt(40, secLen + geomDesc.length)
    pb.putShort(40 + 4 + 4 + 4, 3.toShort) // nFields 2 -> 3
    // row offsets in the tablx shift by the inserted bytes
    val tablx = new java.io.File(gdb, "a00000005.gdbtablx")
    val tx = java.nio.file.Files.readAllBytes(tablx.toPath)
    var off = 0L; var k = 0
    while (k < 5) { off |= (tx(16 + k) & 0xffL) << (8 * k); k += 1 }
    val no = off + geomDesc.length
    k = 0
    while (k < 5) { tx(16 + k) = ((no >> (8 * k)) & 0xff).toByte; k += 1 }
    java.nio.file.Files.write(table.toPath, patched)
    java.nio.file.Files.write(tablx.toPath, tx)
    new java.io.File(gdb, ".a00000005.gdbtable.crc").delete()
    new java.io.File(gdb, ".a00000005.gdbtablx.crc").delete()
    val e = intercept[IllegalArgumentException](FileGdbIO.read(spark, gdb))
    assert(e.getMessage.contains("geometry") &&
      e.getMessage.contains("one shape field"))
  }
}
