package graft.io

import graft.geom.{LineString, MultiPolygon, Point, Polygon, Wkb, Wkt}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShapefileIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("shapefile").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/ds"
  }

  test("point roundtrip with mixed attribute types, incl. nulls") {
    val path = tmpDir()
    val rows = (0 until 100).map { i =>
      (i.toLong, s"name_$i", i * 1.5, i % 2 == 0, Point(i * 3.25, -i * 1.125))
    }
    val df = rows.toDF("id", "nm", "score", "flag", "p")
      .withColumn("geometry", expr("st_asbinary(st_point(p.x, p.y))"))
      .drop("p")
    ShapefileIO.write(df.repartition(3), path)
    val back = ShapefileIO.read(spark, path, chunkSize = 7)
    assert(back.schema.fieldNames.toSeq == Seq("id", "nm", "score", "flag", "geometry"))
    val got = back.select($"id", $"nm", $"score", $"flag",
        expr("st_x(st_geomfromwkb(geometry))"), expr("st_y(st_geomfromwkb(geometry))"))
      .as[(Long, String, Double, Boolean, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.size == 100)
    got.zipWithIndex.foreach { case ((id, nm, score, flag, x, y), i) =>
      assert(id == i && nm == s"name_$i" && flag == (i % 2 == 0))
      assert(score == i * 1.5, s"double attr $score != ${i * 1.5}")
      // geometry coordinates are IEEE-exact
      assert(x == i * 3.25 && y == -i * 1.125)
    }
  }

  test("dbf numeric write is locale-independent (comma-decimal default locale)") {
    // a de_DE default locale would make %g emit '42,5', which violates
    // dBASE and breaks the read side's toDouble — fmtDouble must pin
    // Locale.ROOT. local[*] executors share this JVM, so setDefault
    // reaches the write tasks.
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      val path = tmpDir()
      val df = Seq((1L, 42.5, 0.125), (2L, -7.75e-3, 1.0e17))
        .toDF("id", "a", "b")
        .withColumn("geometry", expr("st_asbinary(st_point(id * 1.0, 2.0))"))
      ShapefileIO.write(df, path)
      val got = ShapefileIO.read(spark, path)
        .select($"id", $"a", $"b").as[(Long, Double, Double)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 42.5, 0.125), (2L, -7.75e-3, 1.0e17)), got.toString)
    } finally java.util.Locale.setDefault(prev)
  }

  test("multi-chunk read of one file equals whole-file read") {
    val path = tmpDir()
    val df = (0 until 50).map(i => (i.toLong, i * 2.0, i * 3.0)).toDF("id", "x", "y")
      .withColumn("geometry", expr("st_asbinary(st_point(x, y))"))
      .select("id", "geometry")
      .coalesce(1) // one file -> chunking must split it
    ShapefileIO.write(df, path)
    val whole = ShapefileIO.read(spark, path, chunkSize = 65536)
      .select($"id").as[Long].collect().sorted.toSeq
    val chunked = ShapefileIO.read(spark, path, chunkSize = 8)
    assert(chunked.rdd.getNumPartitions == 7, "50 records / 8 per chunk = 7 tasks")
    val got = chunked.select($"id").as[Long].collect().sorted.toSeq
    assert(got == whole && got == (0L until 50L).toSeq)
  }

  test("polygon with hole and multipolygon roundtrip through winding rules") {
    val path = tmpDir()
    val withHole = Wkt.read(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    val multi = Wkt.read(
      "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))")
    val df = Seq((1L, Wkb.write(withHole)), (2L, Wkb.write(multi)))
      .toDF("id", "geometry").coalesce(1)
    ShapefileIO.write(df, path)
    val back = ShapefileIO.read(spark, path)
      .select($"id", $"geometry").as[(Long, Array[Byte])].collect().sortBy(_._1)
    val g1 = Wkb.read(back(0)._2)
    assert(g1.isInstanceOf[Polygon] && g1.asInstanceOf[Polygon].rings.length == 2)
    assert(math.abs(graft.geom.Measures.area(g1) - 96.0) < 1e-9) // 100 - 4
    val g2 = Wkb.read(back(1)._2)
    assert(g2.isInstanceOf[MultiPolygon] && g2.asInstanceOf[MultiPolygon].polys.length == 2)
    assert(math.abs(graft.geom.Measures.area(g2) - 8.0) < 1e-9)
  }

  test("dbf edge values: tiny/huge doubles, Long extremes, deleted records") {
    val path = tmpDir()
    val rows = Seq(
      (Long.MinValue, 1e-5, Point(0.0, 0.0)),
      (Long.MaxValue, 1.23456789012345e17, Point(1.0, 1.0)),
      (0L, -9.87654321e-200, Point(2.0, 2.0)),
      (1L, 42.5, Point(3.0, 3.0)))
    val df = rows.toDF("id", "score", "p")
      .withColumn("geometry", expr("st_asbinary(st_point(p.x, p.y))"))
      .select("id", "score", "geometry").coalesce(1)
    ShapefileIO.write(df, path)
    val back = ShapefileIO.read(spark, path)
      .select($"id", $"score").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(back.map(_._1) == rows.map(_._1).sorted)
    // F(20) is lossy only when the wide exponent form forces precision
    // shedding — values must still parse and agree to >=13 significant digits
    back.sortBy(_._1).zip(rows.sortBy(_._1)).foreach { case ((_, got), (_, want, _)) =>
      if (want == 0.0) assert(got == 0.0)
      else assert(math.abs(got / want - 1.0) < 1e-13, s"$got vs $want")
    }
    // soft-deleted dbf records ('*' flag) are skipped like OGR does
    val dbf = new java.io.File(path).listFiles().filter(_.getName.endsWith(".dbf")).head
    val bytes = java.nio.file.Files.readAllBytes(dbf.toPath)
    val hlen = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getShort(8) & 0xffff
    bytes(hlen) = '*'.toByte // delete the first record
    java.nio.file.Files.write(dbf.toPath, bytes)
    // drop hadoop LocalFileSystem's checksum sidecar for the mutated file
    new java.io.File(dbf.getParent, "." + dbf.getName + ".crc").delete()
    assert(ShapefileIO.read(spark, path).count() == 3)
  }

  test("cx re-plans shapefile reads through header-envelope file pruning") {
    val dir = tmpDir()
    val near = (0 until 50).map(i => (i.toLong, Wkb.write(graft.geom.Point(i % 10 * 1.0, i / 10 * 1.0))))
    val far = (50 until 100).map(i => (i.toLong, Wkb.write(graft.geom.Point(500.0 + i, 500.0))))
    ShapefileIO.write((near ++ far).toDF("id", "geometry").repartition(4), dir)
    val g = graft.api.GeoDataFrame.readShapefile(spark, dir)
    assert(g.boxSource.isDefined, "readShapefile must install the cx hook")
    val pruned = g.cx(0.0, 0.0, 4.5, 4.5)
    val ids = pruned.df.select($"id").as[Long].collect().sorted.toSeq
    val want = near.collect { case (id, w) =>
      val p = Wkb.read(w).asInstanceOf[graft.geom.Point]
      if (p.x <= 4.5 && p.y <= 4.5) Some(id) else None
    }.flatten.sorted
    assert(ids == want && ids.nonEmpty)
    // direct bbox read prunes files whose header envelope misses entirely
    val direct = ShapefileIO.read(spark, dir, bbox = Some((0.0, 0.0, 4.5, 4.5)))
    assert(direct.select($"id").as[Long].collect().sorted.toSeq == want)
    assert(ShapefileIO.read(spark, dir, bbox = Some((1e6, 1e6, 2e6, 2e6))).count() == 0)
  }

  test("spatialShuffle + directory write + bbox read: most part files prune away") {
    val dir = tmpDir()
    // uniform grid over [0,100)^2; hilbert-shuffled into 8 spatially
    // coherent partitions -> 8 part trios with tight header envelopes
    val rows = (0 until 800).map { i =>
      (i.toLong, Wkb.write(graft.geom.Point((i * 37 % 100).toDouble, (i * 59 % 100).toDouble)))
    }
    val g = graft.api.GeoDataFrame(rows.toDF("id", "geometry"), "geometry")
      .spatialShuffle(numPartitions = Some(8), calculatePartitions = false)
    ShapefileIO.write(g.df, dir)
    val conf = spark.sessionState.newHadoopConf()
    val all = ShapefileIO.planChunks(conf, dir, 65536)
    assert(all.map(_.shp).distinct.size == 8)
    // a small corner window: the SFC layout must confine it to few files
    val survivors = ShapefileIO.planChunks(conf, dir, 65536,
      Some((0.0, 0.0, 12.0, 12.0))).map(_.shp).distinct.size
    assert(survivors <= 3, s"expected <=3 of 8 files to survive, got $survivors")
    // and the pruned read still returns exactly the right rows
    val got = ShapefileIO.read(spark, dir, bbox = Some((0.0, 0.0, 12.0, 12.0)))
      .select($"id").as[Long].collect().sorted.toSeq
    val want = rows.collect { case (id, w) =>
      val p = Wkb.read(w).asInstanceOf[graft.geom.Point]
      if (p.x <= 12 && p.y <= 12) Some(id) else None
    }.flatten.sorted
    assert(got == want && got.nonEmpty)
  }

  test("polyline roundtrip and null geometries") {
    val path = tmpDir()
    val line = LineString(Array(0.0, 0.0, 5.0, 0.0, 5.0, 5.0))
    val df = Seq((1L, Wkb.write(line)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "geometry").coalesce(1)
    ShapefileIO.write(df, path)
    val back = ShapefileIO.read(spark, path)
      .select($"id", $"geometry").as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(math.abs(graft.geom.Measures.length(Wkb.read(back(0)._2)) - 10.0) < 1e-9)
    assert(back(1)._2 == null)
  }
}
