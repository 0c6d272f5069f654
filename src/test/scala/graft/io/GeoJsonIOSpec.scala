package graft.io

import graft.api.GeoDataFrame
import graft.geom.{GeoJson, LineString, MultiPolygon, Point, Polygon, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoJsonIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("geojson").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/ds"
  }

  test("FeatureCollection write/read roundtrip: typed props, null note, CRS84") {
    val path = tmp()
    val rows = (0 until 90).map { i =>
      (i.toLong, s"f_$i", i * 1.25,
        if (i % 4 == 0) null else s"n_$i",
        Wkb.write(Point(i * 2.0 - 90.0, (i % 80).toDouble)))
    }
    val gdf = GeoDataFrame(
      rows.toDF("id", "nm", "score", "note", "geometry").repartition(3), "geometry")
    GeoJsonIO.write(gdf, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".geojson"))
    assert(files.length == 3)
    // each part is one valid FeatureCollection document
    files.foreach { f =>
      val doc = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(doc.startsWith("""{"type":"FeatureCollection","features":["""))
    }

    val back = GeoJsonIO.read(spark, path)
    assert(back.crs.contains("OGC:CRS84"))
    val got = back.df
      .select(
        get_json_object($"properties", "$.id").cast("long").as("id"),
        get_json_object($"properties", "$.nm").as("nm"),
        get_json_object($"properties", "$.score").cast("double").as("score"),
        get_json_object($"properties", "$.note").as("note"),
        expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .orderBy($"id").collect()
    assert(got.length == 90)
    rows.zip(got).foreach { case ((id, nm, sc, note, _), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == nm)
      assert(r.getDouble(2) == sc)
      assert(r.getString(3) == note) // omitted property reads back null
      assert(r.getDouble(4) == id * 2.0 - 90.0)
      assert(r.getDouble(5) == (id % 80).toDouble)
    }
  }

  test("geometry families and null geometry survive the FC roundtrip") {
    val path = tmp()
    val geoms = Seq(
      ("pt", Wkb.write(Point(3.5, -2.25))),
      ("ls", Wkb.write(LineString(Array(0.0, 0.0, 1.5, 2.5, 3.0, 1.0)))),
      ("holed", Wkb.write(Polygon(Array(
        Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0),
        Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0, 2.0, 2.0))))),
      ("mp", Wkb.write(MultiPolygon(Array(
        Polygon(Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0))),
        Polygon(Array(Array(5.0, 5.0, 6.0, 5.0, 6.0, 6.0, 5.0, 5.0))))))),
      ("none", null: Array[Byte]))
    val gdf = GeoDataFrame(geoms.toDF("k", "geometry").coalesce(1), "geometry")
    GeoJsonIO.write(gdf, path)
    val back = GeoJsonIO.read(spark, path).df
      .select(get_json_object($"properties", "$.k").as("k"),
        expr("st_astext(geometry)").as("wkt"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back.size == 5)
    geoms.foreach { case (k, wkb) =>
      val expected = if (wkb == null) null else graft.geom.Wkt.write(Wkb.read(wkb))
      assert(back(k) == expected, s"key $k")
    }
  }

  test("bare Feature and bare geometry documents read like OGR") {
    val dir = java.nio.file.Files.createTempDirectory("geojson_bare")
    val feature = dir.resolve("one.geojson")
    java.nio.file.Files.write(feature,
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[4.5,5.5]},
        |"properties":{"a": 7}}""".stripMargin.getBytes("UTF-8"))
    val f = GeoJsonIO.read(spark, feature.toString).df.collect()
    assert(f.length == 1)
    assert(graft.geom.Wkt.write(Wkb.read(f(0).getAs[Array[Byte]](0))) == "POINT (4.5 5.5)")

    val bare = dir.resolve("two.geojson")
    java.nio.file.Files.write(bare,
      """{"type":"LineString","coordinates":[[0,0],[2,3]]}""".getBytes("UTF-8"))
    val g = GeoJsonIO.read(spark, bare.toString).df.collect()
    assert(g.length == 1)
    assert(g(0).isNullAt(1)) // no properties on a bare geometry
    assert(graft.geom.Wkt.write(Wkb.read(g(0).getAs[Array[Byte]](0))) ==
      "LINESTRING (0 0, 2 3)")
  }

  test("unicode and escaped strings in properties roundtrip") {
    val path = tmp()
    val rows = Seq(
      (1L, "héllo \"wörld\""),
      (2L, "tab\tnewline\nslash\\"),
      (3L, "日本語テキスト"))
    val gdf = GeoDataFrame(
      rows.map { case (i, s) => (i, s, Wkb.write(Point(i.toDouble, 0.0))) }
        .toDF("id", "s", "geometry").coalesce(1), "geometry")
    GeoJsonIO.write(gdf, path)
    val back = GeoJsonIO.read(spark, path).df
      .select(get_json_object($"properties", "$.id").cast("long"),
        get_json_object($"properties", "$.s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (i, s) => assert(back(i) == s) }
  }

  test("readNode parses a geometry subtree without reserialization") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")
    assert(graft.geom.Wkt.write(GeoJson.readNode(node)) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 0))")
  }
}
