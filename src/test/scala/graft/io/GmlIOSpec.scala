package graft.io

import graft.api.GeoDataFrame
import graft.geom.{LineString, MultiPolygon, Point, Polygon, Wkb, Wkt}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GmlIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("gml").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/ds"
  }

  test("write/read roundtrip: attrs, nulls omitted, gml_id surfaced") {
    val path = tmp()
    val rows = (0 until 80).map { i =>
      (i.toLong, s"f_$i", i * 2.5,
        if (i % 6 == 0) null else s"v_$i",
        Wkb.write(Point(i * 1.5 - 60.0, (i % 70).toDouble)))
    }
    val gdf = GeoDataFrame(
      rows.toDF("id", "nm", "score", "opt", "geometry").repartition(3), "geometry")
    GmlIO.write(gdf, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".gml"))
    assert(files.length == 3)

    val back = GmlIO.read(spark, path)
    val got = back.df
      .select(
        element_at($"props", "id").cast("long").as("id"),
        element_at($"props", "nm").as("nm"),
        element_at($"props", "score").cast("double").as("score"),
        element_at($"props", "opt").as("opt"),
        element_at($"props", "gml_id").as("gml_id"),
        expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .orderBy($"id").collect()
    assert(got.length == 80)
    rows.zip(got).foreach { case ((id, nm, sc, opt, _), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == nm)
      assert(r.getDouble(2) == sc)
      assert(r.getString(3) == opt)
      assert(r.getString(4) != null) // gml:id written and surfaced
      assert(r.getDouble(5) == id * 1.5 - 60.0)
      assert(r.getDouble(6) == (id % 70).toDouble)
    }
  }

  test("geometry families roundtrip through GML 3.2 encoding") {
    val path = tmp()
    val geoms = Seq(
      ("pt", "POINT (3.5 -2.25)"),
      ("ls", "LINESTRING (0 0, 1.5 2.5, 3 1)"),
      ("holed", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
      ("mpt", "MULTIPOINT ((1 1), (2 2))"),
      ("mls", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
      ("mpg", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"))
    val gdf = GeoDataFrame(
      geoms.map { case (k, wkt) => (k, Wkb.write(Wkt.read(wkt))) }
        .toDF("k", "geometry").coalesce(1), "geometry")
    GmlIO.write(gdf, path)
    val back = GmlIO.read(spark, path).df
      .select(element_at($"props", "k").as("k"), expr("st_astext(geometry)").as("wkt"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    geoms.foreach { case (k, wkt) => assert(back(k) == wkt, s"key $k") }
  }

  test("reads third-party GML 2 coordinates and boundedBy is skipped") {
    val dir = java.nio.file.Files.createTempDirectory("gml2")
    val f = dir.resolve("third.gml")
    java.nio.file.Files.write(f,
      """<?xml version="1.0"?>
        |<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
        |  xmlns:gml="http://www.opengis.net/gml" xmlns:app="http://example.com/app">
        |  <gml:boundedBy><gml:Box>
        |    <gml:coordinates>0,0 100,100</gml:coordinates>
        |  </gml:Box></gml:boundedBy>
        |  <gml:featureMember>
        |    <app:city fid="c1">
        |      <app:name>Alpha</app:name>
        |      <app:pop>12345</app:pop>
        |      <app:shape>
        |        <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
        |          <gml:coordinates>0,0 4,0 4,4 0,0</gml:coordinates>
        |        </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
        |      </app:shape>
        |    </app:city>
        |  </gml:featureMember>
        |  <gml:featureMember>
        |    <app:city fid="c2">
        |      <app:name>Beta</app:name>
        |      <app:loc><gml:Point><gml:coordinates>7,8</gml:coordinates></gml:Point></app:loc>
        |    </app:city>
        |  </gml:featureMember>
        |</wfs:FeatureCollection>
        |""".stripMargin.getBytes("UTF-8"))
    val back = GmlIO.read(spark, f.toString).df
      .select(element_at($"props", "name").as("name"),
        element_at($"props", "pop").as("pop"),
        element_at($"props", "gml_id").as("gid"),
        expr("st_astext(geometry)").as("wkt"))
      .orderBy($"name").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "Alpha")
    assert(back(0).getString(1) == "12345")
    assert(back(0).getString(2) == "c1") // fid attribute form
    assert(back(0).getString(3) == "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    assert(back(1).getString(0) == "Beta")
    assert(back(1).getString(3) == "POINT (7 8)")
  }

  test("app schema: no featureMember wrappers, nested props flatten, urn axis order") {
    val dir = java.nio.file.Files.createTempDirectory("gmlapp")
    val f = dir.resolve("sites.gml")
    java.nio.file.Files.write(f,
      """<?xml version="1.0"?>
        |<ns:SiteDataset xmlns:ns="http://example.com/sites"
        |  xmlns:gml="http://www.opengis.net/gml/3.2">
        |  <gml:boundedBy><gml:Envelope>
        |    <gml:lowerCorner>0 0</gml:lowerCorner><gml:upperCorner>60 60</gml:upperCorner>
        |  </gml:Envelope></gml:boundedBy>
        |  <ns:Site gml:id="s1">
        |    <ns:code>A1</ns:code>
        |    <ns:address>
        |      <ns:city>Springfield</ns:city>
        |      <ns:zip>12345</ns:zip>
        |    </ns:address>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4326">
        |        <gml:pos>51.5 -0.12</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Site>
        |  <ns:Site gml:id="s2">
        |    <ns:code>B2</ns:code>
        |    <ns:where>
        |      <gml:Point srsName="EPSG:4326"><gml:pos>3 4</gml:pos></gml:Point>
        |    </ns:where>
        |  </ns:Site>
        |</ns:SiteDataset>
        |""".stripMargin.getBytes("UTF-8"))
    val back = GmlIO.read(spark, f.toString).df
      .select(element_at($"props", "code").as("code"),
        element_at($"props", "address.city").as("city"),
        element_at($"props", "address.zip").as("zip"),
        expr("st_astext(geometry)").as("wkt"))
      .orderBy($"code").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "A1")
    assert(back(0).getString(1) == "Springfield")
    assert(back(0).getString(2) == "12345")
    // urn form = lat/lon order in the doc, swapped back to x=lon
    assert(back(0).getString(3) == "POINT (-0.12 51.5)")
    assert(back(1).getString(0) == "B2")
    // legacy EPSG:code srsName keeps x,y order
    assert(back(1).getString(3) == "POINT (3 4)")

    // forced override: swapAxes=Some(false) reads the doc verbatim
    val verbatim = GmlIO.read(spark, f.toString, swapAxes = Some(false)).df
      .select(element_at($"props", "code").as("code"),
        expr("st_astext(geometry)").as("wkt"))
      .orderBy($"code").collect()
    assert(verbatim(0).getString(1) == "POINT (51.5 -0.12)")
  }

  test("urn 4xxx projected/geocentric codes are NOT axis-swapped; mixed content flattens") {
    val dir = java.nio.file.Files.createTempDirectory("gml4xxx")
    val f = dir.resolve("mix.gml")
    java.nio.file.Files.write(f,
      """<?xml version="1.0"?>
        |<ns:Dataset xmlns:ns="http://example.com/x"
        |  xmlns:gml="http://www.opengis.net/gml/3.2">
        |  <ns:Thing gml:id="a">
        |    <ns:code>A</ns:code>
        |    <ns:note>loose text<ns:sub>leaf</ns:sub></ns:note>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4087">
        |        <gml:pos>1000000 2000000</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Thing>
        |  <ns:Thing gml:id="b">
        |    <ns:code>B</ns:code>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4978">
        |        <gml:pos>6378137 0</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Thing>
        |  <ns:Thing gml:id="c">
        |    <ns:code>C</ns:code>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4269">
        |        <gml:pos>40.7 -74.0</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Thing>
        |  <ns:Thing gml:id="d">
        |    <ns:code>D</ns:code>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4938">
        |        <gml:pos>-4052052 4212836</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Thing>
        |  <ns:Thing gml:id="e">
        |    <ns:code>E</ns:code>
        |    <ns:where>
        |      <gml:Point srsName="urn:ogc:def:crs:EPSG::4939">
        |        <gml:pos>-35.3 149.1</gml:pos>
        |      </gml:Point>
        |    </ns:where>
        |  </ns:Thing>
        |</ns:Dataset>
        |""".stripMargin.getBytes("UTF-8"))
    val back = GmlIO.read(spark, f.toString).df
      .select(element_at($"props", "code").as("code"),
        element_at($"props", "note.sub").as("sub"),
        element_at($"props", "note").as("note"),
        expr("st_astext(geometry)").as("wkt"))
      .orderBy($"code").collect()
    assert(back.length == 5)
    // 4087 (projected World Equidistant Cylindrical): coordinates verbatim
    assert(back(0).getString(3) == "POINT (1000000 2000000)")
    // mixed content: nested leaf kept, loose own-text dropped (OGR model)
    assert(back(0).getString(1) == "leaf")
    assert(back(0).getString(2) == null)
    // 4978 (geocentric WGS 84): verbatim
    assert(back(1).getString(3) == "POINT (6378137 0)")
    // 4269 (NAD83 geographic): lat/lon in doc, swapped to x=lon
    assert(back(2).getString(3) == "POINT (-74 40.7)")
    // 4938 (GDA94 geocentric, even code in the modern band): verbatim
    assert(back(3).getString(3) == "POINT (-4052052 4212836)")
    // 4939 (GDA94 3D geographic, odd code): lat/lon -> x=lon
    assert(back(4).getString(3) == "POINT (149.1 -35.3)")
  }

  test("writeAppSchema roundtrip: dotted groups, urn srs, geometry families") {
    val path = tmp()
    val rows = (0 until 50).map { i =>
      (i.toLong, s"org_$i", i * 1.25,
        Wkb.write(Point(i * 0.7 - 15.0, i * 0.3 - 5.0)))
    }
    val gdf = GeoDataFrame(
      rows.toDF("id", "org.name", "org.rank", "geometry").repartition(2), "geometry")
    GmlIO.writeAppSchema(gdf, path, featureName = "site", srsUrn = Some(4326))
    // the emitted document has no featureMember wrappers
    val txt = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".gml")).head.toPath), "UTF-8")
    assert(!txt.contains("featureMember"))
    assert(txt.contains("urn:ogc:def:crs:EPSG::4326"))
    assert(txt.contains("<app:org><app:name>"))

    val back = GmlIO.read(spark, path).df
      .select(
        element_at($"props", "id").cast("long").as("id"),
        element_at($"props", "org.name").as("nm"),
        element_at($"props", "org.rank").cast("double").as("rank"),
        expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .orderBy($"id").collect()
    assert(back.length == 50)
    rows.zip(back).foreach { case ((id, nm, rank, _), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == nm)
      assert(r.getDouble(2) == rank)
      assert(r.getDouble(3) == id * 0.7 - 15.0) // swap out + swap back = exact
      assert(r.getDouble(4) == id * 0.3 - 5.0)
    }

    // polygons survive the swap roundtrip too
    val path2 = tmp()
    val g2 = GeoDataFrame(
      Seq((1L, Wkb.write(Wkt.read(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"))))
        .toDF("id", "geometry").coalesce(1), "geometry")
    GmlIO.writeAppSchema(g2, path2, srsUrn = Some(4326))
    val wkt2 = GmlIO.read(spark, path2).df
      .select(expr("st_astext(geometry)")).collect()(0).getString(0)
    assert(wkt2 == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")
  }

  test("xml escaping and readFile dispatch") {
    val path = tmp()
    val gdf = GeoDataFrame(
      Seq((1L, "a & b < c", Wkb.write(Point(0.0, 0.0))))
        .toDF("id", "s", "geometry"), "geometry")
    GmlIO.write(gdf, path)
    val back = GeoDataFrame.readFile(spark, path).df
      .select(element_at($"props", "s")).collect()
    assert(back(0).getString(0) == "a & b < c")
  }
}
