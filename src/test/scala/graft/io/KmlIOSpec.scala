package graft.io

import graft.api.GeoDataFrame
import graft.geom.{LineString, MultiPolygon, Point, Polygon, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmlIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("kml").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/ds"
  }

  test("write/read roundtrip: attrs to ExtendedData, nulls omitted, CRS84") {
    val path = tmp()
    val rows = (0 until 120).map { i =>
      (i.toLong, s"pm_$i", i * 1.5, i % 2 == 0,
        if (i % 5 == 0) null else s"v_$i",
        Wkb.write(Point(i * 3.0 - 180.0, (i % 85).toDouble)))
    }
    val gdf = GeoDataFrame(
      rows.toDF("id", "nm", "score", "flag", "opt", "geometry").repartition(3),
      "geometry")
    KmlIO.write(gdf, path)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".kml"))
    assert(files.length == 3)

    val back = KmlIO.read(spark, path)
    assert(back.crs.contains("OGC:CRS84"))
    assert(back.df.count() == 120)
    val got = back.df
      .select(
        element_at($"props", "id").cast("long").as("id"),
        element_at($"props", "nm").as("nm"),
        element_at($"props", "score").cast("double").as("score"),
        element_at($"props", "flag").cast("boolean").as("flag"),
        element_at($"props", "opt").as("opt"),
        expr("st_x(geometry)").as("x"), expr("st_y(geometry)").as("y"))
      .orderBy($"id").collect()
    rows.zip(got).foreach { case ((id, nm, sc, fl, opt, _), r) =>
      assert(r.getLong(0) == id)
      assert(r.getString(1) == nm)
      assert(r.getDouble(2) == sc)
      assert(r.getBoolean(3) == fl)
      assert(r.getString(4) == opt) // null stayed null (omitted Data entry)
      assert(r.getDouble(5) == id * 3.0 - 180.0)
      assert(r.getDouble(6) == (id % 85).toDouble)
    }
  }

  test("geometry families: linestring, polygon with hole, multipolygon, xml escaping") {
    val path = tmp()
    val geoms = Seq(
      ("ls", Wkb.write(LineString(Array(0.0, 0.0, 1.5, 2.5, 3.0, 1.0)))),
      ("poly", Wkb.write(Polygon(Array(
        Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 0.0, 0.0),
        Array(2.0, 2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 2.0, 2.0, 2.0))))),
      ("mp", Wkb.write(MultiPolygon(Array(
        Polygon(Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0))),
        Polygon(Array(Array(5.0, 5.0, 7.0, 5.0, 7.0, 7.0, 5.0, 5.0))))))),
      ("esc <&\"> name", Wkb.write(Point(1, 2))))
    KmlIO.write(GeoDataFrame(geoms.toDF("tag", "geometry").coalesce(1), "geometry"), path)
    val back = KmlIO.read(spark, path).df
      .select(element_at($"props", "tag").as("tag"),
        expr("st_geometrytype(geometry)").as("gt"),
        $"geometry".as("wkb"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    val byTag = back.map(t => t._1 -> t).toMap
    assert(byTag("ls")._2 == "LineString")
    assert(byTag("poly")._2 == "Polygon")
    assert(byTag("mp")._2 == "MultiPolygon")
    assert(byTag("esc <&\"> name")._2 == "Point") // escaping roundtrips
    geoms.foreach { case (tag, wkb) =>
      assert(byTag(tag)._3.toSeq == wkb.toSeq, s"geometry drift for $tag")
    }
  }

  test("reads third-party-shaped kml: folders, styles, altitude, no ExtendedData") {
    val dir = new java.io.File(tmp()); dir.mkdirs()
    val f = new java.io.File(dir, "sample.kml")
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<kml xmlns="http://www.opengis.net/kml/2.2">
      |<Document>
      |  <Style id="s"><IconStyle><scale>1.2</scale></IconStyle></Style>
      |  <Folder>
      |    <name>folder name must not leak into placemarks</name>
      |    <Placemark>
      |      <name>alpha</name>
      |      <description>first</description>
      |      <styleUrl>#s</styleUrl>
      |      <Point><extrude>1</extrude><coordinates>
      |        -122.08,37.42,30.5
      |      </coordinates></Point>
      |    </Placemark>
      |    <Placemark>
      |      <name>beta</name>
      |      <LineString><tessellate>1</tessellate>
      |        <coordinates>0,0,5 1,1,6 2,0.5,7</coordinates>
      |      </LineString>
      |    </Placemark>
      |  </Folder>
      |</Document>
      |</kml>""".stripMargin
    java.nio.file.Files.write(f.toPath, xml.getBytes("UTF-8"))
    val back = KmlIO.read(spark, dir.getAbsolutePath).df.orderBy($"name").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "alpha")
    assert(back(0).getString(1) == "first")
    assert(back(0).isNullAt(2)) // no ExtendedData -> null props
    val alphaX = spark.createDataFrame(spark.sparkContext.parallelize(Seq(back(0))),
      KmlIO.schema).select(expr("st_x(geometry)")).head().getDouble(0)
    assert(alphaX == -122.08) // altitude dropped, lon exact
    assert(back(1).getString(0) == "beta")
  }

  test("readFile dispatches .kml files and kml directories") {
    val path = tmp()
    val gdf = GeoDataFrame(
      Seq((1L, Wkb.write(Point(10, 20)))).toDF("id", "geometry"), "geometry")
    gdf.toKml(path)
    val viaDir = GeoDataFrame.readFile(spark, path)
    assert(viaDir.df.count() == 1)
    val file = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".kml")).head.getAbsolutePath
    val viaFile = GeoDataFrame.readFile(spark, file)
    assert(viaFile.df.count() == 1)
    assert(viaFile.crs.contains("OGC:CRS84"))
  }
}
