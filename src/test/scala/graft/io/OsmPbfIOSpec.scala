package graft.io

import java.nio.file.Files

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OSM PBF codec roundtrip: dense-node delta/zigzag coding, blob framing
  * (multiple zlib OSMData blobs), string tables, way/relation packed
  * fields, and the distributed wayLines assembly.
  */
class OsmPbfIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpFile(): String =
    new java.io.File(Files.createTempDirectory("osm").toFile, "t.osm.pbf")
      .getAbsolutePath

  private val nodes = Seq(
    (1L, -87.6298, 41.8781, Map("name" -> "chicago", "place" -> "city")),
    (2L, -87.6200, 41.8700, Map.empty[String, String]),
    (3L, -87.6100, 41.8600, Map("highway" -> "traffic_signals")),
    (4L, 139.7007, 35.6591, Map("name" -> "tokyo")),
    (5L, -0.1276, 51.5072, Map("name" -> "london")))

  private val ways = Seq(
    (10L, Seq(1L, 2L, 3L), Map("highway" -> "residential", "name" -> "Main St")),
    (11L, Seq(3L, 2L), Map("highway" -> "service")),
    (12L, Seq(1L, 99L), Map("note" -> "dangling ref"))) // 99 not in nodes

  private val rels = Seq(
    (20L, Seq(("node", 1L, "admin_centre"), ("way", 10L, "outer")),
      Map("type" -> "boundary")))

  test("nodes roundtrip: ids, 1e-7-degree coords, tags, WKB points") {
    val path = tmpFile()
    OsmPbfIO.write(path, nodes, ways, rels)
    val got = OsmPbfIO.readNodes(spark, path)
      .orderBy($"osm_id").collect()
    assert(got.length === 5)
    for ((row, (id, lon, lat, tags)) <- got.zip(nodes)) {
      assert(row.getLong(0) === id)
      assert(math.abs(row.getDouble(1) - lon) < 5e-8, s"lon of $id")
      assert(math.abs(row.getDouble(2) - lat) < 5e-8, s"lat of $id")
      assert(row.getMap[String, String](3).toMap === tags)
      val g = graft.geom.Wkb.read(row.get(4).asInstanceOf[Array[Byte]])
        .asInstanceOf[graft.geom.Point]
      assert(math.abs(g.x - lon) < 5e-8 && math.abs(g.y - lat) < 5e-8)
    }
  }

  test("ways and relations roundtrip packed/delta fields") {
    val path = tmpFile()
    OsmPbfIO.write(path, nodes, ways, rels)
    val w = OsmPbfIO.readWays(spark, path).orderBy($"osm_id").collect()
    assert(w.map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L))
    assert(w(0).getSeq[Long](1) === Seq(1L, 2L, 3L))
    assert(w(1).getSeq[Long](1) === Seq(3L, 2L)) // negative delta survives
    assert(w(0).getMap[String, String](2).toMap ===
      Map("highway" -> "residential", "name" -> "Main St"))
    val r = OsmPbfIO.readRelations(spark, path).collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 20L)
    assert(r(0).getSeq[Long](1) === Seq(1L, 10L))
    assert(r(0).getSeq[String](2) === Seq("node", "way"))
    assert(r(0).getSeq[String](3) === Seq("admin_centre", "outer"))
    assert(r(0).getMap[String, String](4).toMap === Map("type" -> "boundary"))
  }

  test("multi-blob files decode blob-parallel (blockSize 2 -> several blobs)") {
    val path = tmpFile()
    OsmPbfIO.write(path, nodes, ways, Nil, blockSize = 2)
    val got = OsmPbfIO.readNodes(spark, path).orderBy($"osm_id")
      .select($"osm_id").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // file really is multiple OSMData blobs: 3 node blocks + 2 way blocks
    val len = new java.io.File(path).length()
    assert(len > 0)
    val w = OsmPbfIO.readWays(spark, path).count()
    assert(w === 3)
  }

  test("readFile dispatcher: .pbf points and lines layers with EPSG:4326") {
    val path = tmpFile()
    OsmPbfIO.write(path, nodes, ways, rels)
    val pts = graft.api.GeoDataFrame.readFile(spark, path)
    assert(pts.crs === Some("EPSG:4326"))
    assert(pts.df.count() === 5)
    val lines = graft.api.GeoDataFrame.readFile(spark, path, layer = Some("lines"))
    assert(lines.df.count() === 2)
  }

  test("wayPolygons keeps closed area ways only") {
    val path = tmpFile()
    val closedWays = ways ++ Seq(
      (13L, Seq(1L, 2L, 3L, 1L), Map("landuse" -> "park")),
      (14L, Seq(1L, 2L, 3L, 1L), Map("area" -> "no"))) // closed but area=no
    OsmPbfIO.write(path, nodes, closedWays, Nil)
    val n = OsmPbfIO.readNodes(spark, path)
    val w = OsmPbfIO.readWays(spark, path)
    val polys = OsmPbfIO.wayPolygons(w, n).collect()
    assert(polys.map(_.getLong(0)).toSeq === Seq(13L))
    val p = graft.geom.Wkb.read(polys(0).get(2).asInstanceOf[Array[Byte]])
    assert(p.isInstanceOf[graft.geom.Polygon])
    assert(p.asInstanceOf[graft.geom.Polygon].rings(0).length === 8)
    val viaDispatch = graft.api.GeoDataFrame.readFile(
      spark, path, layer = Some("polygons"))
    assert(viaDispatch.df.count() === 1)
  }

  test("relationMultipolygons stitches split ways into rings with holes") {
    // outer square split into 3 ways (one deliberately reversed), inner
    // hole split into 2 ways; node grid chosen so containment is clear
    val mpNodes = Seq(
      (101L, 0.0, 0.0, Map.empty[String, String]),
      (102L, 10.0, 0.0, Map.empty[String, String]),
      (103L, 10.0, 10.0, Map.empty[String, String]),
      (104L, 0.0, 10.0, Map.empty[String, String]),
      (111L, 3.0, 3.0, Map.empty[String, String]),
      (112L, 7.0, 3.0, Map.empty[String, String]),
      (113L, 7.0, 7.0, Map.empty[String, String]),
      (114L, 3.0, 7.0, Map.empty[String, String]))
    val mpWays = Seq(
      (201L, Seq(101L, 102L, 103L), Map.empty[String, String]),
      (202L, Seq(104L, 103L), Map.empty[String, String]), // reversed segment
      (203L, Seq(104L, 101L), Map.empty[String, String]),
      (211L, Seq(111L, 112L, 113L), Map.empty[String, String]),
      (212L, Seq(113L, 114L, 111L), Map.empty[String, String]))
    val mpRels = Seq(
      (301L, Seq(("way", 201L, "outer"), ("way", 202L, "outer"),
        ("way", 203L, "outer"), ("way", 211L, "inner"),
        ("way", 212L, "inner")), Map("type" -> "multipolygon", "name" -> "mp")),
      (302L, Seq(("way", 201L, "outer")), Map("type" -> "multipolygon")), // unclosed
      (303L, Seq(("way", 201L, "outer")), Map("type" -> "route"))) // wrong type
    val path = tmpFile()
    OsmPbfIO.write(path, mpNodes, mpWays, mpRels)
    val out = OsmPbfIO.relationMultipolygons(
      OsmPbfIO.readRelations(spark, path),
      OsmPbfIO.readWays(spark, path),
      OsmPbfIO.readNodes(spark, path)).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(301L))
    assert(out(0).getMap[String, String](1).toMap.apply("name") === "mp")
    val g = graft.geom.Wkb.read(out(0).get(2).asInstanceOf[Array[Byte]])
      .asInstanceOf[graft.geom.MultiPolygon]
    assert(g.polys.length === 1)
    assert(g.polys(0).rings.length === 2, "hole lost")
    // area = 100 - 16
    assert(math.abs(math.abs(graft.geom.Measures.area(g)) - 84.0) < 1e-9)
  }

  test("wayLines assembles ordered LineStrings and drops dangling ways") {
    val path = tmpFile()
    OsmPbfIO.write(path, nodes, ways, rels)
    val n = OsmPbfIO.readNodes(spark, path)
    val w = OsmPbfIO.readWays(spark, path)
    val lines = OsmPbfIO.wayLines(w, n).orderBy($"osm_id").collect()
    // way 12 has a ref (99) with no node -> dropped
    assert(lines.map(_.getLong(0)).toSeq === Seq(10L, 11L))
    val l10 = graft.geom.Wkb.read(lines(0).get(2).asInstanceOf[Array[Byte]])
      .asInstanceOf[graft.geom.LineString]
    assert(l10.xy.length === 6)
    // vertex order follows ref order (1 -> 2 -> 3)
    assert(math.abs(l10.xy(0) - -87.6298) < 5e-8)
    assert(math.abs(l10.xy(4) - -87.6100) < 5e-8)
    val l11 = graft.geom.Wkb.read(lines(1).get(2).asInstanceOf[Array[Byte]])
      .asInstanceOf[graft.geom.LineString]
    // reversed order for way 11 (3 -> 2)
    assert(math.abs(l11.xy(0) - -87.6100) < 5e-8)
    assert(math.abs(l11.xy(2) - -87.6200) < 5e-8)
  }
}
