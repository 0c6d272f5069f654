package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopoJsonIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two quantized squares sharing one edge (the canonical TopoJSON shape:
  // the shared boundary is arc 0, referenced forward by the left polygon
  // and REVERSED (ones' complement) by the right), plus a point layer.
  // transform: scale 0.5, translate (10, 20); grid coords are integers.
  private val topo = """{
    "type": "Topology",
    "transform": {"scale": [0.5, 0.5], "translate": [10.0, 20.0]},
    "objects": {
      "squares": {
        "type": "GeometryCollection",
        "geometries": [
          {"type": "Polygon", "arcs": [[0, 1]], "id": "L",
           "properties": {"name": "left"}},
          {"type": "Polygon", "arcs": [[-1, 2]], "id": "R",
           "properties": {"name": "right"}}
        ]
      },
      "pins": {"type": "Point", "coordinates": [2, 2]}
    },
    "arcs": [
      [[2, 0], [0, 2]],
      [[2, 2], [-2, 0], [0, -2], [2, 0]],
      [[2, 0], [2, 0], [0, 2], [-2, 0]]
    ]
  }"""
  // arc 0 (shared edge): (2,0) -> (2,2) in grid = (11,20)-(11,21) in world
  // arc 1 (left loop):  (2,2)->(0,2)->(0,0)->(2,0) = left square rest
  // arc 2 (right side): (2,0)->(4,0)->(4,2)->(2,2) — ends at the START
  // of arc 0 so the ring [-1, 2] closes: ~0 walks (2,2)->(2,0), arc 2
  // returns to (2,2)

  test("quantized topology: shared arc stitches both polygons exactly") {
    val dir = java.nio.file.Files.createTempDirectory("topojson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "t.topojson"),
      topo.getBytes("UTF-8"))
    val gdf = GeoDataFrame.readFile(spark, dir + "/t.topojson")
    val rows = gdf.df
      .select($"layer", $"id", $"props",
        st_asText($"geometry").as("wkt"),
        round(st_area($"geometry"), 9).as("area"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    // world coords: grid * 0.5 + (10, 20); each square is 1x1 world units
    val (pins, squares) = rows.partition(_._1 == "pins")
    assert(pins.map(_._4) == Seq("POINT (11 21)"))
    assert(squares.map(_._2) == Seq("L", "R"))
    assert(squares.forall(_._5 == 1.0), s"areas ${squares.map(_._5)}")
    assert(squares.map(_._3) == Seq("""{"name":"left"}""", """{"name":"right"}"""))
    // the shared edge x=11 appears in BOTH rings with identical vertices —
    // topology preserved (no T-junctions, no duplicate-but-jittered edge)
    val l = squares(0)._4; val r = squares(1)._4
    assert(l.contains("11 21") && l.contains("11 20"), l)
    assert(r.contains("11 21") && r.contains("11 20"), r)
    // valid closed rings
    val back = gdf.df.filter($"layer" === "squares")
      .select(st_isValid($"geometry")).as[Boolean].collect()
    assert(back.forall(identity))
    // the two squares share the boundary but not interiors: union area 2
    val union = gdf.df.filter($"layer" === "squares")
      .agg(round(st_area(st_unionAgg($"geometry")), 9)).as[Double].head()
    assert(union == 2.0, s"union area $union")
  }

  test("write/read roundtrip: layers, ids, props, all geometry ranks") {
    // grid-aligned coordinates (integers in a [0,100] window with quantum
    // 101) survive quantization exactly, so the roundtrip is value-exact
    val rows = Seq(
      ("pts", "a", """{"k":1}""",
        graft.geom.Wkb.write(graft.geom.Point(10, 20))),
      ("lines", "b", null,
        graft.geom.Wkb.write(graft.geom.LineString(
          Array(0.0, 0.0, 50.0, 20.0, 100.0, 0.0)))),
      ("polys", "c", """{"name":"sq"}""",
        graft.geom.Wkb.write(graft.geom.Polygon(Array(
          Array(0.0, 0.0, 40.0, 0.0, 40.0, 40.0, 0.0, 40.0, 0.0, 0.0),
          Array(10.0, 10.0, 10.0, 20.0, 20.0, 20.0, 20.0, 10.0, 10.0, 10.0))))))
      .toDF("lyr", "fid", "props", "geometry")
    val f = java.io.File.createTempFile("topo_rt", ".topojson")
    f.deleteOnExit()
    TopoJsonIO.write(rows, f.getAbsolutePath, layerColumn = Some("lyr"),
      idColumn = Some("fid"), propsColumn = Some("props"), quantum = 101)
    val back = TopoJsonIO.read(spark, f.getAbsolutePath).df
      .select($"layer", $"id", $"props", expr("st_astext(geometry)").as("w"))
      .as[(String, String, Option[String], String)].collect()
      .sortBy(_._2).toSeq
    assert(back.map(r => (r._1, r._2)) ==
      Seq(("pts", "a"), ("lines", "b"), ("polys", "c")))
    assert(back(0)._4 == "POINT (10 20)")
    // grid steps are sx = 100/100 = 1, sy = 40/100 = 0.4; every fixture
    // coordinate is a multiple of its axis step, so roundtrip is exact
    assert(back(1)._4 == "LINESTRING (0 0, 50 20, 100 0)")
    assert(back(2)._4.startsWith("POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0)"))
    assert(back(2)._4.contains("(10 10, 10 20, 20 20, 20 10, 10 10)"))
    assert(back(0)._3.exists(_.contains("\"k\":1")))
    assert(back(2)._3.exists(_.contains("\"name\":\"sq\"")))
    assert(back(1)._3.isEmpty)
  }

  test("writeDir emits one topology per partition; quantization error is bounded") {
    val dir = java.nio.file.Files.createTempDirectory("topo_dir").toString
    val pts = (0 until 200).map(i =>
      (i.toLong, graft.geom.Wkb.write(graft.geom.Point(i * 0.37, i * 0.73))))
      .toDF("fid", "geometry").repartition(3)
    TopoJsonIO.writeDir(pts, dir, idColumn = Some("fid"), quantum = 100000)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".topojson")) == 3)
    val back = TopoJsonIO.read(spark, dir).df
      .select($"id", expr("st_x(geometry)"), expr("st_y(geometry)"))
      .as[(String, Double, Double)].collect()
    assert(back.length == 200)
    back.foreach { case (id, x, y) =>
      val i = id.toInt
      // quantization error <= half a grid step; the span is ~74/146 units
      // over 1e5 steps
      assert(math.abs(x - i * 0.37) < 1e-3, s"$id x=$x")
      assert(math.abs(y - i * 0.73) < 1e-3, s"$id y=$y")
    }
  }

  test("write dedups shared boundaries into one arc (the topojson cut)") {
    // two unit-grid squares sharing the x=40 edge: the canonical shape.
    // A proper topology stores that edge ONCE; each square references it
    // (one side reversed). Expected arcs: left outline + right outline +
    // shared edge = 3, not the naive 2 closed rings.
    val left = graft.geom.Polygon(Array(Array(
      0.0, 0.0, 40.0, 0.0, 40.0, 40.0, 0.0, 40.0, 0.0, 0.0)))
    val right = graft.geom.Polygon(Array(Array(
      40.0, 0.0, 80.0, 0.0, 80.0, 40.0, 40.0, 40.0, 40.0, 0.0)))
    val rows = Seq(("a", graft.geom.Wkb.write(left)),
      ("b", graft.geom.Wkb.write(right))).toDF("fid", "geometry")
    val f = java.io.File.createTempFile("topo_shared", ".topojson")
    f.deleteOnExit()
    TopoJsonIO.write(rows, f.getAbsolutePath, idColumn = Some("fid"),
      quantum = 81)
    val doc = new String(java.nio.file.Files.readAllBytes(f.toPath))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(doc)
    assert(root.get("arcs").size() == 3, doc)
    // one polygon must reference a reversed arc (negative = ones' complement)
    val refs = root.get("objects").get("features").get("geometries")
      .elements()
    var sawNegative = false
    while (refs.hasNext) {
      val ring0 = refs.next().get("arcs").get(0)
      val it = ring0.elements()
      while (it.hasNext) if (it.next().asInt() < 0) sawNegative = true
    }
    assert(sawNegative, doc)
    // and the geometry survives the roundtrip exactly (grid-aligned)
    val back = TopoJsonIO.read(spark, f.getAbsolutePath).df
      .select($"id", expr("st_area(geometry)"), expr("st_astext(geometry)"))
      .as[(String, Double, String)].collect().sortBy(_._1)
    assert(back.length == 2)
    assert(back.forall(_._2 == 1600.0), back.map(_._3).mkString("; "))
  }

  test("unquantized topology and malformed documents") {
    val dir = java.nio.file.Files.createTempDirectory("topojson2").toString
    val plain = """{
      "type": "Topology",
      "objects": {"lines": {"type": "LineString", "arcs": [0, 1]}},
      "arcs": [[[0.0, 0.0], [1.5, 0.5]], [[1.5, 0.5], [3.0, 0.0]]]
    }"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p.topojson"),
      plain.getBytes("UTF-8"))
    val got = TopoJsonIO.read(spark, dir).df
      .select(st_asText($"geometry")).as[String].head()
    assert(got == "LINESTRING (0 0, 1.5 0.5, 3 0)")
    val bad = new java.io.ByteArrayInputStream(
      """{"type": "FeatureCollection"}""".getBytes("UTF-8"))
    val err = intercept[IllegalArgumentException] {
      TopoJsonIO.parseTopology(bad)
    }
    assert(err.getMessage.contains("Topology"))
  }
}
