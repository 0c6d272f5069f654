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
