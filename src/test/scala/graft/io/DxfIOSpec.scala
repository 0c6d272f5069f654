package graft.io

import graft.api.GeoDataFrame
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DxfIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A hand-authored ENTITIES document covering each supported entity —
    * the group-code layout follows the published DXF spec, so this also
    * documents what the parser consumes.
    */
  private val doc =
    """0
      |SECTION
      |2
      |ENTITIES
      |0
      |POINT
      |8
      |sites
      |10
      |3.5
      |20
      |-1.25
      |0
      |LINE
      |8
      |roads
      |10
      |0.0
      |20
      |0.0
      |11
      |10.0
      |21
      |5.0
      |0
      |LWPOLYLINE
      |8
      |parcels
      |90
      |4
      |70
      |1
      |10
      |0.0
      |20
      |0.0
      |10
      |4.0
      |20
      |0.0
      |10
      |4.0
      |20
      |3.0
      |10
      |0.0
      |20
      |3.0
      |0
      |POLYLINE
      |8
      |rivers
      |70
      |0
      |0
      |VERTEX
      |10
      |1.0
      |20
      |1.0
      |0
      |VERTEX
      |10
      |2.0
      |20
      |2.5
      |0
      |VERTEX
      |10
      |3.0
      |20
      |2.0
      |0
      |SEQEND
      |0
      |CIRCLE
      |8
      |wells
      |10
      |5.0
      |20
      |5.0
      |40
      |2.0
      |0
      |ARC
      |8
      |wells
      |10
      |0.0
      |20
      |0.0
      |40
      |1.0
      |50
      |0.0
      |51
      |90.0
      |0
      |SOLID
      |8
      |pads
      |10
      |0.0
      |20
      |0.0
      |11
      |2.0
      |21
      |0.0
      |12
      |0.0
      |22
      |2.0
      |13
      |2.0
      |23
      |2.0
      |0
      |TEXT
      |8
      |labels
      |10
      |7.0
      |20
      |8.0
      |1
      |Main Street
      |0
      |ENDSEC
      |0
      |EOF
      |""".stripMargin

  test("parse every supported entity with layers, arcs stroked, text captured") {
    val dir = java.nio.file.Files.createTempDirectory("dxf_read")
    java.nio.file.Files.writeString(dir.resolve("plan.dxf"), doc)
    val g = GeoDataFrame.readFile(spark, dir.toString + "/plan.dxf")
    val rows = g.df.select($"layer", $"entity", $"text", st_asText($"geometry"))
      .as[(String, String, Option[String], String)].collect()
    val byEnt = rows.groupBy(_._2)
    assert(byEnt.keySet == Set("POINT", "LINE", "LWPOLYLINE", "POLYLINE",
      "CIRCLE", "ARC", "SOLID", "TEXT"))
    assert(byEnt("POINT").head._4 == "POINT (3.5 -1.25)")
    assert(byEnt("POINT").head._1 == "sites")
    assert(byEnt("LINE").head._4 == "LINESTRING (0 0, 10 5)")
    // closed LWPOLYLINE ring comes back closed
    assert(byEnt("LWPOLYLINE").head._4 ==
      "LINESTRING (0 0, 4 0, 4 3, 0 3, 0 0)")
    assert(byEnt("POLYLINE").head._4 == "LINESTRING (1 1, 2 2.5, 3 2)")
    assert(byEnt("POLYLINE").head._1 == "rivers")
    // circle: closed ring of ~361 points on radius 2 about (5,5)
    val circ = graft.geom.Wkt.read(
      byEnt("CIRCLE").head._4).asInstanceOf[graft.geom.LineString]
    assert(circ.xy.length / 2 == 361)
    assert(circ.xy(0) == circ.xy(circ.xy.length - 2))
    for (i <- 0 until circ.xy.length / 2) {
      val r = math.hypot(circ.xy(2 * i) - 5.0, circ.xy(2 * i + 1) - 5.0)
      assert(math.abs(r - 2.0) < 1e-9)
    }
    // quarter arc from angle 0 to 90, radius 1: endpoints (1,0) and (0,1)
    val arc = graft.geom.Wkt.read(
      byEnt("ARC").head._4).asInstanceOf[graft.geom.LineString]
    assert(math.hypot(arc.xy(0) - 1.0, arc.xy(1)) < 1e-9)
    assert(math.hypot(arc.xy(arc.xy.length - 2), arc.xy.last - 1.0) < 1e-9)
    // SOLID bowtie order 1,2,4,3 -> a proper square of area 4
    val solid = graft.geom.Wkt.read(byEnt("SOLID").head._4)
    assert(math.abs(graft.geom.Measures.area(solid) - 4.0) < 1e-12)
    assert(byEnt("TEXT").head._3.contains("Main Street"))
    assert(byEnt("TEXT").head._4 == "POINT (7 8)")
  }

  test("BLOCKS/INSERT expansion: transform, by-block layer, array + nested inserts") {
    // block CHAIR (base 1,1): a unit-square LWPOLYLINE on layer "0" and a
    // POINT on its own layer "legs". Block DESKSET nests an INSERT of
    // CHAIR. ENTITIES places: CHAIR at (10,0) rotated 90 with scale 2,
    // a 2x1 array INSERT of CHAIR, and one DESKSET.
    val doc =
      """0
        |SECTION
        |2
        |BLOCKS
        |0
        |BLOCK
        |2
        |CHAIR
        |10
        |1.0
        |20
        |1.0
        |0
        |POINT
        |8
        |legs
        |10
        |1.0
        |20
        |1.0
        |0
        |LWPOLYLINE
        |8
        |0
        |70
        |1
        |10
        |1.0
        |20
        |1.0
        |10
        |2.0
        |20
        |1.0
        |10
        |2.0
        |20
        |2.0
        |10
        |1.0
        |20
        |2.0
        |0
        |ENDBLK
        |0
        |BLOCK
        |2
        |DESKSET
        |10
        |0.0
        |20
        |0.0
        |0
        |INSERT
        |8
        |0
        |2
        |CHAIR
        |10
        |5.0
        |20
        |0.0
        |0
        |ENDBLK
        |0
        |ENDSEC
        |0
        |SECTION
        |2
        |ENTITIES
        |0
        |INSERT
        |8
        |furniture
        |2
        |CHAIR
        |10
        |10.0
        |20
        |0.0
        |41
        |2.0
        |42
        |2.0
        |50
        |90.0
        |0
        |INSERT
        |8
        |arrayrow
        |2
        |CHAIR
        |10
        |100.0
        |20
        |0.0
        |70
        |2
        |71
        |1
        |44
        |10.0
        |0
        |INSERT
        |8
        |office
        |2
        |DESKSET
        |10
        |1000.0
        |20
        |0.0
        |0
        |ENDSEC
        |0
        |EOF
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("dxf_ins")
    java.nio.file.Files.writeString(dir.resolve("plan.dxf"), doc)
    val g = DxfIO.read(spark, dir.toString + "/plan.dxf")
    val rows = g.df.select($"layer", $"entity", st_asText($"geometry"))
      .as[(String, String, String)].collect().toSeq
    // rotated+scaled single insert: block point (1,1) is the base, so it
    // lands exactly at the insertion point (10,0); on its own layer
    assert(rows.contains(("legs", "POINT", "POINT (10 0)")))
    // the unit square (side 1, scale 2) rotated 90deg about (10,0):
    // corner (2,1)-(1,1)=(2,0) scaled ->(2,0)... rotated 90 -> (0,2)
    val furn = rows.filter(r => r._1 == "furniture" && r._2 == "LWPOLYLINE")
    assert(furn.size == 1)
    assert(furn.head._3 == "LINESTRING (10 0, 10 2, 8 2, 8 0, 10 0)")
    // 2x1 array: two copies 10 apart on the column axis
    assert(rows.contains(("legs", "POINT", "POINT (100 0)")))
    assert(rows.contains(("legs", "POINT", "POINT (110 0)")))
    assert(rows.count(r => r._1 == "arrayrow" && r._2 == "LWPOLYLINE") == 2)
    // nested: DESKSET at (1000,0) places CHAIR at +(5,0); the chair's
    // base point lands at (1005, 0)
    assert(rows.contains(("legs", "POINT", "POINT (1005 0)")))
    // by-block: the square on layer "0" adopts the placing INSERT's layer
    assert(rows.count(r => r._1 == "office" && r._2 == "LWPOLYLINE") == 1)
    // plain entity parse is unchanged: 3 inserts expand to 8 entities
    assert(rows.size == 8)
  }

  test("nested insert under non-uniform parent scale keeps child rotation axes") {
    // child block rotates 90deg inside a parent scaled (2,1): a point at
    // (1,0) in the child must land on the parent's y axis scaled by sy=1
    // (parameter composition sx*sx/rot+rot would put it at y=2)
    import DxfIO.{Block, Ent, Insert}
    val inner = Block(0, 0,
      Seq(Ent("0", "POINT", None, graft.geom.Point(1, 0))), Nil)
    val outer = Block(0, 0, Nil, Seq(Insert("0", "INNER", 0, 0, 1, 1, 90.0)))
    val blocks = Map("INNER" -> inner, "OUTER" -> outer)
    val got = DxfIO.instantiate(
      Insert("L", "OUTER", 100, 0, 2.0, 1.0, 0.0), blocks, 0)
    val p = got.head.geom.asInstanceOf[graft.geom.Point]
    assert(got.size == 1 && p.x == 100.0 && p.y == 1.0, got.toString)
    assert(got.head.layer == "L")
  }

  test("malformed input never crashes: garbage, truncation, bad numbers yield partial/empty") {
    val rnd = new scala.util.Random(3)
    // pure garbage text
    val junk = (0 until 200).map(_ => rnd.nextPrintableChar()).mkString("\n")
    assert(DxfIO.parseEntities(junk).isEmpty)
    // truncated mid-entity: everything complete BEFORE the cut survives
    val cut = doc.substring(0, doc.indexOf("CIRCLE") + 3)
    val partial = DxfIO.parseEntities(cut)
    assert(partial.exists(_.entity == "POINT") && partial.exists(_.entity == "LINE"))
    // non-numeric coordinates: the entity drops, the document survives
    val bad = doc.replaceFirst("3\\.5", "not-a-number")
    val ents = try DxfIO.parseEntities(bad) catch {
      case _: NumberFormatException => Seq.empty // also acceptable: reject loudly
    }
    // either the POINT dropped or parsing rejected — never a silent wrong point
    assert(!ents.exists(e => e.entity == "POINT" &&
      e.geom.asInstanceOf[graft.geom.Point].x == 3.5))
  }

  test("write/read roundtrip via writeDir; readFile directory dispatch") {
    val dir = java.nio.file.Files.createTempDirectory("dxf_rt").toString
    val src = Seq(
      ("a", "POINT (1 2)"),
      ("b", "LINESTRING (0 0, 3 4, 6 0)"),
      ("c", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
      ("d", "MULTIPOINT ((9 9), (8 8))"))
      .toDF("lyr", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt")).drop("wkt")
    DxfIO.writeDir(src.repartition(2), dir, layerColumn = Some("lyr"))
    val back = GeoDataFrame.readFile(spark, dir)
    val got = back.df.select($"layer", $"entity", st_asText($"geometry"))
      .as[(String, String, String)].collect().toSeq
    assert(got.count(_._2 == "POINT") == 3) // 1 point + 2 multipoint parts
    assert(got.filter(_._1 == "a").map(_._3) == Seq("POINT (1 2)"))
    assert(got.filter(_._1 == "b").map(_._3) ==
      Seq("LINESTRING (0 0, 3 4, 6 0)"))
    // polygon: one closed LWPOLYLINE per ring (outer + hole)
    val cRings = got.filter(_._1 == "c").map(_._3).sorted
    assert(cRings == Seq(
      "LINESTRING (0 0, 5 0, 5 5, 0 5, 0 0)",
      "LINESTRING (1 1, 2 1, 2 2, 1 2, 1 1)"))
    // single-file write path
    val one = java.nio.file.Files.createTempDirectory("dxf_one")
      .resolve("out.dxf").toString
    DxfIO.write(src, one, layerColumn = Some("lyr"))
    assert(DxfIO.read(spark, one).df.count() == got.size)
  }
}
