package graft.io

import java.nio.file.Files

import graft.geom.Sfc
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized roundtrips for the two r12 binary codecs (fixed seed —
  * deterministic). OSM: random nodes/ways through write -> blob-parallel
  * read must be value-identical on the 1e-7-degree grid. MVT: random
  * single-tile geometries must decode to exactly the grid quantization
  * the encoder spec defines, with spec winding.
  */
class TileOsmFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("osm.pbf fuzz: 300 random nodes + 60 random ways roundtrip") {
    val rnd = new scala.util.Random(42)
    def coord7(lo: Double, hi: Double): Double =
      math.rint((lo + (hi - lo) * rnd.nextDouble()) * 1e7) / 1e7
    val tagPool = Seq("highway", "name", "amenity", "building", "ref")
    val nodes = (1L to 300L).map { i =>
      val tags = (0 until rnd.nextInt(3)).map(_ =>
        tagPool(rnd.nextInt(tagPool.size)) -> s"v${rnd.nextInt(50)}").toMap
      (i, coord7(-179.9, 179.9), coord7(-84.9, 84.9), tags)
    }
    val ways = (1000L to 1059L).map { i =>
      val n = 2 + rnd.nextInt(6)
      val refs = Seq.fill(n)(1L + rnd.nextInt(300))
      (i, refs, Map("idx" -> i.toString))
    }
    val path = new java.io.File(
      Files.createTempDirectory("osmfuzz").toFile, "f.osm.pbf").getAbsolutePath
    OsmPbfIO.write(path, nodes, ways, Nil, blockSize = 64)

    val gotNodes = OsmPbfIO.readNodes(spark, path).orderBy($"osm_id").collect()
    assert(gotNodes.length === 300)
    for ((row, (id, lon, lat, tags)) <- gotNodes.zip(nodes)) {
      assert(row.getLong(0) === id)
      assert(math.abs(row.getDouble(1) - lon) < 5e-8)
      assert(math.abs(row.getDouble(2) - lat) < 5e-8)
      assert(row.getMap[String, String](3).toMap === tags)
    }
    val gotWays = OsmPbfIO.readWays(spark, path).orderBy($"osm_id").collect()
    assert(gotWays.length === 60)
    for ((row, (id, refs, tags)) <- gotWays.zip(ways)) {
      assert(row.getLong(0) === id)
      assert(row.getSeq[Long](1) === refs)
      assert(row.getMap[String, String](2).toMap === tags)
    }
  }

  test("mvt fuzz: random single-tile geometries decode to exact grid quantization") {
    val rnd = new scala.util.Random(7)
    val z = 7
    // fixed tile; keep geometry strictly inside so clipping is a no-op
    val x = Sfc.tileX(9.0, z); val y = Sfc.tileY(48.0, z)
    val (lonMin, latMin, lonMax, latMax) = Sfc.tileEnvelope(z, x, y)
    val padX = (lonMax - lonMin) * 0.05; val padY = (latMax - latMin) * 0.05
    def lon() = lonMin + padX + (lonMax - lonMin - 2 * padX) * rnd.nextDouble()
    def lat() = latMin + padY + (latMax - latMin - 2 * padY) * rnd.nextDouble()
    val n4 = (1L << z).toDouble
    def px(l: Double) = math.round(((l + 180.0) / 360.0 * n4 - x) * 4096)
    def py(l: Double) = {
      val r = math.toRadians(l)
      val wy = (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0
      math.round((wy * n4 - y) * 4096)
    }
    val pts = (1L to 40L).map(i => (i, lon(), lat()))
    val df = pts.toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
    val out = Files.createTempDirectory("mvtfuzz").toFile.getAbsolutePath
    val n = MvtIO.writeTiles(df, "geometry", out, zoom = z,
      layerName = "fuzz", idCol = Some("id"))
    assert(n === 1)
    val feats = MvtIO.readTileFile(s"$out/$z/$x/$y.pbf").head.features
    assert(feats.size === 40)
    val byId = feats.map(f => f.id.get -> f.coords.head).toMap
    for ((id, lo, la) <- pts) {
      assert(byId(id)(0) === px(lo), s"x of $id")
      assert(byId(id)(1) === py(la), s"y of $id")
    }
  }

  test("mvt fuzz: random polygons keep positive-area exterior winding") {
    val rnd = new scala.util.Random(11)
    val z = 6
    val x = Sfc.tileX(9.0, z); val y = Sfc.tileY(48.0, z)
    val (lonMin, latMin, lonMax, latMax) = Sfc.tileEnvelope(z, x, y)
    def star(cx: Double, cy: Double, r: Double, k: Int, cw: Boolean): String = {
      val pts = (0 until k).map { i =>
        val a = 2 * math.Pi * i / k * (if (cw) -1 else 1)
        val rr = r * (0.6 + 0.4 * rnd.nextDouble())
        s"${cx + rr * math.cos(a)} ${cy + rr * math.sin(a)}"
      }
      s"POLYGON ((${pts.mkString(", ")}, ${pts.head}))"
    }
    val cx0 = (lonMin + lonMax) / 2; val cy0 = (latMin + latMax) / 2
    val r0 = (lonMax - lonMin) * 0.2
    val rows = (1L to 20L).map(i =>
      (i, star(cx0, cy0, r0, 5 + rnd.nextInt(8), cw = i % 2 == 0)))
    val df = rows.toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT($"wkt"))
    val out = Files.createTempDirectory("mvtfuzz2").toFile.getAbsolutePath
    MvtIO.writeTiles(df, "geometry", out, zoom = z, layerName = "polys",
      idCol = Some("id"))
    val feats = MvtIO.readTileFile(s"$out/$z/$x/$y.pbf").head.features
    assert(feats.nonEmpty)
    for (f <- feats; ring = f.coords.head) {
      var a2 = 0L
      val k = ring.length / 2 - 1
      for (i <- 0 until k) {
        val j = (i + 1) % k
        a2 += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      }
      // regardless of input winding, the encoded exterior is positive
      assert(a2 > 0, s"feature ${f.id} exterior area2=$a2")
    }
  }
}
