package graft.io

import java.nio.file.Files

import graft.geom.Sfc
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MVT writer/reader roundtrip: the decoded protobuf must reproduce the
  * grid-quantized geometry, spec winding, and typed properties. The
  * decoder is an independent walk of the published wire format, so
  * agreement here is a two-sided check on the codec.
  */
class MvtIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("mvt").toFile.getAbsolutePath

  test("point tiles roundtrip with typed properties and ids") {
    val df = Seq(
      (1L, -87.65, 41.85, "chicago", 2.7, true),
      (2L, 139.70, 35.66, "tokyo", 9.1, false),
      (3L, -87.60, 41.80, "chicago-2", -1.5, true))
      .toDF("id", "lon", "lat", "name", "score", "flag")
      .withColumn("geometry", st_point(col("lon"), col("lat")))
    val out = tmpDir()
    val n = MvtIO.writeTiles(df, "geometry", out, zoom = 4,
      layerName = "cities", propCols = Seq("name", "score", "flag"),
      idCol = Some("id"))
    assert(n === 2) // chicago pair shares a z4 tile; tokyo has its own

    val xChi = Sfc.tileX(-87.65, 4); val yChi = Sfc.tileY(41.85, 4)
    val layers = MvtIO.readTileFile(s"$out/4/$xChi/$yChi.pbf")
    assert(layers.map(_.name) === Seq("cities"))
    val l = layers.head
    assert(l.extent === 4096)
    assert(l.features.size === 2)
    val byId = l.features.map(f => f.id.get -> f).toMap
    assert(byId.keySet === Set(1L, 3L))
    assert(byId(1L).geomType === 1)
    assert(byId(1L).props("name") === "chicago")
    assert(byId(1L).props("score") === 2.7)
    assert(byId(1L).props("flag") === true)
    assert(byId(3L).props("score") === -1.5)
    assert(byId(3L).props("flag") === true)
    // quantized coordinates match the grid formula exactly
    val n4 = 16.0
    def px(lon: Double) = math.round(((lon + 180.0) / 360.0 * n4 - xChi) * 4096)
    assert(byId(1L).coords.head(0) === px(-87.65))
    // both coords inside the extent
    for (f <- l.features; c <- f.coords)
      assert(c(0) >= 0 && c(0) <= 4096 && c(1) >= 0 && c(1) <= 4096)
  }

  test("polygon spanning tiles is clipped per tile with spec winding") {
    // a rectangle spanning two z5 tiles horizontally
    val wkt = "POLYGON ((-1 40.2, 12 40.2, 12 48.5, -1 48.5, -1 40.2))"
    val df = Seq((1L, wkt)).toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT(col("wkt")))
    val out = tmpDir()
    val n = MvtIO.writeTiles(df, "geometry", out, zoom = 5, layerName = "areas")
    // covers tiles x in {15,16,17} at z5 (lon -1..12 -> x 15..17)
    assert(n === Sfc.tileCover(-1, 40.2, 12, 48.5, 5).length)
    val x0 = Sfc.tileX(0.0, 5); val y0 = Sfc.tileY(45.0, 5)
    val layers = MvtIO.readTileFile(s"$out/5/$x0/$y0.pbf")
    val f = layers.head.features.head
    assert(f.geomType === 3)
    assert(f.coords.nonEmpty)
    // exterior winding: positive area in y-down coords, ring re-closed
    val ring = f.coords.head
    assert(ring(0) === ring(ring.length - 2) && ring(1) === ring(ring.length - 1))
    var a2 = 0L
    val k = ring.length / 2 - 1
    for (i <- 0 until k) {
      val j = (i + 1) % k
      a2 += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
    }
    assert(a2 > 0, s"exterior ring must be positive-area (got $a2)")
    // clip margin: coords stay within extent + buffer
    for (c <- f.coords; i <- 0 until c.length / 2) {
      assert(c(2 * i) >= -8 && c(2 * i) <= 4096 + 8)
      assert(c(2 * i + 1) >= -8 && c(2 * i + 1) <= 4096 + 8)
    }
  }

  test("polygon with hole: interior ring encodes negative-area winding") {
    // donut well inside one z4 tile (no clipping)
    val wkt = "POLYGON ((2 42, 8 42, 8 47, 2 47, 2 42), (4 43.5, 6 43.5, 6 45.5, 4 45.5, 4 43.5))"
    val df = Seq((1L, wkt)).toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT(col("wkt")))
    val out = tmpDir()
    MvtIO.writeTiles(df, "geometry", out, zoom = 4, layerName = "d")
    val x = Sfc.tileX(5.0, 4); val y = Sfc.tileY(44.0, 4)
    val f = MvtIO.readTileFile(s"$out/4/$x/$y.pbf").head.features.head
    assert(f.coords.length === 2, "hole ring lost")
    def area2(ring: Array[Long]): Long = {
      var s = 0L
      val k = ring.length / 2 - 1
      for (i <- 0 until k) {
        val j = (i + 1) % k
        s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      }
      s
    }
    assert(area2(f.coords(0)) > 0, "exterior must be positive")
    assert(area2(f.coords(1)) < 0, "interior must be negative")
  }

  test("linestring crossing a tile edge decodes as a connected path") {
    val df = Seq((7L, "LINESTRING (-2 41, 9 43, 9.5 47)"))
      .toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT(col("wkt")))
    val out = tmpDir()
    val n = MvtIO.writeTiles(df, "geometry", out, zoom = 5,
      layerName = "roads", idCol = Some("id"))
    assert(n >= 2)
    val x0 = Sfc.tileX(0.0, 5); val y0 = Sfc.tileY(42.0, 5)
    val layers = MvtIO.readTileFile(s"$out/5/$x0/$y0.pbf")
    val f = layers.head.features.head
    assert(f.id === Some(7L))
    assert(f.geomType === 2)
    assert(f.coords.head.length >= 4) // at least two points decoded
  }

  test("writePyramid: per-zoom dirs compose, coarse zooms simplify") {
    // a many-vertex ring (64-gon) that per-zoom simplification thins
    val pts = (0 until 64).map { i =>
      val a = 2 * math.Pi * i / 64
      s"${(5 + 4 * math.cos(a)).formatted("%.5f")} ${(45 + 3 * math.sin(a)).formatted("%.5f")}"
    }
    val wkt = s"POLYGON ((${pts.mkString(", ")}, ${pts.head}))"
    val df = Seq((1L, wkt)).toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT(col("wkt")))
    val out = tmpDir()
    val total = MvtIO.writePyramid(df, "geometry", out,
      minZoom = 2, maxZoom = 6, layerName = "areas", simplifyPx = 2.0)
    assert(total >= 5) // at least one tile per zoom
    for (z <- 2 to 6)
      assert(new java.io.File(s"$out/$z").isDirectory, s"missing zoom $z")
    def ringSize(z: Int): Int = {
      val x = Sfc.tileX(5.0, z); val y = Sfc.tileY(45.0, z)
      val layers = MvtIO.readTileFile(s"$out/$z/$x/$y.pbf")
      layers.head.features.head.coords.head.length / 2
    }
    // the whole polygon fits one z2 tile: its ring must arrive simplified
    // (the 64-gon's sagitta is far below the z2 tolerance) but valid
    assert(ringSize(2) < 40 && ringSize(2) >= 4,
      s"z2 ring ${ringSize(2)} not simplified (original 64)")
    // finest zoom still decodes a polygon feature at the center tile
    val zx = Sfc.tileX(5.0, 6); val zy = Sfc.tileY(45.0, 6)
    val fine = MvtIO.readTileFile(s"$out/6/$zx/$zy.pbf")
    assert(fine.head.features.head.geomType === 3)
  }

  test("streamTiles: incremental refresh keeps untouched tiles in place") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, Double)]
    val stream = mem.toDF().toDF("id", "lon", "lat")
      .withColumn("geometry", st_point(col("lon"), col("lat")))
    val out = tmpDir()
    val q = MvtIO.streamTiles(stream, "geometry", out, zoom = 3,
      layerName = "live", idCol = Some("id"))
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1L, -87.65, 41.85)) // chicago tile
    q.processAllAvailable()
    mem.addData((2L, 139.70, 35.66)) // tokyo tile — different z3 tile
    q.processAllAvailable()
    q.stop()
    val xc = Sfc.tileX(-87.65, 3); val yc = Sfc.tileY(41.85, 3)
    val xt = Sfc.tileX(139.70, 3); val yt = Sfc.tileY(35.66, 3)
    // batch 2 must NOT have deleted batch 1's tile
    assert(new java.io.File(s"$out/3/$xc/$yc.pbf").exists(), "batch-1 tile lost")
    assert(new java.io.File(s"$out/3/$xt/$yt.pbf").exists(), "batch-2 tile missing")
    assert(MvtIO.readTileFile(s"$out/3/$xc/$yc.pbf").head.features.head.id === Some(1L))
    assert(MvtIO.readTileFile(s"$out/3/$xt/$yt.pbf").head.features.head.id === Some(2L))
  }

  test("degenerate-at-zoom geometries are dropped, not corrupted") {
    // a sliver far smaller than one z0 grid cell quantizes to nothing
    val df = Seq((1L, "POLYGON ((10 10, 10.00001 10, 10.00001 10.00001, 10 10.00001, 10 10))"))
      .toDF("id", "wkt")
      .withColumn("geometry", st_geomFromWKT(col("wkt")))
    val out = tmpDir()
    val n = MvtIO.writeTiles(df, "geometry", out, zoom = 0, layerName = "l",
      extent = 256)
    assert(n === 0) // encoder drops it; no tile file is written
  }
}
