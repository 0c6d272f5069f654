package graft.io

import java.nio.file.Files

import graft.geom.Sfc
import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PMTiles v3 archive: id math, directory varint coding, header layout,
  * dedup accounting, and byte-exact tile retrieval from a real MVT
  * pyramid.
  */
class PmTilesIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tileId is the cumulative hilbert id and inverts exactly") {
    assert(PmTilesIO.tileId(0, 0, 0) === 0L)
    assert(PmTilesIO.tileId(1, 0, 0) === 1L)
    assert(PmTilesIO.tileId(2, 0, 0) === 5L)
    // roundtrip across zooms and positions
    for (z <- 0 to 9; _ <- 1 to 8) {
      val rnd = new scala.util.Random(z * 31)
      val x = rnd.nextInt(1 << z); val y = rnd.nextInt(1 << z)
      assert(PmTilesIO.tileZXY(PmTilesIO.tileId(z, x, y)) === ((z, x, y)),
        s"roundtrip failed at z=$z x=$x y=$y")
    }
    // ids within a zoom are dense: [base, base + 4^z)
    val ids3 = for (x <- 0 until 8; y <- 0 until 8)
      yield PmTilesIO.tileId(3, x, y)
    assert(ids3.sorted === (21L until 21L + 64L))
  }

  test("pyramid -> archive -> byte-exact tile retrieval") {
    val pts = Seq((1L, -87.65, 41.85), (2L, 139.70, 35.66), (3L, 9.1, 48.7))
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
    val pyramid = Files.createTempDirectory("pmt").toFile.getAbsolutePath
    MvtIO.writePyramid(pts, "geometry", pyramid, minZoom = 1, maxZoom = 4,
      layerName = "pts", idCol = Some("id"))
    val archive = pyramid + "/out.pmtiles"
    val n = PmTilesIO.fromPyramid(spark, pyramid, archive)
    assert(n >= 4)

    val h = PmTilesIO.readHeader(spark, archive)
    assert(h.clustered && h.minZoom === 1 && h.maxZoom === 4)
    assert(h.tileEntries === n && h.addressedTiles === n)
    assert(PmTilesIO.metadata(spark, archive).contains("graft"))

    // every pyramid file comes back byte-identical through the archive
    for (z <- 1 to 4) {
      val zdir = new java.io.File(s"$pyramid/$z")
      for (xd <- zdir.listFiles(); f <- xd.listFiles()
           if f.getName.endsWith(".pbf")) {
        val x = xd.getName.toInt
        val y = f.getName.stripSuffix(".pbf").toInt
        val expected = java.nio.file.Files.readAllBytes(f.toPath)
        val got = PmTilesIO.readTile(spark, archive, z, x, y)
        assert(got != null && got.sameElements(expected), s"tile $z/$x/$y")
      }
    }
    // absent tile -> null
    assert(PmTilesIO.readTile(spark, archive, 4, 0, 0) == null)
    // directory entries are sorted by tile id (clustered contract)
    val es = PmTilesIO.entries(spark, archive)
    assert(es.map(_.tileId) === es.map(_.tileId).sorted)
  }

  test("leaf directories: small leafSize forces the two-level layout") {
    // a grid of points spread across many z5 tiles
    val pts = (for (i <- 0 until 6; j <- 0 until 4) yield
      ((i * 4 + j).toLong, -150.0 + i * 50.0, -60.0 + j * 35.0))
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
    val pyramid = Files.createTempDirectory("pmtl").toFile.getAbsolutePath
    MvtIO.writeTiles(pts, "geometry", pyramid, zoom = 5, layerName = "p",
      idCol = Some("id"))
    val archive = pyramid + "/out.pmtiles"
    val n = PmTilesIO.fromPyramid(spark, pyramid, archive, leafSize = 4)
    assert(n >= 12)
    val h = PmTilesIO.readHeader(spark, archive)
    assert(h.leafLength > 0, "expected a leaf section")
    val roots = PmTilesIO.rootEntries(spark, archive)
    assert(roots.forall(_.runLength === 0), "root must hold leaf pointers")
    assert(roots.size >= 3)
    // expanded entries equal the tile count and every tile reads back
    val es = PmTilesIO.entries(spark, archive)
    assert(es.size.toLong === n)
    for (z <- Seq(5)) {
      val zdir = new java.io.File(s"$pyramid/$z")
      for (xd <- zdir.listFiles(); f <- xd.listFiles()
           if f.getName.endsWith(".pbf")) {
        val x = xd.getName.toInt
        val y = f.getName.stripSuffix(".pbf").toInt
        val expected = java.nio.file.Files.readAllBytes(f.toPath)
        val got = PmTilesIO.readTile(spark, archive, z, x, y)
        assert(got != null && got.sameElements(expected), s"tile $z/$x/$y")
      }
    }
    assert(PmTilesIO.readTile(spark, archive, 5, 31, 31) == null)
  }

  test("identical tile contents are deduplicated in the data section") {
    // two points in DIFFERENT z1 tiles but identical tile-local position
    // and id -> identical pbf bytes
    val z = 1
    def centerOf(x: Int, y: Int): (Double, Double) = {
      val (a, b, c, d) = Sfc.tileEnvelope(z, x, y)
      ((a + c) / 2, {
        // pick the lat whose tile-local py is the same in both rows: use
        // the northern tile pair (0,0) and (1,0) -> same y, so any lat works
        (b + d) / 2
      })
    }
    val (lon1, lat1) = centerOf(0, 0)
    val (lon2, _) = centerOf(1, 0)
    val pts = Seq((7L, lon1, lat1), (7L, lon2, lat1)) // same id, same local pos
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
    val pyramid = Files.createTempDirectory("pmtd").toFile.getAbsolutePath
    MvtIO.writeTiles(pts, "geometry", pyramid, zoom = z, layerName = "p",
      idCol = Some("id"))
    val archive = pyramid + "/out.pmtiles"
    PmTilesIO.fromPyramid(spark, pyramid, archive)
    val h = PmTilesIO.readHeader(spark, archive)
    assert(h.tileEntries === 2)
    assert(h.tileContents === 1, "identical blobs must share data")
    val a = PmTilesIO.readTile(spark, archive, z, 0, 0)
    val b = PmTilesIO.readTile(spark, archive, z, 1, 0)
    assert(a.sameElements(b))
  }
}
