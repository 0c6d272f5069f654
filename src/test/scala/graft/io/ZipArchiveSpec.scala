package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZipArchiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("zipds").toFile
    d.deleteOnExit()
    d
  }

  /** Zip every file under `dir` (flat) into `zipPath`, optionally under a
    * nested folder prefix like real agency downloads use.
    */
  private def zipUp(dir: java.io.File, zipPath: java.io.File,
      prefix: String = ""): Unit = {
    val zout = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    try {
      dir.listFiles().filter(_.isFile).sortBy(_.getName).foreach { f =>
        zout.putNextEntry(new java.util.zip.ZipEntry(prefix + f.getName))
        java.nio.file.Files.copy(f.toPath, zout)
        zout.closeEntry()
      }
    } finally zout.close()
  }

  test("zipped shapefile trio reads through readFile, nested folder entries flatten") {
    val root = tmpDir()
    val ds = new java.io.File(root, "ds"); ds.mkdirs()
    val rows = (0 until 60).map { i =>
      (i.toLong, s"n_$i", Wkb.write(Point(i * 2.0, -i * 0.5)))
    }
    ShapefileIO.write(rows.toDF("id", "nm", "geometry").coalesce(1),
      ds.getAbsolutePath)
    val zip = new java.io.File(root, "data.zip")
    zipUp(ds, zip, prefix = "published/2024/") // nested like agency downloads

    val back = GeoDataFrame.readFile(spark, zip.getAbsolutePath).df
      .select($"id", $"nm",
        expr("st_x(st_geomfromwkb(geometry))").as("x"),
        expr("st_y(st_geomfromwkb(geometry))").as("y"))
      .as[(Long, String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(back.size == 60)
    back.zipWithIndex.foreach { case ((id, nm, x, y), i) =>
      assert(id == i && nm == s"n_$i" && x == i * 2.0 && y == -i * 0.5)
    }

    // second read hits the content-addressed cache (same extracted dir)
    val d1 = ZipArchive.extract(spark, zip.getAbsolutePath)
    val d2 = ZipArchive.extract(spark, zip.getAbsolutePath)
    assert(d1 == d2)
  }

  test("zipped single-file dataset (gpkg) dispatches as the sole file") {
    val root = tmpDir()
    val ds = new java.io.File(root, "one"); ds.mkdirs()
    val gpkg = new java.io.File(ds, "pts.gpkg")
    val gdf = GeoDataFrame(
      (0 until 25).map(i => (i.toLong, Wkb.write(Point(i * 1.0, i * 3.0))))
        .toDF("id", "geometry"), "geometry")
    GeoPackageIO.write(gdf, gpkg.getAbsolutePath, "pts")
    val zip = new java.io.File(root, "one.zip")
    zipUp(ds, zip)

    val back = GeoDataFrame.readFile(spark, zip.getAbsolutePath).df
    assert(back.count() == 25)
    val got = back.select($"id", expr("st_y(st_geomfromwkb(geometry))").as("y"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.forall { case (id, y) => y == id * 3.0 })
  }

  test("kmz dispatches to the doc.kml inside") {
    val root = tmpDir()
    val ds = new java.io.File(root, "kml"); ds.mkdirs()
    val gdf = GeoDataFrame(
      (0 until 15).map(i => (s"pm_$i", Wkb.write(Point(i * 1.0, -i * 2.0))))
        .toDF("name", "geometry").coalesce(1), "geometry")
    KmlIO.write(gdf, ds.getAbsolutePath)
    // rename the single part to doc.kml like Google Earth emits
    val part = ds.listFiles().filter(_.getName.endsWith(".kml")).head
    val doc = new java.io.File(ds, "doc.kml")
    assert(part.renameTo(doc))
    val kmz = new java.io.File(root, "export.kmz")
    zipUp(ds, kmz)
    val back = GeoDataFrame.readFile(spark, kmz.getAbsolutePath).df
    assert(back.count() == 15)
    val ys = back.select(expr("st_y(geometry)").as("y"))
      .as[Double].collect().sorted
    assert(ys.head == -28.0 && ys.last == 0.0)
  }

  test("readme/license sidecars do not defeat sole-data-file dispatch") {
    val root = tmpDir()
    val ds = new java.io.File(root, "pub"); ds.mkdirs()
    val gpkg = new java.io.File(ds, "pts.gpkg")
    val gdf = GeoDataFrame(
      (0 until 10).map(i => (i.toLong, Wkb.write(Point(i * 1.0, i * 1.0))))
        .toDF("id", "geometry"), "geometry")
    GeoPackageIO.write(gdf, gpkg.getAbsolutePath, "pts")
    java.nio.file.Files.write(new java.io.File(ds, "README.txt").toPath,
      "metadata".getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(ds, "LICENSE.pdf").toPath,
      "license".getBytes("UTF-8"))
    val zip = new java.io.File(root, "pub.zip")
    zipUp(ds, zip)
    assert(GeoDataFrame.readFile(spark, zip.getAbsolutePath).df.count() == 10)

    // a failed extraction leaves no .inprogress dirs behind
    val bomb = new java.io.File(root, "dup.zip")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(bomb))
    z.putNextEntry(new java.util.zip.ZipEntry("a/x.txt")); z.write("1".getBytes)
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("b/x.txt")); z.write("2".getBytes)
    z.closeEntry(); z.close()
    val scratch = new java.io.File(System.getProperty("java.io.tmpdir"))
    def inprogress(): Set[String] =
      scratch.listFiles().map(_.getName).filter(_.contains(".inprogress")).toSet
    val before = inprogress()
    intercept[IllegalArgumentException] {
      ZipArchive.extract(spark, bomb.getAbsolutePath)
    }
    assert(inprogress() == before,
      "failed extraction must clean its temp dir")
  }

  test("zip-slip and duplicate basenames are rejected; changed zip re-extracts") {
    val root = tmpDir()
    val evil = new java.io.File(root, "evil.zip")
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(evil))
    zout.putNextEntry(new java.util.zip.ZipEntry("../escape.txt"))
    zout.write("x".getBytes); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("a/f.dat"))
    zout.write("1".getBytes); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("b/f.dat"))
    zout.write("2".getBytes); zout.closeEntry()
    zout.close()
    // ../escape.txt flattens to escape.txt (no traversal); a/f.dat + b/f.dat
    // collide after flattening → loud error, not silent overwrite
    val err = intercept[IllegalArgumentException] {
      ZipArchive.extract(spark, evil.getAbsolutePath)
    }
    assert(err.getMessage.contains("duplicate basename"))
    assert(!new java.io.File(root.getParentFile, "escape.txt").exists())

    // key includes mtime+len: rewriting the zip yields a fresh extraction
    val ok = new java.io.File(root, "ok.zip")
    val z1 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(ok))
    z1.putNextEntry(new java.util.zip.ZipEntry("v.txt")); z1.write("1".getBytes)
    z1.closeEntry(); z1.close()
    val e1 = ZipArchive.extract(spark, ok.getAbsolutePath)
    Thread.sleep(1100) // distinct mtime at 1s filesystem resolution
    val z2 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(ok))
    z2.putNextEntry(new java.util.zip.ZipEntry("v.txt")); z2.write("22".getBytes)
    z2.closeEntry(); z2.close()
    val e2 = ZipArchive.extract(spark, ok.getAbsolutePath)
    assert(e1 != e2)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(e2).getPath, "v.txt")), "UTF-8")
    assert(content == "22")
  }
}
