package graft.io

import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FileGDB coordinate-quantization contract (see `FileGdbIO.write`
  * scaladoc): realized roundtrip error vs the documented bound, origin
  * integrality under a worst-case inexact data min corner, bit-exact
  * roundtrip of grid-exact boundary values, and the g120-style
  * 0.005-widened box predicate's invariance under write→read.
  */
class FileGdbQuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpGdb(): String =
    java.nio.file.Files.createTempDirectory("fgdbq").toString + "/data.gdb"

  private def roundtrip(rows: Seq[(Long, Double, Double)]): Map[Long, (Double, Double)] = {
    val df = rows.toDF("id", "x", "y")
      .withColumn("geometry", st_point($"x", $"y"))
    val gdb = tmpGdb()
    FileGdbIO.write(df, gdb, layerName = "pts")
    FileGdbIO.read(spark, gdb).df
      .select($"id", st_x($"geometry").as("bx"), st_y($"geometry").as("by"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("fuzz: realized max roundtrip error over 1k random coordinates " +
      "stays within the documented bound") {
    val rnd = new scala.util.Random(20260816L)
    // spread across magnitudes up to ~1e5, both signs — the min corner is
    // almost surely a non-representable fraction, exercising the
    // floor-snapped origin on every run
    val rows = (1 to 1000).map { i =>
      (i.toLong, (rnd.nextDouble() - 0.5) * 2e5, (rnd.nextDouble() - 0.5) * 2e5)
    }
    val back = roundtrip(rows)
    var maxErr = 0.0
    rows.foreach { case (id, x, y) =>
      val (bx, by) = back(id)
      maxErr = math.max(maxErr,
        math.max(math.abs(bx - x), math.abs(by - y)))
    }
    // documented: |decode − v| ≤ 0.5/xyScale + 2·ulp(v − origin); at
    // |v − origin| ≤ ~2e5 and xyScale = 1e9 that is < 6e-10 — assert
    // with headroom but well inside any 0.01 data grid
    assert(maxErr <= 2e-9, s"realized max roundtrip error $maxErr")
    assert(maxErr >= 0.0) // and it decoded at all
  }

  test("documented bound holds parametrically: coarse xyScale = 1e4 " +
      "keeps error within 0.5/xyScale + ulps") {
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 300).map { i =>
      (i.toLong, (rnd.nextDouble() - 0.5) * 2e5, (rnd.nextDouble() - 0.5) * 2e5)
    }
    val df = rows.toDF("id", "x", "y")
      .withColumn("geometry", st_point($"x", $"y"))
    val gdb = tmpGdb()
    FileGdbIO.write(df, gdb, layerName = "pts", xyScale = 1e4)
    val back = FileGdbIO.read(spark, gdb).df
      .select($"id", st_x($"geometry").as("bx"), st_y($"geometry").as("by"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    var maxErr = 0.0
    rows.foreach { case (id, x, y) =>
      val (bx, by) = back(id)
      maxErr = math.max(maxErr,
        math.max(math.abs(bx - x), math.abs(by - y)))
    }
    // 0.5/1e4 = 5e-5 plus arithmetic ulps; assert with small headroom
    assert(maxErr <= 5.1e-5, s"xyScale=1e4 realized error $maxErr")
  }

  test("grid-exact boundary values roundtrip bit-exactly even with a " +
      "worst-case inexact data min corner") {
    // id 1 sets the layer extent's min corner to −821.16 — NOT an exact
    // double; the writer snaps the origin to floor(min)−1 = −823 (an
    // integer, exactly representable), so exact values like 0.0 / 5000.0 /
    // 400.0 must decode bit-identically
    val rows = Seq(
      (1L, -821.16, 33.33),
      (2L, 0.0, 0.0),
      (3L, 5000.0, 400.0),
      (4L, 0.01, 10.0),
      (5L, -0.01, 390.0),
      (6L, 4999.99, 400.0),
      (7L, 5000.01, 410.0))
    val back = roundtrip(rows)
    Seq(2L, 3L).foreach { id =>
      val (x, y) = rows.find(_._1 == id).map(r => (r._2, r._3)).get
      val (bx, by) = back(id)
      assert(java.lang.Double.doubleToLongBits(bx) ==
        java.lang.Double.doubleToLongBits(x), s"id=$id x: $bx != $x")
      assert(java.lang.Double.doubleToLongBits(by) ==
        java.lang.Double.doubleToLongBits(y), s"id=$id y: $by != $y")
    }
    // inexact 2-decimal values: drift must stay orders below the 0.005
    // half-grid margin the g120 contract relies on
    rows.foreach { case (id, x, y) =>
      val (bx, by) = back(id)
      assert(math.abs(bx - x) < 1e-6, s"id=$id x drift ${bx - x}")
      assert(math.abs(by - y) < 1e-6, s"id=$id y drift ${by - y}")
    }
  }

  test("0.005-widened box predicate is invariant under write→read " +
      "(the g120 contract)") {
    // plant coordinates ON the old exact bounds (x = 0.00 / 5000.00,
    // y = 400.0) plus near-boundary 0.01-grid values and an inexact
    // negative min corner; the widened box must select the same rows
    // before and after the gdb roundtrip
    val planted = Seq(
      (1L, 0.00, 400.0), (2L, 5000.00, 0.0), (3L, 0.00, 0.0),
      (4L, 5000.00, 400.0), (5L, -0.01, 200.0), (6L, 5000.01, 200.0),
      (7L, 2500.37, 410.0), (8L, -821.16, 33.33), (9L, 4999.99, 399.9),
      (10L, 0.01, 400.1))
    val rnd = new scala.util.Random(7L)
    val cloud = (11 to 510).map { i =>
      (i.toLong,
        math.rint((rnd.nextDouble() * 12000 - 1000) * 100) / 100,
        math.rint(rnd.nextDouble() * 50) * 10.0)
    }
    val rows = planted ++ cloud
    def inBox(x: Double, y: Double): Boolean =
      x >= -0.005 && x <= 5000.005 && y >= -0.005 && y <= 400.005
    val expected = rows.count(r => inBox(r._2, r._3))
    // sanity: the planted boundary rows are actually in the box
    assert(rows.take(4).forall(r => inBox(r._2, r._3)))
    val back = roundtrip(rows)
    val got = back.values.count { case (x, y) => inBox(x, y) }
    assert(got == expected, s"widened-box count changed: $got != $expected")
  }
}
