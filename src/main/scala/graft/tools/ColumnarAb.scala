package graft.tools

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-columnar A/B at sf1 scale (VERDICT r11 #6 — final go/no-go on
  * the Arrow-native geometry path): does scanning GeoParquet's NATIVE
  * geoarrow encoding (nested coordinate structs, no WKB decode) plus a
  * codegen'd columnar envelope prefilter beat the engine's WKB route once
  * per-partition row counts are large enough that fixed stage overhead
  * stops dominating?
  *
  * Two shapes, both over /root/sf1_local-derived fixtures:
  *  - g03-like: 6M points, selective box filter.
  *      A  = WKB parquet scan -> st_intersectsbox(geometry, box)
  *      B  = geoarrow parquet scan -> plain struct-field range predicate
  *           (whole-stage codegen + parquet min/max pushdown candidate)
  *  - g16-like: 600k small polygons, literal-mask intersects.
  *      A  = WKB scan -> st_intersects(geometry, mask)
  *      A2 = WKB scan -> st_intersectsbox prefilter + st_intersects refine
  *      B  = geoarrow scan -> EXISTS()-HOF envelope prefilter on the
  *           nested structs + st_intersects(st_fromgeoarrow(...)) refine
  *
  * Prints median-of-N warm timings; the go/no-go note lands in PROFILE.md.
  */
object ColumnarAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/sf1_local")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)

    def timed(label: String)(df: => DataFrame): Long = {
      df.count() // warm
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply((iters - 1) / 2)
      println(f"$label%-58s ${med}%7.3f s   rows=${times.head._2}")
      times.head._2
    }

    // ---------------- g03 shape: 6M points ----------------
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("id"),
        (col("l_partkey") % 10000).cast("double").as("x"),
        (col("l_suppkey") % 1009 * 9.9).cast("double").as("y"))
    val pts = li.withColumn("geometry", st_point(col("x"), col("y")))
      .select(col("id"), col("geometry"))
    val pWkb = "/tmp/graft_ab_pts_wkb"
    val pArr = "/tmp/graft_ab_pts_arrow"
    graft.io.GeoParquetIO.write(GeoDataFrame(pts, "geometry"), pWkb)
    graft.io.GeoParquetIO.write(GeoDataFrame(pts, "geometry"), pArr,
      geometryEncoding = "point")
    // selective window ~5%
    val (qx0, qy0, qx1, qy1) = (1000.0, 1000.0, 3000.0, 3000.0)

    println(s"== g03 shape: 6,000,000 points, ~5% box (iters=$iters) ==")
    val na = timed("A  WKB scan + st_intersectsbox") {
      spark.read.parquet(pWkb)
        .filter(st_intersectsBox(col("geometry"),
          lit(qx0), lit(qy0), lit(qx1), lit(qy1)))
    }
    val nb = timed("B  geoarrow scan + struct-field range predicate") {
      spark.read.parquet(pArr)
        .filter(col("geometry.x") >= qx0 && col("geometry.x") <= qx1 &&
          col("geometry.y") >= qy0 && col("geometry.y") <= qy1)
    }
    require(na == nb, s"point A/B row mismatch: $na vs $nb")

    // ---------------- g16 shape: 600k small polygons ----------------
    val polys = li.filter(col("id") % 10 === 0)
      .withColumn("geometry",
        st_buffer(st_point(col("x"), col("y")), lit(25.0), lit(4)))
      .select(col("id"), col("geometry"))
    val gWkb = "/tmp/graft_ab_poly_wkb"
    val gArr = "/tmp/graft_ab_poly_arrow"
    graft.io.GeoParquetIO.write(GeoDataFrame(polys, "geometry"), gWkb)
    graft.io.GeoParquetIO.write(GeoDataFrame(polys, "geometry"), gArr,
      geometryEncoding = "polygon")
    val maskWkt = s"POLYGON(($qx0 $qy0, $qx1 $qy0, $qx1 $qy1, $qx0 $qy1, $qx0 $qy0))"
    val mask = expr(s"st_geomfromwkt('$maskWkt')")

    println(s"== g16 shape: 600,000 5-seg polygons, ~5% mask (iters=$iters) ==")
    val pa = timed("A  WKB scan + st_intersects(mask)") {
      spark.read.parquet(gWkb).filter(st_intersects(col("geometry"), mask))
    }
    val pa2 = timed("A2 WKB scan + intersectsbox prefilter + refine") {
      spark.read.parquet(gWkb)
        .filter(st_intersectsBox(col("geometry"),
          lit(qx0), lit(qy0), lit(qx1), lit(qy1)) &&
          st_intersects(col("geometry"), mask))
    }
    val pb = timed("B  geoarrow scan + EXISTS-HOF prefilter + refine") {
      // envelope-intersects on nested structs: exists a vertex on each
      // side of each box edge (minX <= qx1 == exists x <= qx1, etc.)
      val vs = flatten(col("geometry"))
      spark.read.parquet(gArr)
        .filter(exists(vs, v => v("x") <= qx1) && exists(vs, v => v("x") >= qx0) &&
          exists(vs, v => v("y") <= qy1) && exists(vs, v => v("y") >= qy0))
        .filter(st_intersects(
          st_fromGeoArrow("polygon", col("geometry")), mask))
    }
    require(pa == pb && pa == pa2, s"polygon A/B row mismatch: $pa / $pa2 / $pb")
    spark.stop()
  }
}
