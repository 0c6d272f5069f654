package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SpatiaLite writer cost/payoff at 1M rows (the r14 gpkg methodology):
  * write with/without the idx_ R*-tree, then a small-window pruned read
  * vs the full scan. Usage:
  * `sbt "runMain graft.tools.SlWriteProfile [nRows]"`.
  */
object SlWriteProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    import graft.sql.functions._

    val base = java.nio.file.Files.createTempDirectory("slprof").toString
    val src = graft.api.GeoDataFrame(
      spark.range(1, n + 1)
        .select(col("id").as("fid"), concat(lit("r_"), col("id")).as("name"),
          (col("id") % 1000).cast("double").as("v"))
        .withColumn("geom", expr(
          "st_asbinary(st_point(cast(fid % 1000 as double), cast(fid div 1000 as double)))")),
      "geom").setCrs("EPSG:4326")

    def timeIt(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(s"""{"op":"sl_write","mode":"$label","rows":$n,"wall_s":${f"$s%.2f"}}""")
      s
    }
    timeIt("write_no_index") {
      graft.io.SpatiaLiteIO.write(src, s"$base/a.sqlite", "pts", spatialIndex = false)
    }
    timeIt("write_with_rtree") {
      graft.io.SpatiaLiteIO.write(src, s"$base/b.sqlite", "pts")
    }
    // pruned window ~2.5k rows vs full scan
    def cnt(bbox: Option[(Double, Double, Double, Double)]): Long =
      graft.io.SpatiaLiteIO.read(spark, s"$base/b.sqlite", "pts", bbox = bbox)
        .df.count()
    require(cnt(Some((100.0, 100.0, 150.0, 150.0))) > 0)
    timeIt("pruned_window_read") { cnt(Some((100.0, 100.0, 150.0, 150.0))): Unit }
    timeIt("full_scan_read") { require(cnt(None) == n) }
    spark.stop()
  }
}
