package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** gpkg write-path A/B: full write wall with and without the R*-tree
  * build at n rows (driver-side single-writer contract both ways), plus
  * a pruned-read wall on the indexed file. Warm min-of-2 per leg.
  *
  * Usage: `sbt "runMain graft.tools.GpkgWriteProfile [nRows]"`
  */
object GpkgWriteProfile {
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
    val side = math.max(1, math.sqrt(n.toDouble).toInt)
    val df = spark.range(n)
      .selectExpr("id AS k", s"(id % $side) * 10.0 AS x", s"(id / $side) * 10.0 AS y")
      .withColumn("geom", expr("st_asbinary(st_point(x, y))"))
      .drop("x", "y")
    val gdf = graft.api.GeoDataFrame(df, "geom")
    val base = java.nio.file.Files.createTempDirectory("gpkgprof").toString
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(s"""{"op":"gpkg_write","mode":"$label","rows":$n,"wall_s":${f"$best%.2f"}}""")
    }
    time("no_index")(graft.io.GeoPackageIO.write(gdf, s"$base/a.gpkg", "pts",
      spatialIndex = false))
    time("with_rtree")(graft.io.GeoPackageIO.write(gdf, s"$base/b.gpkg", "pts"))
    // pruned read on the indexed file: a small window via the R*-tree
    def pruned(): Long = graft.io.GeoPackageIO.read(spark, s"$base/b.gpkg", "pts",
      bbox = Some((95.0, 95.0, 555.0, 555.0))).count()
    val expect = pruned()
    val best = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      require(pruned() == expect)
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"""{"op":"gpkg_pruned_read","rows":$n,"hit":$expect,"wall_s":${f"$best%.2f"}}""")
    spark.stop()
  }
}
