package graft.tools

/** Writes the SpatiaLite-writer validation files that
  * tools/check_spatialite_write.py inspects with REAL SQLite:
  *  - /tmp/sl_check.sqlite      single layer, 3000 points, idx_ rtree
  *  - /tmp/sl_check_multi.sqlite two layers
  *  - /tmp/gpkg_check_multi.gpkg two layers (the gpkg writeLayers half)
  */
object WriteSpatiaLiteCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def pts(n: Int) = {
      val df = (0 until n).map(i => (i + 1L, s"s_$i", (i % 60) * 10.0, (i / 60) * 10.0))
        .toDF("fid", "name", "x", "y")
        .withColumn("geom", expr("st_asbinary(st_point(x, y))")).drop("x", "y")
      graft.api.GeoDataFrame(df, "geom").setCrs("EPSG:4326")
    }
    graft.io.SpatiaLiteIO.write(pts(3000), "/tmp/sl_check.sqlite", "pts")
    graft.io.SpatiaLiteIO.writeLayers(
      Seq("alpha" -> pts(500), "beta" -> pts(120)), "/tmp/sl_check_multi.sqlite")
    graft.io.GeoPackageIO.writeLayers(
      Seq("alpha" -> pts(500), "beta" -> pts(120)), "/tmp/gpkg_check_multi.gpkg")
    println("wrote /tmp/sl_check.sqlite /tmp/sl_check_multi.sqlite /tmp/gpkg_check_multi.gpkg")
    spark.stop()
  }
}
