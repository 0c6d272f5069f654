package graft.tools
object WriteGpkgRtree {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 3000).map(i => (i.toLong, (i % 60) * 10.0, (i / 60) * 10.0))
      .toDF("k", "x", "y")
      .withColumn("geom", expr("st_asbinary(st_point(x, y))")).drop("x", "y")
    graft.io.GeoPackageIO.write(graft.api.GeoDataFrame(df, "geom"),
      "/tmp/rtree_check.gpkg", "pts")
    spark.stop()
  }
}
