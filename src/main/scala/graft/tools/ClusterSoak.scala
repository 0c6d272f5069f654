package graft.tools

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the spatial-clustering family (SCALE.md): runs
  * clusterDBSCAN / clusterWithin over the customer-point synthesis at a
  * given sf dir with a given eps, printing wall seconds and the verified
  * ε-pair count. Lets the soak separate DATA-DRIVEN edge growth (10×
  * density in a fixed domain ⇒ ~100× ε-graph edges) from implementation
  * scaling (constant-density run: eps scaled by 1/sqrt(10) holds mean
  * degree ~constant, the physically meaningful 100 TB shape — more area,
  * same density). Usage:
  * `runMain graft.tools.ClusterSoak <sfDir> <dbscanEps> <withinDist> [iters]`
  */
object ClusterSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val eps = args(1).toDouble
    val dist = args(2).toDouble
    val iters = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumn("geometry", st_point(col("c_acctbal"),
        (col("c_custkey") % 1000).cast("double")))
    val n = pts.count()

    def time(name: String, r: Double)(run: => Long): Unit = {
      val walls = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val rows = run
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[cluster-soak] $name%-16s n=$n%-8d r=$r%-8.2f rows=$rows%-9d $w%.2f s")
        w
      }
      println(f"""{"op":"$name","n":$n,"r":$r,"minWall":${walls.min}%.3f}""")
    }

    // ground-truth ε-pair count at each radius (the data-driven cost term)
    for (r <- Seq(eps, dist)) {
      val p = pts.select(col("c_custkey").cast("long").as("id"),
        col("c_acctbal").cast("double").as("x"),
        (col("c_custkey") % 1000).cast("double").as("y"))
      val c = p.withColumn("cx", floor(col("x") / r)).withColumn("cy", floor(col("y") / r))
      val l = c.select(col("id").as("ia"), col("x").as("xa"), col("y").as("ya"),
          explode(array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
            struct((col("cx") + dx).as("jx"), (col("cy") + dy).as("jy"))): _*)).as("j"))
        .select(col("ia"), col("xa"), col("ya"), col("j.jx"), col("j.jy"))
      val rr = c.select(col("id").as("ib"), col("x").as("xb"), col("y").as("yb"),
        col("cx").as("jx"), col("cy").as("jy"))
      val nPairs = l.join(rr, Seq("jx", "jy"))
        .filter(col("ia") < col("ib") &&
          (col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")) <= r * r)
        .select(col("ia"), col("ib")).distinct().count()
      System.err.println(f"[cluster-soak] eps-pairs at r=$r%.2f: $nPairs")
    }

    time("dbscan", eps) {
      GeoDataFrame(pts).clusterDBSCAN("c_custkey", eps = eps, minPoints = 3).count()
    }
    time("clusterWithin", dist) {
      GeoDataFrame(pts).clusterWithin("c_custkey", distance = dist,
        cellSize = dist).count()
    }
    spark.stop()
  }
}
