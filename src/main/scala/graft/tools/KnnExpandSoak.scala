package graft.tools

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Expanding-ring kNN soak (r12 judge task #8, the g70/g77 family): at sf1
  * scale, verify that (a) the doubling loop's remainder is
  * localCheckpoint-PINNED each round (the anti-join lineage must not stack
  * — a stacked plan re-runs every prior round's join on each emptiness
  * probe), (b) the per-round input SHRINKS geometrically, and (c) at least
  * 4 doubling rounds are actually exercised. The right side's density
  * decays exponentially in x, so left rows in the sparse half need several
  * radius doublings — the adversarial shape for remainder lineage.
  *
  * Usage: `sbt "runMain graft.tools.KnnExpandSoak [nLeft [nRight [k]]]"`
  * (defaults 600000 600000 3). Prints one JSON line per round plus a
  * summary line for SCALE.md.
  */
object KnnExpandSoak {
  def main(args: Array[String]): Unit = {
    val nLeft = args.lift(0).map(_.toInt).getOrElse(600000)
    val nRight = args.lift(1).map(_.toInt).getOrElse(600000)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)

    def u(idCol: org.apache.spark.sql.Column, salt: Int) =
      (abs(xxhash64(idCol, lit(salt))) % 1000000L).cast("double") / 1e6
    // left: uniform over [0,100]^2
    val left = GeoDataFrame(spark.range(nLeft.toLong).toDF("lid")
      .withColumn("geometry", st_point(u(col("lid"), 1) * 100.0, u(col("lid"), 2) * 100.0))
      .select(col("lid"), col("geometry")))
    // right: x drawn with density ~ exp decay (x = -ln(u)*12 capped at 100)
    // -> the x>40 half holds only a few percent of the right rows, so left
    // rows there need several radius doublings to complete their top-k
    val right = GeoDataFrame(spark.range(nRight.toLong).toDF("rid")
      .withColumn("x", least(lit(100.0),
        -log(u(col("rid"), 3) + lit(1e-9)) * lit(12.0)))
      .withColumn("geometry", st_point(col("x"), u(col("rid"), 4) * 100.0))
      .select(col("rid"), col("geometry")))

    val rounds = scala.collection.mutable.ArrayBuffer[(Int, Long, Boolean, Double)]()
    var lastT = System.nanoTime()
    val t0 = System.nanoTime()
    val out = left.sjoinNearestExpanding(right, leftKey = "lid",
      seedDistance = 0.1, cellSize = 0.1, k = k, maxRounds = 20,
      roundProbe = (round, rest) => {
        val wall = (System.nanoTime() - lastT) / 1e9
        val remaining = rest.count()
        // the pin contract: the remainder's analyzed plan must be a
        // checkpoint scan (LogicalRDD), not the stacked anti-join lineage
        val pinned = rest.queryExecution.analyzed.toString.contains("LogicalRDD")
        rounds += ((round, remaining, pinned, wall))
        lastT = System.nanoTime()
      })
    val total = out.count()
    val wallAll = (System.nanoTime() - t0) / 1e9
    rounds.foreach { case (r, rem, pinned, w) =>
      println(f"""{"soak":"knn_expand","round":$r,"remaining":$rem,"pinned":$pinned,"round_wall_s":$w%.2f}""")
    }
    val shrink = rounds.map(_._2)
    val geometric = shrink.sliding(2).forall {
      case scala.collection.mutable.ArrayBuffer(a, b) => b <= a
      case _ => true
    }
    println(f"""{"soak":"knn_expand_summary","nLeft":$nLeft,"nRight":$nRight,"k":$k,"rounds":${rounds.size},"pairs":$total,"wall_s":$wallAll%.2f,"all_pinned":${rounds.forall(_._3)},"monotone_shrink":$geometric}""")
    spark.stop()
  }
}
