package graft.tools

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial hot-cell skew soak for the grid sjoin (r12 judge task #1):
  * 40% of the left rows and 40% of the right rows land in ONE grid cell —
  * the urban-cell shape that collapses a flat grid join into quadratic
  * candidate work no AQE skew-split can reduce. Measures wall time and the
  * per-task duration distribution (p50 / p95 / max over the join's tasks)
  * for the flat plan vs the two-level hotCellBudget plan at several
  * scales, printing one JSON line per configuration for SCALE.md.
  *
  * Usage: `sbt "runMain graft.tools.HotCellSoak [nLeft [nRight [split]]]"`
  * (defaults 300000 30000 16; data is generated in-session — skew is the
  * subject here, not parquet IO).
  */
object HotCellSoak {
  def main(args: Array[String]): Unit = {
    val nLeft = args.lift(0).map(_.toInt).getOrElse(300000)
    val nRight = args.lift(1).map(_.toInt).getOrElse(30000)
    val split = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)

    // per-run task-duration capture: reset, run, snapshot
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) durations.add(t.taskInfo.duration)
    })

    // 40% of rows in cell (0,0) at cellSize=1.0, the rest uniform over
    // 100x100 cells. Deterministic hash-derived coordinates.
    def u(idCol: org.apache.spark.sql.Column, salt: Int) =
      (abs(xxhash64(idCol, lit(salt))) % 1000000L).cast("double") / 1e6
    def skewed(n: Int, prefix: String) = {
      val base = spark.range(n.toLong).toDF("id")
      val hot = col("id") % 5 < 2
      base
        .withColumn("x", when(hot, u(col("id"), 1)).otherwise(u(col("id"), 2) * 100.0))
        .withColumn("y", when(hot, u(col("id"), 3)).otherwise(u(col("id"), 4) * 100.0))
        .withColumn("geometry", st_point(col("x"), col("y")))
        .select(col("id").as(prefix + "id"), col("geometry"))
    }
    val left = GeoDataFrame(skewed(nLeft, "l"))
    val right = GeoDataFrame(skewed(nRight, "r"))

    def run(label: String, budget: Long): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      val n = left.sjoin(right, predicate = "dwithin", strategy = "grid",
          cellSize = Some(1.0), distance = 0.01,
          hotCellBudget = budget, hotCellSplit = split)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      val ds = durations.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double) = if (ds.isEmpty) 0L else ds(((ds.length - 1) * p).toInt)
      println(f"""{"soak":"hot_cell","label":"$label","nLeft":$nLeft,"nRight":$nRight,"split":$split,"budget":$budget,"pairs":$n,"wall_s":$wall%.2f,"tasks":${ds.length},"task_p50_ms":${pct(0.5)},"task_p95_ms":${pct(0.95)},"task_max_ms":${if (ds.isEmpty) 0L else ds.last}}""")
    }

    // mitigated first (warms shared machinery so the flat run is not
    // penalized by JIT), then flat; each twice, second reading quoted
    run("mitigated_warmup", 1000000L)
    run("mitigated", 1000000L)
    run("flat_warmup", 0L)
    run("flat", 0L)
    spark.stop()
  }
}
