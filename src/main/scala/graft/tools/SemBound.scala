package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundedness probe for the r11 semanticDedup representative cap: build
  * an adversarial corpus whose embedding mass collapses into a handful of
  * semantic clusters (the mass-duplicate regime SemDeDup exists for) and
  * measure wall + emitted pairs for the unbounded all-pairs mode vs the
  * capped default. Not part of the driver contract. Usage:
  * `sbt "runMain graft.tools.SemBound <n> [dim]"`.
  */
object SemBound {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(20000)
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    import spark.implicits._
    // 4 dominant semantic modes + per-vector noise: every mode is one
    // mass-duplicate cluster at threshold 0.9
    val base = Array.tabulate(4, dim)((m, j) =>
      math.sin(m * 2.1 + j * 0.37).toFloat)
    val emb = spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val m = (i % 4).toInt
      (i, base(m).map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    def run(cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = graft.ops.Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nlist = 8, nprobe = 2, maxCluster = cap).count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    val withExact = !args.lift(2).contains("capped")
    run(1024) // warmup
    val (tCap, nCap) = run(1024)
    val (tExact, nExact) = if (withExact) run(0) else (-1.0, -1L)
    // connected-components over the capped pair set must still recover
    // the 4 ground-truth mass clusters
    val comp = graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, nlist = 8, nprobe = 2, maxCluster = 1024)
        .select(col("id_a"), col("id_b")))
      .select(countDistinct(col("cluster_id"))).head.getLong(0)
    println(s"""{"n":$n,"dim":$dim,"capped_s":$tCap,"capped_pairs":$nCap,""" +
      s""""exact_s":$tExact,"exact_pairs":$nExact,"capped_components":$comp}""")
    spark.stop()
  }
}
