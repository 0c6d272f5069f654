package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-timing of one declared query (variance triage — the bench's
  * median-of-N is robust within a run, not across machines). Not part of
  * the driver contract. Usage:
  * `sbt "runMain graft.tools.QueryTime g27_relate [iters]"`.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B knobs without a rebuild: SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(',').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    val fn = graft.SparkEntry.queries(name)
    // iters=0: dump the formatted plan instead of timing (shuffle audits)
    if (iters == 0) {
      fn(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
