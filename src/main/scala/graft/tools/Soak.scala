package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale soak: run a list of declared queries against one SF dir in a
  * single session, print median-of-N seconds per query as one JSON line.
  * Used for the sf0.1 -> sf1 scaling-ratio table in SCALE.md. Not part of
  * the driver contract. Usage:
  * `sbt "runMain graft.tools.Soak <sfDir> <q1,q2,...> [iters]"`.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
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
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[soak] $name failed: ${e.getMessage}"); None
        }
      }.sorted
      val t = if (times.isEmpty) -1.0 else times((times.size - 1) / 2)
      System.err.println(f"[soak] $name%-24s $t%.2f s")
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    println(s"""{"sf":"${jesc(sfDir)}","iters":$iters,"queries":$qs}""")
    spark.stop()
  }
}
