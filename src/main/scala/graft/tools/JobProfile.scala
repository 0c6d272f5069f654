package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job wall breakdown of one declared query (optimization triage for
  * multi-job queries: trainers, streaming gates, IO roundtrips). Prints
  * every Spark job the query submits with its wall seconds, task count and
  * the gap since the previous job ended (driver-side time). Not part of
  * the driver contract. Usage:
  * `sbt "runMain graft.tools.JobProfile e14_ann_incremental [iters]"`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    final case class J(id: Int, start: Long, var end: Long = -1L,
      var tasks: Int = 0, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, e.time, desc = d))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        jobs.forEach((_, j) => ())
        val _ = sid
      }
    })

    val fn = graft.SparkEntry.queries(name)
    // warmup (codegen/JIT) — not profiled
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warmup failed: $e") }

    for (i <- 1 to iters) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
      var prevEnd = -1L
      var sumJobs = 0.0
      println(f"== $name iter $i wall $wall%.2f s, ${js.size} jobs ==")
      js.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        if (dur > 0) sumJobs += dur
        prevEnd = math.max(prevEnd, j.end)
        val d = if (j.desc.length > 90) j.desc.substring(0, 90) else j.desc
        println(f"  job ${j.id}%4d ${dur}%7.3f s  gap ${gap}%7.3f s  $d")
      }
      println(f"  sum(jobs) $sumJobs%.2f s, driver/gaps ${wall - sumJobs}%.2f s")
    }
    spark.stop()
  }
}
