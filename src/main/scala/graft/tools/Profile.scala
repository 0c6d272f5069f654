package graft.tools

import graft.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the slow bench queries. Not part of the
  * driver contract; run with `sbt "runMain graft.tools.Profile"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
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

    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm up
    force(docs.select(gr_tokenCount(col("text"))))

    val sig = docs.select(col("doc_id").as("_id"),
      gr_minhash(col("text"), lit(64), lit(4), lit(42)).as("_sig"))
    time("t05 signature only")(force(sig))
    time("t05 signature only x2")(force(sig))
    val banded = sig.select(col("_id"),
      posexplode(gr_bandKeys(col("_sig"), lit(16))).as(Seq("_band", "_key")))
    val bstats = banded.groupBy(col("_band"), col("_key")).count()
      .agg(max(col("count")).as("maxb"), count(lit(1)).as("nbuckets"),
        sum(col("count") * col("count")).as("sumsq"))
    println(bstats.collect().mkString)
    println("pairs=" + graft.SparkEntry.queries("t05_minhash_pairs")(spark, sfDir).count())
    time("t05 full")(force(graft.SparkEntry.queries("t05_minhash_pairs")(spark, sfDir)))
    time("e01 full")(force(graft.SparkEntry.queries("e01_cosine_topk")(spark, sfDir)))
    time("e02 full")(force(graft.SparkEntry.queries("e02_ann_lsh")(spark, sfDir)))
    time("q02 full")(force(graft.SparkEntry.queries("q02_revenue_by_nation")(spark, sfDir)))
    time("t06 full")(force(graft.SparkEntry.queries("t06_ngram_jaccard")(spark, sfDir)))
    spark.stop()
  }
}
