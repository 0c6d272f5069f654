package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the dedup clustering path (not part of the
  * driver contract).
  */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t0 = System.nanoTime
    val pairs = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text", 64, 16, 4, 0.35)
      .localCheckpoint()
    val np = pairs.count()
    val t1 = System.nanoTime
    println(s"pairs=$np in ${(t1 - t0) / 1e9}s")
    val cc = graft.ops.Dedup.connectedComponents(pairs)
    val n = cc.count()
    val t2 = System.nanoTime
    println(s"cc rows=$n in ${(t2 - t1) / 1e9}s clusters=" +
      cc.select("cluster_id").distinct().count())
    spark.stop()
  }
}
