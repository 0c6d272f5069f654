package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sql.functions._

/** A/B: per-language top-10 tokens via the SpaceSaving sketch (t37 shape —
  * O(cap) summaries cross the shuffle) vs the exact formulation (groupBy
  * (lang, token) count + window rank — the full token universe crosses the
  * shuffle twice). Run: `sbt "runMain graft.tools.HhProfile /root/sf1_local 3"`.
  */
object HhProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/sf1_local")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("hh-profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sql.functions.install(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def toks = docs.select(col("lang"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")

    def sketch() = toks.groupBy(col("lang"))
      .agg(gr_heavyHitters(col("token"), 64).as("hh"))
      .select(col("lang"), explode(slice(col("hh"), 1, 10)).as("h"))
      .select(col("lang"), col("h.item"), col("h.est"))

    def exact() = {
      val c = toks.groupBy(col("lang"), col("token")).count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("count").desc, col("token"))
      c.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("lang"), col("token"), col("count"))
    }

    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      f().count() // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      ts((ts.size - 1) / 2)
    }

    val s = time(() => sketch())
    val e = time(() => exact())
    // cross-check: identical top-10 sets (cap 64 > vocab -> sketch exact)
    val sv = sketch().collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val ev = exact().collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    println(f"low-cardinality (vocab ~31): sketch=$s%.2fs exact=$e%.2fs agree=${sv == ev}")

    // high-cardinality regime: salt the tail tokens so the universe is
    // ~500k distinct while a few unsalted heads stay heavy — the shape of
    // a real corpus vocabulary, where the exact path must shuffle and
    // window-sort the full universe
    def toksHi = docs.select(col("lang"), col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z0-9]+")).as(Seq("p", "t")))
      .filter(col("t") =!= "")
      .select(col("lang"),
        when((col("doc_id") + col("p")) % 10 < 2, col("t"))  // 20% heavy heads
          .otherwise(concat(col("t"), lit("_"),
            ((col("doc_id") * 131 + col("p") * 7919) % 500000).cast("string")))
          .as("token"))
    def sketchHi() = toksHi.groupBy(col("lang"))
      .agg(gr_heavyHitters(col("token"), 256).as("hh"))
      .select(col("lang"), explode(slice(col("hh"), 1, 10)).as("h"))
    def exactHi() = {
      val c = toksHi.groupBy(col("lang"), col("token")).count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("count").desc, col("token"))
      c.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    }
    val sh = time(() => sketchHi())
    val eh = time(() => exactHi())
    println(f"high-cardinality (~500k distinct): sketch=$sh%.2fs exact=$eh%.2fs")
    spark.stop()
  }
}
