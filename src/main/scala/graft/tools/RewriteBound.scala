package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundedness probe for blockDedupRewrite's mass-duplication claim: the
  * keep/drop decision runs as a hash-only MIN aggregation with map-side
  * partial combine, so a boilerplate banner repeated in EVERY document
  * must cost a narrow per-occurrence row into a partial min — never a
  * per-hash sorted window over the occurrence list. Build corpora where
  * every doc opens with the SAME banner block (the hot hash carries n
  * occurrences) at two scales and measure wall growth; a window-sort
  * formulation would concentrate the hot hash into one task and grow
  * superlinearly. Not part of the driver contract. Usage:
  * `sbt "runMain graft.tools.RewriteBound <n> [mult]"`.
  */
object RewriteBound {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val mult = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    import spark.implicits._

    // every doc = the identical 20-token banner + 20 unique tokens
    val banner = (1 to 20).map(i => s"banner$i").mkString(" ")
    def corpus(rows: Int) = spark.range(rows).select(col("id").as("doc_id"),
      concat(lit(banner + " "), concat_ws(" ",
        (0 until 20).map(j => concat(lit(s"u${j}_"), col("id"))): _*)).as("text"))

    // phase timing: where does the wall go as the hot hash grows?
    def phase(rows: Int): Unit = {
      val df = corpus(rows)
      val b = 20
      def tm(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[rewritebound]   $label%-12s rows=$r%d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      tm("synth") { df.agg(sum(length(col("text")))).head(); rows.toLong }
      val blocks = df
        .select(col("doc_id").cast("long").as("_id"),
          expr(s"filter(split(text, ' '), x -> length(x) > 0)").as("_toks"))
        .filter(size(col("_toks")) >= 1)
        .select(col("_id"), posexplode(expr(
          s"transform(sequence(0, (size(_toks) - 1) div $b), " +
            s"j -> concat_ws(' ', slice(_toks, j * $b + 1, $b)))"))
          .as(Seq("_idx", "_blk")))
        .withColumn("_h", md5(col("_blk")))
      tm("blocks") { blocks.count() }
      val first = blocks.groupBy(col("_h"))
        .agg(min(struct(col("_id"), col("_idx"))).as("_first"))
      tm("first") { first.count() }
      tm("join") { blocks.join(first, "_h").count() }
      tm("full") {
        graft.ops.Dedup.blockDedupRewrite(df, "doc_id", "text", 20).count()
      }
    }
    if (args.lift(2).contains("phase")) {
      phase(n); phase(n * mult); spark.stop(); return
    }

    def run(rows: Int): (Double, Long, Long) = {
      val df = corpus(rows)
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.blockDedupRewrite(df, "doc_id", "text",
        blockTokens = 20)
      val agg = out.agg(sum(col("n_kept")), count(lit(1))).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
    }
    run(2000) // warmup
    // min of 2: the first heavy action in a cold session pays JIT +
    // codegen compilation that read as fake superlinearity
    val (t1a, kept1, d1) = run(n)
    val (t1b, _, _) = run(n)
    val t1 = math.min(t1a, t1b)
    val (t2a, kept2, d2) = run(n * mult)
    val (t2b, _, _) = run(n * mult)
    val t2 = math.min(t2a, t2b)
    // correctness of the hot path: banner survives exactly once globally,
    // every unique block survives -> kept = rows + 1
    require(kept1 == n + 1 && d1 == n, s"kept1=$kept1 d1=$d1")
    require(kept2 == n.toLong * mult + 1 && d2 == n.toLong * mult)
    println(f"[rewritebound] n=$n%d wall=$t1%.2f s; n=${n * mult}%d " +
      f"wall=$t2%.2f s; ratio=${t2 / t1}%.2f (data x$mult%d)")
    spark.stop()
  }
}
