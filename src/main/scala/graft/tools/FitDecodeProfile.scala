package graft.tools

import graft.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PROFILE probes for two r12 session changes:
  *  1. CoMomentAgg / fitPca throughput — the PCA fit's one-pass cost per
  *     row at d=64 over a generated corpus (no IO), the number that
  *     extrapolates to the 100 TB posture.
  *  2. OSM per-kind decode gating — readWays wall must be ~flat in the
  *     NODE count of the file (nodes are skipped at the wire level),
  *     while readNodes scales with it.
  * `sbt "runMain graft.tools.FitDecodeProfile"`.
  */
object FitDecodeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)

    // ---- 1. fitPca throughput at d=64, generated corpus (no IO)
    for (n <- Seq(200000, 1000000)) {
      val df = spark.range(n.toLong).select(col("id"),
        expr("transform(sequence(0, 63), i -> cast(pmod(id * (i + 7), 1000) as float) / 250.0 - 2.0)")
          .as("vec"))
        .localCheckpoint() // pin so the fit times the AGGREGATE, not the gen
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val m = graft.ops.Embeddings.fitPca(df, "vec", dim = 64)
        require(m.n == n)
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[fit-profile] fitPca n=$n%-8d d=64 min=${walls.min}%.2f s " +
        f"(${n / walls.min / 1e6}%.2f Mrows/s)")
    }

    // ---- 2. OSM decode gating: way reads flat in node count
    val dir = java.nio.file.Files.createTempDirectory("gateprof").toString
    def mkFile(nNodes: Int, nWays: Int, path: String): Unit = {
      val nodes = (0 until nNodes).map(i =>
        (i.toLong, (i % 360).toDouble - 180.0 + 0.0001 * (i % 97),
          (i % 170).toDouble - 85.0, Map("k" -> s"v$i")))
      val ways = (0 until nWays).map(i =>
        (1000000L + i,
          (0 until 6).map(j => ((i * 7 + j) % nNodes).toLong): Seq[Long],
          Map("highway" -> "x")))
      graft.io.OsmPbfIO.write(path, nodes, ways,
        hadoopConf = spark.sessionState.newHadoopConf())
    }
    for ((nn, label) <- Seq((20000, "20k nodes"), (200000, "200k nodes"))) {
      val p = s"$dir/f_$nn.osm.pbf"
      mkFile(nn, 5000, p)
      def time(what: String)(run: => Long): Unit = {
        val walls = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val c = run
          require(c > 0); (System.nanoTime() - t0) / 1e9
        }
        System.err.println(f"[gate-profile] $what ($label, 5k ways) min=${walls.min}%.2f s")
      }
      time("readWays ")(graft.io.OsmPbfIO.readWays(spark, p).count())
      time("readNodes")(graft.io.OsmPbfIO.readNodes(spark, p).count())
    }
    spark.stop()
  }
}
