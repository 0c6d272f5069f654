package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-diameter soak for `connectedComponents` (not part of the driver
  * contract): path graphs — the worst-case structure a dedup pair graph
  * can degenerate to — at diameters 10^4..10^6 with permuted node ids,
  * printing rounds and wall time per diameter. The contract under test:
  * rounds grow ~log2(diameter) (pointer doubling), never linearly, and
  * wall time stays join-bound, not lineage-bound (localCheckpoint per
  * round).
  *
  *   sbt -batch "runMain graft.tools.CcDeep"            # 1e4 1e5 1e6
  *   sbt -batch "runMain graft.tools.CcDeep 10000 100000"
  */
object CcDeep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // this soak measures the DISTRIBUTED pointer-doubling contract — the
    // small-graph driver union-find must not short-circuit it
    spark.conf.set("spark.graft.cc.localMaxEdges", "0")
    import spark.implicits._
    val diameters =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10000, 100000, 1000000)
    for (d <- diameters) {
      val n = d + 1
      // multiplicative permutation of 0..n-1 (gcd(a, n) = 1 via odd a and
      // rejection of shared factors) so the min id sits far from the ends
      val a = Iterator.from(48271, 2).find(x => BigInt(x).gcd(BigInt(n)) == 1).get
      val edges = spark.range(0, n - 1)
        .select((col("id") * a % n).as("id_a"), ((col("id") + 1) * a % n).as("id_b"))
        .repartition(32)
      val t0 = System.nanoTime()
      val (cc, rounds) = graft.ops.Dedup.connectedComponentsWithRounds(edges)
      val nLabels = cc.select("cluster_id").distinct().count()
      val rows = cc.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"diameter=$d%8d rounds=$rounds%2d wall=$secs%7.2fs " +
        f"components=$nLabels rows=$rows log2(d)=${math.log(d) / math.log(2)}%.1f")
      require(nLabels == 1, s"path graph must resolve to one component, got $nLabels")
    }
    spark.stop()
  }
}
