package graft.api

import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Execution-shape contract for the coverage family (coverageSimplify /
  * coverageUnion / coverageInvalidWitnesses): one Exchange on the `by`
  * columns + a Tungsten sortWithinPartitions + a streaming mapPartitions
  * that buffers ONE window at a time — never an RDD `groupBy` (which
  * shuffles Java-serialized full rows and materializes all groups of a
  * partition at once) — plus the per-window row/byte guard that turns an
  * over-large coverage window into a named error instead of an OOM.
  */
class CoverageWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** `keys` coverage windows: per key, two rectangles [0,w]x[0,h] and
    * [w,2w]x[0,h] sharing the x=w seam — a valid edge-matched coverage.
    */
  private def twoRects(keys: Int): GeoDataFrame = {
    val base = (1 to keys).toDF("k")
      .withColumn("w", (col("k") % 5 + 2).cast("double"))
      .withColumn("h", (col("k") % 7 + 3).cast("double"))
      .withColumn("part", explode(array(lit("A"), lit("B"))))
      .withColumn("geometry", when(col("part") === "A",
          st_makeEnvelope(lit(0.0), lit(0.0), col("w"), col("h")))
        .otherwise(st_makeEnvelope(col("w"), lit(0.0),
          col("w") * 2.0, col("h"))))
    GeoDataFrame(base, "geometry")
  }

  test("plan: Exchange + Sort + streaming mapPartitions, no RDD barrier") {
    val out = twoRects(8).coverageUnion(by = Seq("k")).df
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("Exchange"), physical)
    assert(physical.contains("Sort"), physical)
    assert(physical.contains("MapPartitions"), physical)
    // an RDD groupBy round-trip would surface as a LogicalRDD / ExistingRDD
    // scan severing the lineage from the input plan
    assert(!out.queryExecution.analyzed.toString.contains("LogicalRDD"))
    assert(!physical.contains("Scan ExistingRDD"), physical)
    // same contract for the other two family members
    val simp = twoRects(4).coverageSimplify(0.001, by = Seq("k")).df
    val sp = simp.queryExecution.executedPlan.toString
    assert(sp.contains("Exchange") && sp.contains("Sort") &&
      sp.contains("MapPartitions"), sp)
    val wit = twoRects(4).coverageInvalidWitnesses(by = Seq("k"))
    val wp = wit.queryExecution.executedPlan.toString
    assert(wp.contains("Exchange") && wp.contains("Sort") &&
      wp.contains("MapPartitions"), wp)
  }

  test("many windows per shuffle partition: window boundaries are exact") {
    // 40 keys into 32 shuffle partitions — several partitions hold more
    // than one window, exercising the one-window-buffer boundary logic
    val got = twoRects(40).coverageUnion(by = Seq("k")).df
      .select(col("k"), st_area(col("geometry")).as("area"),
        st_numInteriorRings(col("geometry")).as("holes"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got.size == 40)
    (1 to 40).foreach { k =>
      val w = (k % 5 + 2).toDouble; val h = (k % 7 + 3).toDouble
      val (area, holes) = got(k)
      assert(math.abs(area - 2 * w * h) < 1e-9, s"k=$k area=$area")
      assert(holes == 0)
    }
  }

  test("by = Nil is a single window; null geometry passes through simplify") {
    val one = twoRects(1).coverageUnion().df
      .select(st_area(col("geometry"))).head().getDouble(0)
    assert(math.abs(one - 2 * 3.0 * 4.0) < 1e-9) // k=1: w=3, h=4
    val withNull = GeoDataFrame(
      twoRects(1).df.union(twoRects(1).df.limit(1)
        .withColumn("geometry", lit(null).cast("binary"))), "geometry")
    val rows = withNull.coverageSimplify(0.5).df.collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("geometry"))) == 1)
  }

  test("over-large window throws CoverageWindowExceeded, not OOM") {
    spark.conf.set("spark.graft.coverage.maxWindowRows", "3")
    try {
      val big = GeoDataFrame((1 to 8).toDF("i")
        .withColumn("k", lit(1))
        .withColumn("geometry", st_makeEnvelope(
          col("i").cast("double"), lit(0.0),
          col("i").cast("double") + 1.0, lit(1.0))), "geometry")
      val e = intercept[Exception] {
        big.coverageUnion(by = Seq("k")).df.collect()
      }
      def causes(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: causes(t.getCause)
      val hit = causes(e).find(_.isInstanceOf[CoverageWindowExceeded])
      assert(hit.isDefined, s"expected CoverageWindowExceeded, got $e")
      assert(hit.get.getMessage.contains("k=1"))
      assert(hit.get.getMessage.contains("maxWindowRows"))
    } finally spark.conf.unset("spark.graft.coverage.maxWindowRows")
  }

  test("byte guard: windows above maxWindowBytes throw with the key named") {
    spark.conf.set("spark.graft.coverage.maxWindowBytes", "100")
    try {
      val big = twoRects(2) // each rect WKB ~ 93+ bytes; 2 rows > 200 bytes
      val e = intercept[Exception] {
        big.coverageUnion(by = Seq("k")).df.collect()
      }
      def causes(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[CoverageWindowExceeded]), e.toString)
    } finally spark.conf.unset("spark.graft.coverage.maxWindowBytes")
  }
}
