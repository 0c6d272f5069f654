package graft.plans

import graft.sql.TestSpark
import graft.sql.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialFilterPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customerScanFilters(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private lazy val pts = {
    graft.sql.functions.install(spark)
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("geometry", st_point(col("c_acctbal"),
        (col("c_custkey") % 1000).cast("double")))
  }

  test("st_intersectsbox over st_point derives pushed range predicates") {
    val q = pts.filter(st_intersectsBox(col("geometry"),
      lit(1000.0), lit(200.0), lit(5000.0), lit(800.0)))
    val plan = customerScanFilters(q)
    // FileScan metadata truncates; assert on the Filter condition form
    assert(plan.contains(">= 1000.0"), plan)
    assert(plan.contains("<= 5000.0"), plan)
    assert(plan.contains("GreaterThanOrEqual(c_acctbal,1000.0)"), plan)
    // results identical to the residual-only filter (rule is redundant-safe)
    val expected = pts.filter(col("c_acctbal").between(1000, 5000) &&
      (col("c_custkey") % 1000).cast("double").between(200, 800)).count()
    assert(q.count() == expected)
  }

  test("st_distance < d against a literal point derives expanded ranges") {
    val q = pts.filter(st_distance(col("geometry"),
      st_point(lit(5000.0), lit(500.0))) < 1500.0)
    val plan = customerScanFilters(q)
    assert(plan.contains(">= 3500.0"), plan)
    assert(plan.contains("<= 6500.0"), plan)
    assert(plan.contains("GreaterThanOrEqual(c_acctbal,3500.0)"), plan)
  }

  test("st_dwithin derives expanded ranges") {
    val q = pts.filter(st_dwithin(col("geometry"),
      st_point(lit(0.0), lit(0.0)), lit(100.0)))
    val plan = customerScanFilters(q)
    assert(plan.contains("GreaterThanOrEqual(c_acctbal,-100.0)"), plan)
  }

  test("rule does not fire under OR and does not change results") {
    val q = pts.filter(st_intersectsBox(col("geometry"),
      lit(0.0), lit(0.0), lit(10.0), lit(10.0)) || col("c_custkey") === 1)
    val plan = customerScanFilters(q)
    assert(!plan.contains("GreaterThanOrEqual(c_acctbal,0.0)"), plan)
    assert(q.count() >= 1)
  }

  test("literal geometry expressions constant-fold") {
    val q = pts.select(st_area(st_makeEnvelope(lit(0.0), lit(0.0), lit(2.0), lit(3.0))).as("a"))
    // after constant folding the plan should carry a literal 6.0, not the call
    val optimized = q.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("6.0"), optimized)
    assert(!optimized.contains("st_makeenvelope"), optimized)
  }

  test("covering metadata: PLAIN st_* filter over covering GeoParquet pushes bbox ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("covpush").toString + "/gp"
    val rows = (0 until 2000).map(i => (i.toLong, (i % 50) * 2.0, (i / 50) * 2.0))
    val g = graft.api.GeoDataFrame.pointsFromXY(
        rows.toDF("id", "x", "y"), "x", "y")
      .spatialShuffle(by = "hilbert", level = 12, numPartitions = Some(4),
        calculatePartitions = false)
    graft.io.GeoParquetIO.write(g, dir, covering = true)
    val back = graft.io.GeoParquetIO.read(spark, dir)
    // a PLAIN .filter — no .cx, no bbox option — over the read-back frame
    val q = back.df.filter(st_intersectsBox(col("geometry"),
      lit(0.0), lit(0.0), lit(15.0), lit(15.0)))
    val plan = q.queryExecution.executedPlan.toString()
    // the bbox range predicates reach the parquet scan as pushed filters
    // on the nested fields (null-tolerant Or(IsNull, And(...)) form) —
    // assert INSIDE the PushedFilters list (geometry_bbox also shows up
    // in ReadSchema, which is not evidence of pushdown)
    val pf = plan.indexOf("PushedFilters")
    assert(pf >= 0, plan.take(2500))
    // the display truncates the filter list at ~100 chars, so bound the
    // region by the following ReadSchema label instead of the ']'
    val end = plan.indexOf("ReadSchema", pf) match {
      case -1 => math.min(plan.length, pf + 400)
      case i  => i
    }
    assert(plan.substring(pf, end).contains("geometry_bbox.xmin"),
      plan.substring(pf, end))
    // results identical to the coordinate ground truth
    val got = q.select($"id").as[Long].collect().sorted.toSeq
    val want = rows.filter(r => r._2 <= 15 && r._3 <= 15).map(_._1).sorted
    assert(got == want)
    // dwithin / distance forms derive too
    val dw = back.df.filter(st_dwithin(col("geometry"),
      st_makeEnvelope(lit(0.0), lit(0.0), lit(4.0), lit(4.0)), lit(2.0)))
    assert(dw.queryExecution.executedPlan.toString().contains("geometry_bbox"))
    // exact euclidean distance to the [0,4]x[0,4] envelope (corner points
    // like (6,6) sit at sqrt(8) > 2 and must NOT count)
    def envDist(x: Double, y: Double): Double = math.hypot(
      math.max(0.0, math.max(0.0 - x, x - 4.0)),
      math.max(0.0, math.max(0.0 - y, y - 4.0)))
    assert(dw.count() == rows.count(r => envDist(r._2, r._3) <= 2.0))
    // no metadata (plain parquet read) -> rule silent, results unchanged
    val raw = spark.read.parquet(dir).filter(st_intersectsBox(col("geometry"),
      lit(0.0), lit(0.0), lit(15.0), lit(15.0)))
    assert(!raw.queryExecution.optimizedPlan.toString().contains("geometry_bbox.xmin"))
    assert(raw.count() == want.size)
  }
}
