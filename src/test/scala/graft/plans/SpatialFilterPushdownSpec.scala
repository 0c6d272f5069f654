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
}
