package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted draw is deterministic and partitioning-invariant") {
    val df = (0 until 500).map(i => (i.toLong, s"g${i % 3}", 1.0 + i % 7)).toDF("id", "g", "w")
    def draw(parts: Int) = Sampling
      .weightedPrioritySample(df.repartition(parts), "g", "id", col("w"), k = 10)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(draw(1) == draw(7))
    assert(draw(1).size == 30) // 3 groups x 10
  }

  test("small groups return every row; k caps the rest") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0),
      (4L, "b", 1.0), (5L, "b", 1.0), (6L, "b", 1.0), (7L, "b", 1.0),
      (8L, "b", 1.0), (9L, "b", 1.0), (10L, "b", 1.0)).toDF("id", "g", "w")
    val got = Sampling.weightedPrioritySample(df, "g", "id", col("w"), k = 5)
      .groupBy("g").count().orderBy("g").collect()
    assert(got(0).getLong(1) == 3) // a has only 3 rows
    assert(got(1).getLong(1) == 5) // b capped at k
  }

  test("inclusion probability follows the weights (A-ES property)") {
    // one group, 1000 rows: 100 heavy (w=50) vs 900 light (w=1).
    // Proportional-to-weight without replacement -> the heavy decile should
    // dominate a k=100 draw; with these odds (5000 vs 900 total weight) the
    // expected heavy count is >90, so >=75 is a loose deterministic bound
    // for this fixed hash draw.
    val df = (0 until 1000)
      .map(i => (i.toLong, "g", if (i % 10 == 0) 50.0 else 1.0)).toDF("id", "g", "w")
    val picked = Sampling.weightedPrioritySample(df, "g", "id", col("w"), k = 100)
      .collect().map(_.getLong(1)).toSet
    val heavy = picked.count(_ % 10 == 0)
    assert(heavy >= 75, s"heavy rows drawn: $heavy of 100")
    assert(picked.size == 100)
  }
}
