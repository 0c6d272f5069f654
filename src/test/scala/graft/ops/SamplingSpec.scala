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

  test("temperature resampling flattens the head and caps at group size") {
    // 800 "en", 80 "de", 8 "sw"
    val df = ((0 until 800).map(i => (i.toLong, "en")) ++
      (800 until 880).map(i => (i.toLong, "de")) ++
      (880 until 888).map(i => (i.toLong, "sw"))).toDF("id", "g")
    def shares(alpha: Double) = Sampling
      .temperatureResample(df, "g", "id", alpha, targetTotal = 100)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a1 = shares(1.0)
    // alpha=1 is proportional: floor(100 * n/888 + .5)
    assert(a1("en") == 90 && a1("de") == 9 && a1("sw") == 1)
    val a3 = shares(0.3)
    // alpha=0.3 flattens: tail share grows, head share shrinks
    assert(a3("en") < a1("en") && a3("sw") > a1("sw"))
    // the sw group can never exceed its 8 rows even at extreme flattening
    val flat = Sampling.temperatureResample(df, "g", "id", 0.01, targetTotal = 600)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flat("sw") == 8)
  }

  test("temperature resampling is partitioning-invariant") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    def draw(parts: Int) = Sampling
      .temperatureResample(df.repartition(parts), "g", "id", 0.5, targetTotal = 40)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(draw(1) == draw(6))
  }

  test("weighted draw is a valid streaming aggregate (update mode, O(k) state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0 until 200).map(i => (i.toLong, s"g${i % 2}", 1.0 + i % 5))
    val mem = MemoryStream[(Long, String, Double)]
    val out = Sampling.weightedPrioritySample(
      mem.toDF().toDF("id", "g", "w"), "g", "id", col("w"), k = 8)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("wps_stream").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows.take(100): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(100): _*) // the draw must revise as data arrives
    q.processAllAvailable()
    q.stop()
    // last update per group equals the batch draw over ALL rows
    val batch = Sampling.weightedPrioritySample(
        rows.toDF("id", "g", "w"), "g", "id", col("w"), k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val streamed = spark.sql(
        "SELECT g, id FROM wps_stream") // memory sink keeps latest update rows
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batch.subsetOf(streamed)) // earlier-batch rows may also linger
    assert(batch.size == 16)
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
