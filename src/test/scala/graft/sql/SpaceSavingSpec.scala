package graft.sql

import graft.sql.functions.gr_heavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact when capacity >= distinct items (err = 0, counts exact)") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    val got = items.toDF("x").repartition(8)
      .agg(gr_heavyHitters($"x", 16).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.est", $"h.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 7L, 0L)), got.toString)
  }

  test("eviction keeps the SpaceSaving guarantees on a skewed stream") {
    // 1000 'hot' + 200 'warm' + 300 distinct one-off items through cap 8:
    // f > N/cap = 1500/8 = 187.5 guarantees hot and warm survive, every
    // estimate is an upper bound, and est - err never exceeds truth.
    val items = Seq.fill(1000)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 300).map(i => s"rare$i")
    val truth = Map("hot" -> 1000L, "warm" -> 200L).withDefaultValue(1L)
    val got = items.toDF("x").repartition(4)
      .agg(gr_heavyHitters($"x", 8).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.est", $"h.err")
      .as[(String, Long, Long)].collect()
    assert(got.length <= 8)
    val m = got.map(r => r._1 -> r).toMap
    assert(m.contains("hot") && m.contains("warm"), m.keys.toString)
    got.foreach { case (item, est, err) =>
      assert(est >= truth(item), s"$item est=$est below truth")
      assert(est - err <= truth(item), s"$item lower bound est-err=${est - err} above truth")
    }
    // eviction transfers the victim's count to the newcomer and merges add
    // each side's mass once, so total estimated mass equals stream length
    assert(got.map(_._2).sum == items.length.toLong)
  }

  test("streaming heavy hitters accumulate across batches (update mode)") {
    // the O(capacity) buffer is exactly what makes this viable as a
    // streaming aggregate: per-key state is one bounded summary, not the
    // token history
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = mem.toDF().toDF("g", "x")
      .groupBy($"g").agg(gr_heavyHitters($"x", 8).as("hh"))
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("ss_stream").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(("en", "a"), ("en", "a"), ("en", "b"), ("de", "z"))
    q.processAllAvailable()
    mem.addData(("en", "a"), ("en", "c"), ("de", "z"))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each batch's updated rows; the
    // LAST row per group carries the cumulative summary
    val last = spark.sql("SELECT g, hh FROM ss_stream")
      .collect().zipWithIndex.groupBy(_._1.getString(0))
      .map { case (g, rows) => g -> rows.maxBy(_._2)._1 }
    val en = last("en").getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(en == Set(("a", 3L), ("b", 1L), ("c", 1L)), en.toString)
    val de = last("de").getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(de == Set(("z", 2L)), de.toString)
  }

  test("grouped heavy hitters match exact counts inside the capacity window") {
    val df = Seq(("en", "x"), ("en", "x"), ("en", "y"), ("de", "z"), ("de", "z"),
      ("de", "w"), ("de", "z")).toDF("g", "x")
    val got = df.groupBy($"g").agg(gr_heavyHitters($"x", 4).as("hh"))
      .select($"g", explode($"hh").as("h"))
      .select($"g", $"h.item", $"h.est")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("en", "x", 2L), ("en", "y", 1L),
      ("de", "z", 3L), ("de", "w", 1L)), got.toString)
  }
}
