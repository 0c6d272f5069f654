package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Token-budget shard packing: the distributed prefix sum must agree
  * with the sequential definition exactly, for ANY partition count —
  * a wrong per-partition offset shifts every downstream shard id.
  */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, ((i * 37) % 90 + 10).toLong))
      .toDF("doc_id", "n_tokens")

  private def sequential(n: Int, budget: Long): Map[Long, Long] = {
    var cum = 0L
    (1 to n).map { i =>
      val t = ((i * 37) % 90 + 10).toLong
      val shard = cum / budget
      cum += t
      i.toLong -> shard
    }.toMap
  }

  test("matches the sequential definition; shards fill to the budget") {
    val budget = 500L
    val got = Sharding.packByTokenBudget(docs(2000), "doc_id", "n_tokens", budget)
      .select($"doc_id", $"shard_id").as[(Long, Long)].collect().toMap
    val want = sequential(2000, budget)
    assert(got == want)
    // contract: a shard never exceeds budget + one document (docs never
    // split; the overflowing doc is the one that crossed the boundary)
    val byShard = Sharding.packByTokenBudget(docs(2000), "doc_id", "n_tokens", budget)
      .groupBy($"shard_id").agg(sum($"n_tokens").as("t"))
      .as[(Long, Long)].collect()
    val maxTok = 99L
    byShard.foreach { case (sid, t) =>
      assert(t <= budget + maxTok, s"shard $sid holds $t tokens")
    }
    // shards are dense 0..max
    val ids = byShard.map(_._1).sorted
    assert(ids.toSeq == (0L to ids.max))
  }

  test("deterministic across partition counts (offset correctness)") {
    val a = Sharding.packByTokenBudget(docs(1500), "doc_id", "n_tokens", 700L,
      numPartitions = 3).select($"doc_id", $"shard_id")
      .as[(Long, Long)].collect().toMap
    val b = Sharding.packByTokenBudget(docs(1500), "doc_id", "n_tokens", 700L,
      numPartitions = 13).select($"doc_id", $"shard_id")
      .as[(Long, Long)].collect().toMap
    val c = Sharding.packByTokenBudget(docs(1500), "doc_id", "n_tokens", 700L,
      numPartitions = 1).select($"doc_id", $"shard_id")
      .as[(Long, Long)].collect().toMap
    assert(a == b && b == c)
  }

  test("extra columns survive; null/invalid tokens handled") {
    val df = Seq((1L, Some(10L), "a"), (2L, None: Option[Long], "b"),
      (3L, Some(20L), "c")).toDF("doc_id", "n_tokens", "tag")
    val out = Sharding.packByTokenBudget(df, "doc_id", "n_tokens", 15L)
      .select($"doc_id", $"tag", $"shard_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    // cum: doc1 starts at 0 (shard 0), doc2 at 10 (shard 0, null = 0
    // tokens), doc3 at 10 (shard 0)... then 30 after
    assert(out.toSeq == Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)))
    val e = intercept[IllegalArgumentException](
      Sharding.packByTokenBudget(df, "doc_id", "n_tokens", 0L))
    assert(e.getMessage.contains("budget"))
  }
}
