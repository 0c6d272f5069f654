package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One-call corpus dedup (r18): the minhashLsh -> connectedComponents ->
  * canonical-pick composition, with survivors byte-exact and the t23
  * keep-contract (longest text, ties to smallest id) enforced per
  * cluster.
  */
class DedupCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three near-duplicate families with family-DISTINCT bodies (so
  // families never cross-match) plus a per-member length tail, and
  // fully distinct singleton docs built from disjoint word sets
  private val famBase = Array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet ",
    "kilo lima mike november oscar papa quebec romeo sierra tango ",
    "uniform victor whiskey xray yankee zulu one two three four ")
  private val singleWords = Array(
    "apple banana cherry date elderberry fig grape honeydew",
    "iron copper nickel cobalt zinc silver golden platinum",
    "monday tuesday wednesday thursday friday saturday sunday weekly",
    "red orange yellow green blue indigo violet rainbow",
    "north south east west upward downward inward outward",
    "piano violin cello flute oboe clarinet trumpet drums")
  private def corpus() = {
    val fam = (0 until 3).flatMap { f =>
      (0 until 4).map { i =>
        val id = f * 10 + i
        (id.toLong, famBase(f) * 8 + ("x" * (i + 1)))
      }
    }
    val singles = (0 until 6).map(i =>
      ((100 + i).toLong, (singleWords(i) + " ") * 6))
    (fam ++ singles).toDF("doc_id", "text")
  }

  test("survivors = one per cluster (longest text, ties to smallest id) " +
      "plus every singleton, byte-exact") {
    val df = corpus()
    val out = Dedup.dedupCorpus(df, "doc_id", "text", threshold = 0.5)
      .select(col("doc_id"), col("cluster_id"), col("n_cluster_docs"),
        col("text"))
      .collect()
    val src = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // byte-exact survivors
    out.foreach(r => assert(r.getString(3) == src(r.getLong(0))))
    // singleton docs all survive as their own cluster
    (100L until 106L).foreach { id =>
      val row = out.find(_.getLong(0) == id)
      assert(row.isDefined, s"singleton $id must survive")
      assert(row.get.getLong(1) == id && row.get.getLong(2) == 1L)
    }
    // each duplicate family keeps exactly its longest member (the family
    // tail "x"*((id%7)+f) is longest at the largest id in 0..3 per family)
    Seq(0, 1, 2).foreach { f =>
      val ids = (0 until 4).map(i => (f * 10 + i).toLong)
      val kept = out.filter(r => ids.contains(r.getLong(0)))
      assert(kept.length == 1, s"family $f must keep exactly one doc")
      val lens = ids.map(id => id -> src(id).length).toMap
      val want = ids.maxBy(id => (lens(id), -id))
      assert(kept.head.getLong(0) == want,
        s"family $f kept ${kept.head.getLong(0)}, contract wants $want")
      assert(kept.head.getLong(2) == 4L)
      assert(kept.head.getLong(1) == ids.min, "cluster id is the minimum")
    }
  }

  test("blockRewrite branch: survivors additionally lose repeated blocks " +
      "and carry the t40 schema + cluster columns") {
    val df = corpus()
    val out = Dedup.dedupCorpus(df, "doc_id", "text", threshold = 0.5,
      blockRewrite = true, blockTokens = 5)
    val cols = out.columns.toSet
    assert(Set("doc_id", "cluster_id", "n_cluster_docs", "n_blocks",
      "n_kept", "removed_ratio", "new_text", "new_hash").subsetOf(cols))
    val rows = out.collect()
    // the repeated base sentence means later survivors lose blocks
    assert(rows.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_blocks")),
      "cross-survivor repeated blocks must be removed somewhere")
    // every survivor row still present exactly once
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }
}
