package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic 2-factor data embedded in 4 dims: x = [t, 2t, u, 0] + mu
  // with t, u independent zero-mean factors -> analytic covariance
  //   var(t) * [1 2 0 0; 2 4 0 0] on the first block, var(u) at (2,2),
  //   exact zeros elsewhere; eigenvalues 5*var(t), var(u), 0, 0.
  private def factorDf(n: Int) = {
    val mu = Array(1.0, -2.0, 0.5, 3.0)
    (0 until n).map { i =>
      val t = (i % 11) - 5.0   // mean 0 over a full cycle (n % 11 == 0)
      val u = (i % 7) - 3.0    // mean 0 over a full cycle (n % 7 == 0)
      (i.toLong, Array(
        (mu(0) + t).toFloat, (mu(1) + 2 * t).toFloat,
        (mu(2) + u).toFloat, mu(3).toFloat))
    }.toDF("id", "vec")
  }

  // population variance of a full 0..m-1 cycle: (m^2 - 1) / 12
  private def varOfCycle(m: Int): Double = (m.toDouble * m - 1.0) / 12.0

  test("fitPca recovers the analytic factor structure") {
    val n = 7 * 11 * 4 // full cycles of both factors
    val df = factorDf(n).repartition(5)
    val model = Embeddings.fitPca(df, "vec", dim = 4)
    assert(model.n == n)
    // means recovered
    assert(math.abs(model.mean(0) - 1.0) < 1e-9)
    assert(math.abs(model.mean(3) - 3.0) < 1e-9)
    // eigenvalues: 5*var(t), var(u), 0, 0 (t over 11-cycle, u over 7-cycle)
    val vt = varOfCycle(11); val vu = varOfCycle(7)
    assert(math.abs(model.eigenvalues(0) - 5 * vt) < 1e-9,
      s"${model.eigenvalues(0)} vs ${5 * vt}")
    assert(math.abs(model.eigenvalues(1) - vu) < 1e-9)
    assert(math.abs(model.eigenvalues(2)) < 1e-9 && math.abs(model.eigenvalues(3)) < 1e-9)
    // first axis is (1,2,0,0)/sqrt(5), sign-normalized
    val c0 = model.components(0)
    assert(math.abs(c0(0) - 1.0 / math.sqrt(5)) < 1e-9)
    assert(math.abs(c0(1) - 2.0 / math.sqrt(5)) < 1e-9)
    assert(math.abs(c0(2)) < 1e-9 && math.abs(c0(3)) < 1e-9)
    // orthonormal basis
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => model.components(i)(k) * model.components(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"C C^T at ($i,$j): $dot")
    }
    // trace preserved
    assert(math.abs(model.trace - (5 * vt + vu)) < 1e-9)
  }

  test("projection variance equals the eigenvalues; whitening gives unit variance") {
    val n = 7 * 11 * 4
    val df = factorDf(n)
    val model = Embeddings.fitPca(df, "vec", dim = 4)
    val proj = Embeddings.project(df, "vec", model, k = 2, outCol = "pc")
    val vs = proj.select(posexplode(col("pc")))
      .groupBy("pos").agg(var_pop(col("col")).as("v"))
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(math.abs(vs(0) - model.eigenvalues(0)) < 1e-9)
    assert(math.abs(vs(1) - model.eigenvalues(1)) < 1e-9)

    val white = Embeddings.project(df, "vec", model, k = 2, outCol = "pc", whiten = true)
    val ws = white.select(posexplode(col("pc")))
      .groupBy("pos").agg(var_pop(col("col")).as("v"))
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(math.abs(ws(0) - 1.0) < 1e-9 && math.abs(ws(1) - 1.0) < 1e-9)

    // zero-variance axes whiten to exactly 0, not NaN
    val z = Embeddings.project(df, "vec", model, k = 4, outCol = "pc", whiten = true)
      .select(sum(abs(expr("pc[3]")))).collect()(0).getDouble(0)
    assert(z == 0.0)
  }

  test("fit is partitioning-invariant and skips ragged/null vectors") {
    val n = 7 * 11 * 2
    val base = factorDf(n)
    val noisy = base.unionByName(
      Seq((9000L, Array(1.0f, 2.0f)), (9001L, null.asInstanceOf[Array[Float]]))
        .toDF("id", "vec"))
    val m1 = Embeddings.fitPca(noisy.repartition(1), "vec", dim = 4)
    val m7 = Embeddings.fitPca(noisy.repartition(7), "vec", dim = 4)
    assert(m1.n == n && m7.n == n) // ragged + null skipped
    for (i <- 0 until 4)
      assert(math.abs(m1.eigenvalues(i) - m7.eigenvalues(i)) < 1e-9)
  }

  test("semanticDedup projectDim: clustering in PCA space keeps the exact pair set") {
    // 120 base vectors with real variance in 4 of 16 dims + 20 planted
    // near-duplicates; projecting to 4 dims must find the same pairs the
    // full-space run finds (precision is exact in both by construction)
    val rnd = new scala.util.Random(7)
    val base = (0 until 120).map { i =>
      val v = Array.fill(16)(0.0f)
      // +2 keeps every vector well away from the origin (a near-zero
      // vector's cosine is noise-dominated and breaks the fixture)
      v(0) = (i % 11).toFloat + 2f; v(1) = (i % 7).toFloat
      v(2) = (i % 5).toFloat; v(3) = (i % 3).toFloat
      (0 until 16).foreach(j => v(j) = v(j) + (rnd.nextFloat() - 0.5f) * 0.01f)
      (i.toLong, v)
    }
    val dups = base.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.001f)) // near-exact copies
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def pairs(pd: Int) = Dedup
      .semanticDedup(df, "vec_id", "embedding", threshold = 0.999,
        nlist = 8, nprobe = 3, projectDim = pd)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = pairs(0)
    val proj = pairs(4)
    assert(full.nonEmpty, "fixture should plant near-dup pairs")
    // every planted (i, i+1000) pair is found by both runs, and the two
    // candidate spaces agree on the WHOLE pair set (both verify cosine in
    // the original space, so only recall could differ — and must not)
    val planted = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    assert(planted.subsetOf(full), s"full-space missed ${planted -- full}")
    assert(planted.subsetOf(proj), s"projected run missed ${planted -- proj}")
    assert(proj == full,
      s"pair sets diverge: only-full=${full -- proj} only-proj=${proj -- full}")
  }

  test("project is streaming-compatible (stateless per-row map, append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = 7 * 11
    val batch = factorDf(n)
    val model = Embeddings.fitPca(batch, "vec", dim = 4)
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = Embeddings.project(
      mem.toDF().toDF("id", "vec"), "vec", model, k = 2, outCol = "pc")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("pca_stream").trigger(Trigger.ProcessingTime(0)).start()
    val rows = (0 until 10).map { i =>
      (i.toLong, factorDf(n).filter(col("id") === i)
        .head().getSeq[Float](1))
    }
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT id, pc FROM pca_stream")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val expected = Embeddings.project(batch.filter(col("id") < 10), "vec", model, 2, "pc")
      .select("id", "pc")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(streamed == expected)
  }

  test("reconstruction error equals the residual eigenvalue mass") {
    val n = 7 * 11 * 2
    val df = factorDf(n)
    val model = Embeddings.fitPca(df, "vec", dim = 4)
    val k = 1
    val proj = Embeddings.project(df, "vec", model, k = k, outCol = "pc")
    // E||x - mean||^2 - sum_j<k var(pc_j) == sum_j>=k lambda_j
    val meanLit = typedLit(model.mean.toSeq)
    val totalSq = proj
      .withColumn("c", zip_with(col("vec").cast("array<double>"), meanLit, (a, b) => a - b))
      .select(avg(aggregate(col("c"), lit(0.0), (s, x) => s + x * x)).as("tot"),
        avg(expr("pc[0] * pc[0]")).as("v0"))
      .collect()(0)
    val residual = totalSq.getDouble(0) - totalSq.getDouble(1)
    val expected = model.eigenvalues.drop(k).sum
    assert(math.abs(residual - expected) < 1e-9, s"$residual vs $expected")
  }
}
