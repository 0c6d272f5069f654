package graft.ops

import graft.sql.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ composed index (r17): the residual-encoding claim behind
  * [[Similarity.trainIvfPqCodebooks]] — at EQUAL code bytes (same m,
  * same ksub), PQ over coarse-list residuals recalls more than PQ over
  * the raw vectors on clustered data, because the coarse quantizer has
  * already explained the cluster geometry and the codewords spend their
  * budget on local detail (Jégou et al. 2011 §IV).
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mix(x: Long): Long =
    graft.sql.TextKernel.mix64(x + 0x9e3779b97f4a7c15L)
  private def u(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  /** `n` points in `dim` dims around `nc` well-separated deterministic
    * centers: point i = center(i % nc) + noise·U(-1,1) per component.
    */
  private def clustered(n: Int, dim: Int, nc: Int, noise: Double): DataFrame = {
    val centers = Array.tabulate(nc, dim)((c, j) => 2.0 * u(c * 131L + j) - 1.0)
    (0 until n).map { i =>
      val c = centers(i % nc)
      val v = Array.tabulate(dim)(j =>
        (c(j) + noise * (2.0 * u(i * 1009L + j * 17L + 7L) - 1.0)).toFloat)
      (i.toLong, v)
    }.toDF("id", "vec")
  }

  private def recall(approx: DataFrame, truth: DataFrame): Long =
    approx.select(col("query_id"), col("neighbor_id"))
      .join(truth.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id")).count()

  test("residual PQ beats flat PQ recall at equal bytes on clustered data") {
    val corpus = clustered(n = 240, dim = 16, nc = 8, noise = 0.15)
    val queries = corpus.filter(col("id") < 10)
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 10)
    val cents = Similarity.trainCentroids(corpus, "id", "vec", nlist = 8)
    // equal bytes: m=4, ksub=8 for BOTH paths (4 codes x 3 bits);
    // nprobe = nlist removes coarse pruning and rerank=0 removes the
    // exact-refine stage, so the measured gap is ENCODING fidelity alone
    val flatCb = Similarity.trainPqCodebooks(corpus, "id", "vec",
      m = 4, ksub = 8, sample = 240)
    val flat = Similarity.pqTopK(corpus, queries, "id", "vec",
      k = 10, m = 4, ksub = 8, codebooks = Some(flatCb))
    val (resCb, resAl) = Similarity.trainIvfPq(corpus, "id", "vec", cents,
      m = 4, ksub = 8, sample = 240)
    val res = Similarity.ivfPqTopK(corpus, queries, "id", "vec",
      k = 10, nlist = 8, nprobe = 8, m = 4, ksub = 8,
      centroids = Some(cents), codebooks = Some(resCb),
      alphas = Some(resAl), sample = 240)
    val (rFlat, rRes) = (recall(flat, truth), recall(res, truth))
    assert(rRes > rFlat,
      s"residual recall $rRes/100 must beat flat PQ recall $rFlat/100 " +
        "at equal bytes on clustered data")
    // and the win must be substantive, not a tie-break artifact
    assert(rRes >= rFlat + 10, s"residual $rRes vs flat $rFlat")
  }

  test("ivfPqTopK is deterministic and exact-in-expectation: fine codes + " +
      "full probe + rerank recover brute-force top-k") {
    val corpus = clustered(n = 120, dim = 16, nc = 4, noise = 0.2)
    val queries = corpus.filter(col("id") < 5)
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 5)
    val run1 = Similarity.ivfPqTopK(corpus, queries, "id", "vec",
      k = 5, nlist = 4, nprobe = 4, m = 4, ksub = 64,
      roundScoreTo = 4, rerank = 40, sample = 120)
    val run2 = Similarity.ivfPqTopK(corpus, queries, "id", "vec",
      k = 5, nlist = 4, nprobe = 4, m = 4, ksub = 64,
      roundScoreTo = 4, rerank = 40, sample = 120)
    val s1 = run1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = run2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 == s2, "two identical runs must produce identical pairs")
    assert(recall(run1, truth) == 25L,
      "full probe + wide rerank must recover every true neighbor")
  }

  test("saveIvfPqIndex/loadIvfPqIndex: exact float roundtrip, malformed " +
      "paths fail loudly") {
    val corpus = clustered(n = 120, dim = 16, nc = 4, noise = 0.2)
    val cents = Similarity.trainCentroids(corpus, "id", "vec", nlist = 4)
    val (cb, al) = Similarity.trainIvfPq(corpus, "id", "vec", cents,
      m = 4, ksub = 8, sample = 120)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx_").toString
    Similarity.saveIvfPqIndex(spark, s"$dir/idx", cents, cb, al, 4)
    val (lc, lcb, lal, lm) = Similarity.loadIvfPqIndex(spark, s"$dir/idx")
    assert(lm == 4 && lc.length == 4 && lcb.length == 32)
    assert(lc.indices.forall(i => java.util.Arrays.equals(lc(i), cents(i))))
    assert(lcb.indices.forall(i => java.util.Arrays.equals(lcb(i), cb(i))))
    assert(java.util.Arrays.equals(lal, al))
    // shape guards fire: alphas length must track centroids
    intercept[IllegalArgumentException] {
      Similarity.saveIvfPqIndex(spark, s"$dir/bad", cents, cb,
        al.take(2), 4)
    }
  }

  test("streamingIvfPqTopK with a loaded index matches batch ivfPqTopK " +
      "pair-for-pair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = clustered(n = 120, dim = 16, nc = 4, noise = 0.2)
    val cents = Similarity.trainCentroids(corpus, "id", "vec", nlist = 4)
    val (cb, al) = Similarity.trainIvfPq(corpus, "id", "vec", cents,
      m = 4, ksub = 8, sample = 120)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_srv_").toString
    Similarity.saveIvfPqIndex(spark, s"$dir/idx", cents, cb, al, 4)
    val (lc, lcb, lal, lm) = Similarity.loadIvfPqIndex(spark, s"$dir/idx")
    val qRows = corpus.filter(col("id") < 6)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ms = MemoryStream[(Long, Array[Float])]
    val q = Similarity.streamingIvfPqTopK(
        ms.toDF.toDF("id", "vec"), corpus, "id", "vec", lc, lcb, lal,
        k = 5, nprobe = 2, m = lm, roundScoreTo = 4)
      .writeStream.outputMode("complete").format("memory")
      .queryName("ivfpq_srv_sink").start()
    try {
      ms.addData(qRows.take(3).toSeq); q.processAllAvailable()
      ms.addData(qRows.drop(3).toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ivfpq_srv_sink")
      .select(col("query_id"), explode(col("neighbors")).as("_n"))
      .select(col("query_id"), col("_n.neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Similarity.ivfPqTopK(corpus, corpus.filter(col("id") < 6),
        "id", "vec", k = 5, nlist = 4, nprobe = 2, m = 4, ksub = 8,
        centroids = Some(cents), codebooks = Some(cb), alphas = Some(al),
        roundScoreTo = 4, rerank = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream $got\nbatch $want")
    assert(got.map(_._1).size == 6 && got.size == 30)
  }

  test("NaN-component corpus vectors are excluded from ranking, not " +
      "ranked first (batch window sorts NaN greatest)") {
    val clean = clustered(n = 60, dim = 16, nc = 4, noise = 0.2)
    val dirty = clean.union(
      Seq((999L, Array.fill(16)(Float.NaN))).toDF("id", "vec"))
    val cents = Similarity.trainCentroids(clean, "id", "vec", nlist = 4)
    val (cb, al) = Similarity.trainIvfPq(clean, "id", "vec", cents,
      m = 4, ksub = 8, sample = 60)
    val got = Similarity.ivfPqTopK(dirty, clean.filter(col("id") < 3),
        "id", "vec", k = 5, nlist = 4, nprobe = 4, m = 4, ksub = 8,
        centroids = Some(cents), codebooks = Some(cb), alphas = Some(al),
        roundScoreTo = 4, rerank = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.exists(_._2 == 999L),
      "a NaN-scored vector must never occupy a top-k slot")
    assert(got.length == 15, "every query still fills its k slots")
  }

  test("incremental encoded-corpus maintenance: update(old, delta) equals " +
      "a full re-encode, and a deleted id never returns") {
    val full = clustered(n = 160, dim = 16, nc = 4, noise = 0.2)
    val cents = Similarity.trainCentroids(full, "id", "vec", nlist = 4)
    val (cb, al) = Similarity.trainIvfPq(full, "id", "vec", cents,
      m = 4, ksub = 8, sample = 160)
    // old = full minus ids 150+ (adds), with ids < 5 reversed (changes);
    // new = full minus ids 60..64 (deletes)
    val v1 = full.filter(col("id") < 150)
      .withColumn("vec", when(col("id") < 5, reverse(col("vec")))
        .otherwise(col("vec")))
    val v2 = full.filter(col("id") < 60 || col("id") >= 65)
    val (encOld, relOld) = Similarity.encodeIvfPqCorpus(v1, "id", "vec",
      cents, cb, al, 4)
    val (delta, deleted) = Similarity.corpusVectorDelta(v1, v2, "id", "vec")
    assert(delta.count() == 15 && deleted.count() == 5) // 10 adds + 5 changes
    val (encInc, relInc) = Similarity.updateEncodedCorpus(encOld, delta,
      deleted, "id", "vec", cents, cb, al, 4)
    val (encFull, relFull) = Similarity.encodeIvfPqCorpus(v2, "id", "vec",
      cents, cb, al, 4)
    try {
      def rows(e: org.apache.spark.sql.DataFrame) = e.select(
          col("neighbor_id"), col("_list"),
          expr("cast(_codes AS string)"))
        .collect().map(_.toSeq).toSet
      assert(rows(encInc) == rows(encFull),
        "incremental encode must be set-identical to a full re-encode")
      val served = Similarity.servedIvfPqTopK(encInc,
        full.filter(col("id") < 6), "id", "vec", cents, cb, al,
        k = 5, nprobe = 4, roundScoreTo = 4)
      val got = served.collect().map(r => (r.getLong(0), r.getLong(1)))
      val gone = deleted.collect().map(_.getLong(0)).toSet
      assert(!got.exists(p => gone.contains(p._2)),
        "a deleted id must never occupy a top-k slot")
      assert(got.length == 30, "every query fills k slots")
    } finally { relOld(); relInc(); relFull() }
  }

  test("serving-join scale contract: at nlist>=1024 the shuffled probe " +
      "join partitions on the list id with key space >= the shuffle width") {
    // The streamingIvfPqTopK scaladoc pins nlist as the serving-
    // parallelism bound: the probe join keys on the coarse list id, so a
    // SHUFFLED join (the 100 TB case — encoded corpus too big to
    // broadcast) can use at most nlist partitions. This audit runs the
    // serving plan at production-shaped nlist=1024 with broadcast
    // disabled and proves (a) the executed join IS keyed on the list id
    // via hashpartitioning, and (b) the key space covers the configured
    // shuffle width — i.e. partitioning scales with nlist, not with some
    // constant.
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream, StreamingQueryWrapper}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val nlist = 1024
    val dim = 8
    // hand-assembled production-shaped index: 1024 deterministic unit
    // centroids, trivial m=2/ksub=4 codebooks, unit anchors
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(dim)(j => (2.0 * u(seed * 131L + j) - 1.0))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val cents = Array.tabulate(nlist)(i => unit(i + 1L))
    val cb = Array.tabulate(8)(c => Array.tabulate(dim / 2)(j =>
      (0.01 * (c - 4) * (j + 1)).toFloat))
    val al = Array.fill(nlist)(1.0f)
    val corpus = clustered(n = 200, dim = dim, nc = 16, noise = 0.3)
    val (enc, release) = Similarity.encodeIvfPqCorpus(corpus, "id", "vec",
      cents, cb, al, m = 2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ms = MemoryStream[(Long, Array[Float])]
      val q = Similarity.streamingIvfPqTopK(
          ms.toDF.toDF("id", "vec"), corpus, "id", "vec", cents, cb, al,
          k = 5, nprobe = 4, m = 2, encoded = Some(enc))
        .writeStream.outputMode("complete").format("memory")
        .queryName("ivfpq_plan_sink").start()
      val plan = try {
        ms.addData(corpus.filter(col("id") < 4).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq)
        q.processAllAvailable()
        q.asInstanceOf[StreamingQueryWrapper].streamingQuery
          .lastExecution.executedPlan.toString
      } finally q.stop()
      assert(plan.contains("hashpartitioning(_plist") ||
          plan.contains("hashpartitioning(_list"),
        s"serving join must partition on the coarse list id:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        "broadcast disabled — the audit must exercise the shuffled shape")
      val width = spark.sessionState.conf.numShufflePartitions
      assert(nlist >= width,
        s"production nlist=$nlist must cover the shuffle width $width")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      release()
    }
  }
}
