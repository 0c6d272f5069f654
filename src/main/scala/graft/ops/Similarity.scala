package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - `bruteForceTopK`: exact top-k by cosine. The query side is broadcast
  *   (queries are expected to be small); the corpus streams through one
  *   narrow stage, and per-query top-k is a window rank. At 100 TB the
  *   corpus never shuffles: only (query x k) rows survive the partial
  *   top-k.
  * - `lshTopK`: approximate — random-hyperplane LSH bucket join (with
  *   multi-probe by flipping each of the `bits` sign bits) then exact
  *   rerank inside candidate buckets.
  */
object Similarity {

  /** Exact cosine top-k. Returns (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", gr_cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k. Centroids are the `nlist`
    * lowest-id corpus vectors (deterministic — no trained model to ship, and
    * no assumption that ids are dense from 0); each corpus vector is
    * assigned to its nearest centroid by a NARROW map (the centroid matrix
    * rides into the expression as a literal, so assignment costs no
    * shuffle — the 100 TB path). Queries probe their `nprobe` nearest
    * lists; the probe side is tiny and broadcasts, so the corpus still
    * never shuffles. Exact rerank within probed lists.
    *
    * `roundCosineTo >= 0` rounds the cosine BEFORE the top-k rank (ties
    * broken by neighbor id), making the output deterministic at that
    * granularity — required when an external oracle re-derives the result.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      roundCosineTo: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val cents: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
      .orderBy(col("_id"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    val centArr = array(cents.map(c => typedlit(c)).toIndexedSeq: _*)

    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      gr_argmaxCosine(col(vecCol), centArr).as("_list"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        explode(gr_topnCosine(col(vecCol), centArr, lit(nprobe))).as("_list"))
    val rawCos = gr_cosine(col("_qv"), col("_cv"))
    val candidates = assigned.join(broadcast(probes),
        assigned("_list") === probes("_list") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", if (roundCosineTo >= 0) round(rawCos, roundCosineTo) else rawCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: bucket corpus and queries by LSH signature; probe
    * the exact bucket plus all 1-bit-flip neighbors; exact rerank within
    * candidates. Recall grows with `bits` lowered or probes widened.
    * `roundCosineTo` as in [[ivfTopK]].
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      k: Int = 10, bits: Int = 12, seed: Int = 7,
      roundCosineTo: Int = -1): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      gr_lshBucket(col(vecCol), lit(bits), lit(seed)).as("_bucket"))
    // multi-probe: original bucket + flip each bit
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        gr_lshBucket(col(vecCol), lit(bits), lit(seed)).as("_b0"))
      .withColumn("_probe", explode(array(
        (col("_b0") +: (0 until bits).map(b => col("_b0").bitwiseXOR(lit(1L << b)))): _*)))
    val rawCos = gr_cosine(col("_qv"), col("_cv"))
    // broadcast the (small) probe side like bruteForceTopK/ivfTopK do: the
    // corpus must never shuffle, and that property should be structural,
    // not dependent on AQE having fresh statistics for the query set
    val candidates = c.join(broadcast(probes), col("_bucket") === col("_probe") &&
      col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", if (roundCosineTo >= 0) round(rawCos, roundCosineTo) else rawCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    // no distinct needed: the probe values (b0 and its single-bit flips) are
    // pairwise distinct, so a corpus row's bucket matches at most one probe
    // row per query — (query, neighbor) pairs are already unique
    candidates
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
