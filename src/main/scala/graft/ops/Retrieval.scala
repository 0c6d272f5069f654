package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-retrieval operators for training-data pipelines: the "find the
  * corpus documents most relevant to this probe" primitive behind
  * retrieval-based data curation (DSIR-style importance sampling and
  * targeted quality audits both start from exactly this query shape), and
  * the lexical complement to the dense ANN paths in [[Similarity]].
  */
object Retrieval {

  /** BM25 top-k retrieval (Robertson–Spärck Jones; the Lucene/ATIRE
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` variant, which is always
    * positive) of `k` documents per query over whitespace tokens.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * Queries arrive as literal (query_id, terms) pairs — the interactive /
    * audit shape, not a distributed query table. Scores are rounded to 4
    * decimals with a doc-id tie-break before ranking so the ordering is
    * reproducible across engines despite last-ulp summation differences.
    * Output: (query_id, rank, id, score), rank 1-based best-first; a query
    * whose terms all miss the corpus returns no rows.
    *
    * Scale shape (100 TB corpus): the token stream is filtered to QUERY
    * terms by a codegen'd `IN` literal before anything wide happens, so
    * the corpus-sized explode stays narrow and only (doc, term) hits reach
    * the tf aggregation; tf is pinned (localCheckpoint) so its three
    * consumers never re-run the corpus scan, and df/idf are computed from
    * that already-tiny table and broadcast back onto it with the corpus stats riding along
    * as a 1-row cross; the final per-query ranking is [[gr_topKByScore]] —
    * O(k) aggregation state per query, map-side partial top-k summaries
    * are all that cross the last shuffle. The full vocabulary is never
    * aggregated and the corpus never self-joins.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])],
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK: at least one query")
    require(k >= 1, s"bm25TopK: k >= 1 (got $k)")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(col(idCol).cast("long").as("_id"),
      gr_tokens(col(textCol)).as("_toks"))
      .withColumn("_dl", size(col("_toks")).cast("double"))
    // corpus stats: N over ALL documents, avgdl over ALL documents
    // (zero-token docs count — they dilute avgdl exactly as in Lucene)
    val stats = base.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl"))

    val terms = queries.flatMap(_._2).distinct
    // distinct over (query_id, term): duplicate ENTRIES of the same
    // query id (a list built incrementally) must not double-weight a
    // shared term in the score sum
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map(w => (q, w)) }
      .distinct.toDF("query_id", "w")

    // narrow prefilter: only query-term occurrences survive the explode;
    // the tiny tf result is PINNED — it feeds the df table, the idf
    // broadcast, and the scoring join, and without the checkpoint each
    // consumer would re-run the corpus-sized tokenize+explode
    val tf = org.apache.spark.sql.GraftInterop.localCheckpointCappedStats(base
      .select(col("_id"), col("_dl"), explode(col("_toks")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("_id"), col("_dl"), col("w"))
      .agg(count(lit(1)).cast("double").as("_tf")))
    // tf is one row per (doc, term) → df(term) = plain count
    val dfTab = tf.groupBy(col("w")).agg(count(lit(1)).cast("double").as("_df"))

    val qidf = qt.join(dfTab, Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("w"),
        log(lit(1.0) + (col("_n") - col("_df") + lit(0.5))
          / (col("_df") + lit(0.5))).as("_idf"),
        col("_avgdl"))

    tf.join(broadcast(qidf), Seq("w"))
      .select(col("query_id"), col("_id"),
        (col("_idf") * col("_tf") * lit(k1 + 1.0)
          / (col("_tf") + lit(k1)
            * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl")))).as("_c"))
      .groupBy(col("query_id"), col("_id"))
      .agg(round(sum(col("_c")), 4).as("_score"))
      .groupBy(col("query_id"))
      .agg(gr_topKByScore(col("_score"), col("_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"),
        (col("_pos") + 1).cast("long").as("rank"),
        col("_t.neighbor_id").as(idCol),
        col("_t.score").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of N ranked
    * lists — the standard hybrid-retrieval combiner for a lexical
    * ([[bm25TopK]]) and a dense ([[graft.ops.Similarity]] ANN) ranking:
    *
    *   score(q, d) = Σ_over_lists 1 / (rrfK + rank_list(q, d))
    *
    * Each input needs (query_id, rank, `idCol`) with rank 1-based
    * best-first; documents absent from a list contribute nothing for it.
    * Output: (query_id, rank, idCol, score), fused rank 1-based, ties by
    * lower id. Scores are rounded to 10 decimals (each term ≤ 1/(rrfK+1),
    * sums stay ≪ 1, so 10 dp is far inside double precision) to pin the
    * cross-engine ordering.
    *
    * Scale shape: the inputs are already top-k lists — O(queries × k ×
    * lists) rows — so this is a post-retrieval reduce, never corpus-sized.
    * The fused top-k uses [[gr_topKByScore]]: O(k) state per query,
    * partial-aggregation friendly, valid as a streaming update aggregate.
    */
  def rrfFuse(
      lists: Seq[DataFrame],
      idCol: String,
      k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: at least one ranked list")
    require(k >= 1, s"rrfFuse: k >= 1 (got $k)")
    require(rrfK >= 1, s"rrfFuse: rrfK >= 1 (got $rrfK)")
    val norm = lists.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col(idCol).cast("long").as("_id"),
      col("rank").cast("long").as("_rank")))
    norm.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("_id"))
      .agg(round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("_rank"))), 10).as("_score"))
      .groupBy(col("query_id"))
      .agg(gr_topKByScore(col("_score"), col("_id"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("query_id"),
        (col("_pos") + 1).cast("long").as("rank"),
        col("_t.neighbor_id").as(idCol),
        col("_t.score").as("score"))
  }
}
