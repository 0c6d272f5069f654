package graft.ops

import graft.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling operators beyond the uniform bottom-k-by-hash family
  * (t38): weight-aware selection for quality- or temperature-weighted
  * subcorpus draws.
  */
object Sampling {

  /** Weighted priority sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, exponential-clock form): per group, keep the `k` rows with the
    * smallest key = -ln(u) / w — each row's inclusion probability is
    * proportional-to-weight among its group, and the draw composes across
    * partitions/streams because the per-group state is a bounded top-k
    * ([[graft.sql.TopKByScoreAgg]], O(k) buffer, partial+merge).
    *
    * Deterministic BY CONSTRUCTION, not by RNG state: u comes from an
    * md5 bucket of (salt, id) — stable across partitionings, re-runs, and
    * engines (the t38 trick, so a SQL oracle reproduces the exact draw).
    * Keys are rounded to 12 decimals with an id tie-break so last-ulp
    * ln/division differences across engines can't flip a rank.
    *
    * 100 TB shape: one narrow map (hash + key arithmetic) feeding a
    * hash-partial top-k aggregate — the corpus shuffles only (group, k)
    * survivors; no window, no sort, no per-group unbounded state.
    *
    * Returns (groupCol, idCol) — the selected ids, k per group (fewer when
    * the group is smaller).
    */
  def weightedPrioritySample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "wsmp:"): DataFrame = {
    require(k >= 1, s"weightedPrioritySample needs k >= 1 (got $k)")
    val u = (gr_md5Bucket(concat(lit(salt), col(idCol).cast("string")),
      lit(1000000000)).cast("double") + 1.0) / 1e9
    val key = round(-log(u) / weight, 12)
    df.select(col(groupCol), col(idCol).cast("long").as("_wps_id"), key.as("_wps_k"))
      .groupBy(col(groupCol))
      .agg(gr_topKByScore(-col("_wps_k"), col("_wps_id"), k).as("_wps_sel"))
      .select(col(groupCol), explode(col("_wps_sel")).as("_s"))
      .select(col(groupCol), col("_s.neighbor_id").as(idCol))
  }
}
