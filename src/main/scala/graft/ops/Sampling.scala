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
    * Keys are rounded to 12 decimals with an id tie-break; for keys below
    * ~1e3 (weights not absurdly small) that absorbs last-ulp ln/division
    * differences across engines. Larger keys exceed double's 15-16
    * significant digits, so `round(·, 12)` is an identity there and the
    * cross-engine determinism claim narrows to: same draw whenever no two
    * keys in a group differ only past the representable precision.
    *
    * Weights MUST be positive: a negative weight would produce a negative
    * key that ranks FIRST (violating proportional-to-weight), so rows with
    * `weight <= 0` or null weight get a null key and are skipped by the
    * top-k aggregate — excluded from the draw, the only reading of A-ES
    * consistent with "probability proportional to weight".
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
    IdCols.requireIntegral(df, idCol, "weightedPrioritySample")
    val u = (gr_md5Bucket(concat(lit(salt), col(idCol).cast("string")),
      lit(1000000000)).cast("double") + 1.0) / 1e9
    // weight <= 0 (or null) -> null key -> skipped by TopKByScoreAgg's
    // null guard, never silently ranked first
    val key = when(weight > 0, round(-log(u) / weight, 12))
    df.select(col(groupCol), col(idCol).cast("long").as("_wps_id"), key.as("_wps_k"))
      .groupBy(col(groupCol))
      .agg(gr_topKByScore(-col("_wps_k"), col("_wps_id"), k).as("_wps_sel"))
      .select(col(groupCol), explode(col("_wps_sel")).as("_s"))
      .select(col(groupCol), col("_s.neighbor_id").as(idCol))
  }

  /** Temperature-rebalanced resampling across groups (the XLM/mT5
    * multilingual alpha-sampling shape): group i receives a target of
    * `floor(targetTotal * n_i^alpha / sum_j n_j^alpha + 0.5)` rows (capped
    * at n_i), drawn uniformly-by-hash within the group. alpha < 1 flattens
    * the head languages and upsamples the tail's SHARE (never repeats
    * rows — this is selection, not replication; pair it with
    * mixtureExpand-style replication when epochs > 1 are wanted).
    *
    * Deterministic: the within-group draw is bottom-k by md5 bucket (the
    * t38 trick); the target arithmetic sums the group weights in the
    * STRING order of the group keys (left-to-right IEEE fold) so an
    * engine-independent oracle reproduces the exact targets — a SQL
    * mirror of a non-string group column must pin the same fold with
    * `list(w ORDER BY CAST(g AS VARCHAR))`.
    *
    * 100 TB shape: the group-count table collects to the driver (bounded
    * by |groups| — languages/domains, not rows), targets ride back as a
    * broadcast literal table, and the draw is one narrow map into the
    * bounded `TopKByScoreAgg` sized to the LARGEST target, sliced
    * per-group after — no window over the corpus, no full sort.
    *
    * Returns (groupCol, idCol) of the selected rows.
    */
  def temperatureResample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      alpha: Double,
      targetTotal: Long,
      salt: String = "tmp:"): DataFrame = {
    require(alpha > 0 && alpha <= 1.0, s"alpha in (0, 1] expected (got $alpha)")
    require(targetTotal >= 1, s"targetTotal >= 1 expected (got $targetTotal)")
    // per-group targets bound maxK below, and the top-k aggregate buffer
    // indexes by Int — a larger target would overflow to a negative k
    require(targetTotal <= Int.MaxValue.toLong,
      s"targetTotal must fit in Int (got $targetTotal); at that scale use " +
        "a per-group bottom-k threshold draw instead of an exact top-k")
    IdCols.requireIntegral(df, idCol, "temperatureResample")
    // null group keys (e.g. lang before lang-id fills in) are rejected
    // explicitly: a silent null would NPE here or vanish in the target
    // join below — both worse than the actionable error. Group values
    // keep their NATIVE type (the target table must equi-join back, so a
    // string-ified int key would break non-string groups).
    val counts = df.groupBy(col(groupCol)).count()
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"temperatureResample: null $groupCol group — filter or fill nulls first")
        (r.get(0), r.getLong(1))
      }.sortBy(_._1.toString)
    val weights = counts.map { case (g, n) => (g, n, math.pow(n.toDouble, alpha)) }
    val total = weights.foldLeft(0.0)(_ + _._3) // group-key order, IEEE fold
    val targets = weights.map { case (g, n, w) =>
      (g, math.min(n, math.floor(targetTotal * w / total + 0.5).toLong))
    }
    if (targets.isEmpty)
      // empty input: the natural result is an empty (group, id) frame,
      // not an empty.max crash
      return df.select(col(groupCol), col(idCol)).limit(0)
    val maxK = math.max(1L, targets.map(_._2).max).toInt
    val spark = df.sparkSession
    val tgtSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(groupCol).copy(nullable = false),
      org.apache.spark.sql.types.StructField("_tr_k",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val tgt = spark.createDataFrame(
      java.util.Arrays.asList(targets.map { case (g, k) =>
        org.apache.spark.sql.Row(g, k) }: _*), tgtSchema)
    val hk = gr_md5Bucket(concat(lit(salt), col(idCol).cast("string")),
      lit(1000000000)).cast("double")
    df.select(col(groupCol), col(idCol).cast("long").as("_tr_id"), hk.as("_tr_h"))
      .groupBy(col(groupCol))
      .agg(gr_topKByScore(-col("_tr_h"), col("_tr_id"), maxK).as("_tr_sel"))
      .join(broadcast(tgt), Seq(groupCol))
      .select(col(groupCol),
        explode(slice(col("_tr_sel"), lit(1), col("_tr_k").cast("int"))).as("_s"))
      .select(col(groupCol), col("_s.neighbor_id").as(idCol))
  }
}

/** Shared guard for operators that carry ids through a long cast into a
  * typed aggregate: a string/UUID id would cast to NULL and silently
  * empty the result (the aggregates skip null ids) — fail loudly with
  * the remedy instead.
  */
private[ops] object IdCols {
  import org.apache.spark.sql.types._
  def requireIntegral(df: DataFrame, idCol: String, op: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType,
      s"$op: id column '$idCol' must be integral (got $dt) — string/UUID " +
        "ids cast to NULL and silently empty the result; map them to longs " +
        "(e.g. xxhash64(id)) first")
  }
}
