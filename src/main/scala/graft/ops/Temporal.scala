package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators every large-scale behavioural/training pipeline
  * needs and Spark has no builtin for: gap sessionization and the as-of
  * (most-recent-prior) join.
  *
  * Both are single-shuffle window formulations. The naive alternatives —
  * a self-join on `ts_a < ts_b` or a per-key `collect_list` — explode
  * quadratically or buffer a whole key in memory; here state per task is
  * one row's lag / running value inside a sort-merge window scan, so a
  * power key with 10^9 events costs sort spill, never memory. (The
  * reference is batch-geometry only; these extend the engine the same way
  * the dedup/ANN operators do.)
  */
object Temporal {

  /** Gap-based sessionization: a session breaks when the time since the
    * same key's previous event exceeds `gap` (in the timestamp column's
    * own unit — pass nanoseconds for parquet ns-timestamps read with
    * nanosAsLong). Appends `session_seq`, the 1-based session index per
    * key.
    *
    * Plan: one hash exchange on `keyCol`, then a single sorted window
    * scan computes both the break flag (lag) and its running sum — no
    * second shuffle, no per-key buffering. `tieCols` break timestamp ties
    * deterministically (e.g. an event id).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gap: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    val ord = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(w)
    df.withColumn("_brk",
        when(prevTs.isNull || col(tsCol) - prevTs > gap, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_brk")).over(cum))
      .drop("_brk")
  }

  /** Streaming gap sessionization (the stateful twin of `sessionize`):
    * `flatMapGroupsWithState` with an event-time timeout. Keyed state is
    * the set of WATERMARK-UNCONFIRMED sessions (start, end, count, sum):
    * a session emits only once the watermark passes end + gap, so an
    * out-of-order event admitted later (within the horizon by the
    * watermark contract) still lands in, extends, or BRIDGES the sessions
    * it belongs to — emit-on-same-batch-successor would have already
    * shipped a session such an event belongs to, corrupting both. State
    * is bounded by the horizon: confirmed sessions leave state, and at
    * most horizon/gap + 1 unconfirmed sessions exist per key. The input
    * must carry a watermark on `tsCol`.
    */
  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // tsCol must pass through untouched: a cast would strip the watermark
    // tag and EventTimeTimeout analysis rejects the plan
    val typed = events.select(col(keyCol).cast("long"),
        col(tsCol), col(valueCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long, Long, Double)],
          (Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it, state: GroupState[Seq[(Long, Long, Long, Double)]]) =>
          def finish(s: (Long, Long, Long, Double)) =
            (key, new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2), s._3, s._4)
          // normalize: sort by start and bridge any sessions within gap —
          // the same fold the batch twin's window-sum break produces
          def mergeAll(ss: Seq[(Long, Long, Long, Double)]): Seq[(Long, Long, Long, Double)] = {
            val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
            ss.sortBy(_._1).foreach { s =>
              if (out.nonEmpty && s._1 - out.last._2 <= gapMs) {
                val p = out.remove(out.length - 1)
                out += ((math.min(p._1, s._1), math.max(p._2, s._2),
                  p._3 + s._3, p._4 + s._4))
              } else out += s
            }
            out.toSeq
          }
          val existing = state.getOption.getOrElse(Seq.empty)
          val all =
            if (state.hasTimedOut) existing
            else mergeAll(existing ++
              it.map(e => (e._2.getTime, e._2.getTime, 1L, e._3)))
          val wm = state.getCurrentWatermarkMs()
          val (ripe, live) = all.partition(_._2 + gapMs <= wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(live)
            // live sessions have end + gap > wm by the partition above,
            // so the timeout is always strictly past the watermark
            state.setTimeoutTimestamp(live.map(_._2).min + gapMs)
          }
          ripe.sortBy(_._1).map(finish).iterator
      }
      .toDF(keyCol, "session_start", "session_end", "n_events", "sum_value")
  }

  /** STREAM-STREAM as-of join (the CDC-enrichment shape: a fact stream
    * picks up the most recent strictly-earlier dimension row of its key —
    * e.g. orders against price updates). Spark has no built-in
    * stream-stream as-of, so the operator unions the two watermarked
    * streams and runs one `flatMapGroupsWithState` per key:
    *
    *  - rows newer than the watermark BUFFER (bounded by the watermark
    *    horizon: rows at most `delay` late are still admissible and could
    *    change an answer, so nothing inside the horizon may emit);
    *  - once the watermark passes a left row's timestamp, its answer is
    *    final by the watermark contract (any still-later right row that
    *    precedes it would be dropped as too late anyway) — the pending
    *    prefix replays in timestamp order against the carried
    *    latest-right and emits;
    *  - state keeps ONE carried right (the latest at-or-before the
    *    watermark) plus only the inside-horizon buffers — O(rows within
    *    the watermark horizon) per key, never unbounded history.
    *
    * Same answer as the batch [[asofJoin]] under strict semantics for
    * every row the watermark admits (the spec replays a shuffled arrival
    * order and compares); equal-timestamp right rows resolve to the
    * greatest value, deterministically — arrival order never decides. Output: (key, ts, left value, asof_ts,
    * asof_value) in append mode; `asof_*` null when no earlier right row
    * exists.
    */
  def asofJoinStream(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, leftValCol: String, rightValCol: String,
      delay: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val l = left.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
      col(leftValCol).cast("double").as("v"), lit(0).as("side"))
      .withWatermark("ts", delay)
    val r = right.select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
      col(rightValCol).cast("double").as("v"), lit(1).as("side"))
      .withWatermark("ts", delay)
    val both = l.union(r).as[(Long, java.sql.Timestamp, Double, Int)]
    // state: (hasCarried, carriedTs, carriedVal, pendingRights, pendingLefts)
    both.groupByKey(_._1)
      .flatMapGroupsWithState[
          (Boolean, Long, Double, Seq[(Long, Double)], Seq[(Long, Double)]),
          (Long, java.sql.Timestamp, Double,
            Option[java.sql.Timestamp], Option[Double])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it, state: GroupState[
          (Boolean, Long, Double, Seq[(Long, Double)], Seq[(Long, Double)])]) =>
          val prev = state.getOption.getOrElse(
            (false, 0L, 0.0, Seq.empty[(Long, Double)], Seq.empty[(Long, Double)]))
          var (has, cTs, cVal, rights0, lefts0) = prev
          // buffer growth must be amortized O(1): Seq :+ per event copies
          // the whole sequence (O(n^2) for a hot key's batch)
          val rBuf = scala.collection.mutable.ArrayBuffer[(Long, Double)]() ++= rights0
          val lBuf = scala.collection.mutable.ArrayBuffer[(Long, Double)]() ++= lefts0
          it.foreach { e =>
            val t = e._2.getTime
            if (e._4 == 1) rBuf += ((t, e._3))
            else lBuf += ((t, e._3))
          }
          var rights: Seq[(Long, Double)] = rBuf.toSeq
          var lefts: Seq[(Long, Double)] = lBuf.toSeq
          val wm = state.getCurrentWatermarkMs()
          // due rows replay in global timestamp order; rights at a left's
          // exact timestamp stay invisible to it (strict semantics), so
          // on ties lefts process first
          // right-timestamp ties resolve to the GREATEST value,
          // deterministically (the batch asofJoin's greatest-tie rule;
          // arrival order is shuffle-dependent and must not decide)
          val dueR = rights.filter(_._1 <= wm).sortBy(r => (r._1, r._2))
          val dueL = lefts.filter(_._1 <= wm).sortBy(_._1)
          rights = rights.filterNot(_._1 <= wm)
          lefts = lefts.filterNot(_._1 <= wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[
            (Long, java.sql.Timestamp, Double,
              Option[java.sql.Timestamp], Option[Double])]
          var ri = 0
          dueL.foreach { case (lt, lv) =>
            while (ri < dueR.length && dueR(ri)._1 < lt) {
              val (rt, rv) = dueR(ri)
              if (!has || rt > cTs || (rt == cTs && rv > cVal)) {
                has = true; cTs = rt; cVal = rv
              }
              ri += 1
            }
            out += ((key, new java.sql.Timestamp(lt), lv,
              if (has) Some(new java.sql.Timestamp(cTs)) else None,
              if (has) Some(cVal) else None))
          }
          while (ri < dueR.length) {
            val (rt, rv) = dueR(ri)
            if (!has || rt > cTs || (rt == cTs && rv > cVal)) {
              has = true; cTs = rt; cVal = rv
            }
            ri += 1
          }
          state.update((has, cTs, cVal, rights, lefts))
          val pendingMin =
            (rights.map(_._1) ++ lefts.map(_._1)).reduceOption(_ min _)
          pendingMin.foreach(t => state.setTimeoutTimestamp(t))
          out.iterator
      }
      .toDF(keyCol, tsCol, leftValCol, "asof_ts", s"asof_$rightValCol")
  }

  /** As-of join: attach to every left row the most recent right row of the
    * same key — strictly earlier by default (`strict = false` for
    * at-or-before). Right columns `rightVals` arrive as `asof_<name>`
    * (null when the key has no prior right row).
    *
    * Plan: union the two inputs into one stream (left rows null-padded),
    * then one window pass per key ordered by (ts, side, tie) carries the
    * last right ROW forward as one struct (`last(..., ignoreNulls)` over
    * an unbounded-preceding frame is a running value, not a buffer). One
    * shuffle total; contrast with the inequality join a SQL engine would
    * plan, which is quadratic per key. Timestamp ties between right rows
    * resolve to the greatest `tieCol`, deterministically.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightVals: Seq[String], tieCol: String,
      strict: Boolean = true, prefix: String = "asof_"): DataFrame = {
    require(rightVals.contains(tieCol), "tieCol must be one of rightVals")
    val asofName = rightVals.map(c => c -> s"$prefix$c").toMap
    // chained enrichment guard: silently overwriting a prior join's
    // asof_<c> column would destroy data — pass a distinct prefix instead
    asofName.values.foreach { n =>
      require(!left.columns.contains(n),
        s"asofJoin: left already carries '$n' (a previous enrichment?) — " +
          "pass a different prefix=")
    }

    // left rows sort before equal-ts right rows under strict semantics
    // (they must not see them), after under at-or-before
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)

    // copy (not rename) into asof_ columns: tsCol itself may be one of
    // rightVals (the caller wants the matched row's timestamp), and the
    // sort column must survive
    var r = right.select((Seq(keyCol, tsCol) ++ rightVals).distinct.map(col): _*)
    rightVals.foreach(c => r = r.withColumn(asofName(c), col(c)))
    r = r.drop(rightVals.filterNot(c => c == keyCol || c == tsCol): _*)
    r = r.withColumn("_side", lit(rightSide))
    left.schema.fields
      .filterNot(f => f.name == keyCol || f.name == tsCol)
      .foreach(f => r = r.withColumn(f.name, lit(null).cast(f.dataType)))

    var l = left.withColumn("_side", lit(leftSide))
    rightVals.foreach { c =>
      l = l.withColumn(asofName(c), lit(null).cast(right.schema(c).dataType))
    }

    // freeze the tie-break under its own name: the carry below overwrites
    // asof_<tieCol>, and every carried column must share ONE window spec so
    // Catalyst plans a single Window node (one sort, one scan)
    // pack the right row's values into ONE struct and carry THAT: per-
    // column last(ignoreNulls) carries would mix fields from DIFFERENT
    // right rows whenever a right value is null — the asof match is the
    // most recent right ROW, nulls and all. The struct itself is non-null
    // exactly on right rows, so last(ignoreNulls) finds the row; fields
    // inside stay null where the matched row had nulls.
    val unioned = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("_tie", col(asofName(tieCol)))
      .withColumn("_asof_row", when(col("_side") === rightSide,
        struct(rightVals.map(c => col(asofName(c)).as(asofName(c))): _*)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_tie"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof_row", last(col("_asof_row"), ignoreNulls = true).over(cum))
    val unpacked = rightVals.foldLeft(carried) { (df, c) =>
      df.withColumn(asofName(c), col("_asof_row")(asofName(c)))
    }
    unpacked.filter(col("_side") === leftSide).drop("_side", "_tie", "_asof_row")
  }

  /** Banded (interval) equi+range join: pairs where `l.keyCol == r.keyCol`
    * and `|l.leftVal - r.rightVal| <= band`. The SQL a user would write —
    * `JOIN ... ON r.v BETWEEN l.v - band AND l.v + band` — plans as a
    * per-key nested loop, quadratic in key group size; this is the 1-D
    * analog of the grid spatial join.
    *
    * Plan: a bucket grid of width `band` on the value axis. The RIGHT
    * side maps each row to its single home bucket `floor(v/band)`; the
    * LEFT side explodes to the (at most three) buckets its
    * `[v-band, v+band]` window overlaps; an ordinary shuffled equi-join
    * on `(key, bucket)` plus the exact `|lv-rv| <= band` residual
    * finishes. Every qualifying pair meets in EXACTLY ONE bucket — the
    * right row's home bucket — so no distinct/dedup pass is needed and
    * each pair is emitted once. Cost is candidates-in-adjacent-buckets
    * (linear in matches for band-sized value spread), the shuffle is a
    * plain hash exchange on `(key, bucket)`, and AQE's skew-join split
    * applies to hot buckets. Colliding right column names get `suffix`.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftVal: String, rightVal: String, band: Double,
      suffix: String = "_r"): DataFrame = {
    require(band > 0, "bandJoin: band must be positive")
    val collisions = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    val r0 = collisions.foldLeft(right)((df, c) => df.withColumnRenamed(c, c + suffix))
    val rv = if (collisions.contains(rightVal)) rightVal + suffix else rightVal
    val lb = left.withColumn("_band_bucket",
      explode(sequence(
        floor((col(leftVal) - lit(band)) / lit(band)).cast("long"),
        floor((col(leftVal) + lit(band)) / lit(band)).cast("long"))))
    val rb = r0.withColumn("_band_bucket", floor(col(rv) / lit(band)).cast("long"))
    lb.join(rb, Seq(keyCol, "_band_bucket"))
      .filter(abs(col(leftVal) - col(rv)) <= lit(band))
      .drop("_band_bucket")
  }
}
