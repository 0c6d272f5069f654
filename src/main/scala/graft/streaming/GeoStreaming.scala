package graft.streaming

import graft.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming enablement — an extension beyond the reference
  * (which is batch-only, SURVEY §2.9). Every stateless st_ and gr_
  * expression is streaming-compatible by construction; these helpers add
  * the common stateful shapes: windowed spatial aggregation and geofences.
  */
object GeoStreaming {

  /** Executor-side decode memo for broadcast fence sets, keyed by
    * (application id, broadcast id). The broadcast id alone is wrong —
    * ids restart from 0 when a SparkContext is stopped and recreated in
    * the same JVM (local mode, test suites), so a new fence broadcast
    * could silently receive a previous context's decoded set; the app
    * id disambiguates contexts. Keying by the Broadcast OBJECT would be
    * wrong the other way: every task deserializes its OWN broadcast
    * stub from the closure, so identity keys miss once per task and
    * the memo stops being per-executor. ConcurrentHashMap so cache HITS
    * and decodes of unrelated broadcasts never serialize behind one
    * JVM-global mutex (a first decode does a broadcast fetch + full WKB
    * parse — a synchronized map would stall every live geofence query
    * for its duration; CHM contends per-bin, and only same-key callers
    * wait, which is the point). Bounded at 64: at the threshold,
    * stopped-context entries (appId ≠ current) evict first; only if the
    * CURRENT context alone filled the memo does it clear wholesale.
    */
  private val fenceDecodeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Seq[(Long, graft.geom.Geometry)]]()
  private[streaming] def decodedFences(
      b: org.apache.spark.broadcast.Broadcast[Seq[(Long, Array[Byte])]])
      : Seq[(Long, graft.geom.Geometry)] = {
    def decode() = b.value.map { case (id, wkb) => (id, graft.geom.Wkb.read(wkb)) }
    val env = org.apache.spark.SparkEnv.get
    if (env == null) decode() // no running env (shutdown edge): skip the memo
    else {
      val appId = env.conf.get("spark.app.id", "")
      if (fenceDecodeCache.size >= 64) {
        val it = fenceDecodeCache.keySet.iterator()
        while (it.hasNext) if (it.next()._1 != appId) it.remove()
        if (fenceDecodeCache.size >= 64) fenceDecodeCache.clear()
      }
      fenceDecodeCache.computeIfAbsent((appId, b.id), _ => decode())
    }
  }

  /** Windowed count + bounds of event points per time window and key.
    * Works on both batch and streaming DataFrames (same plan); with a
    * streaming source add `.withWatermark("ts", ...)` upstream.
    */
  def windowedSpatialAgg(
      events: DataFrame,
      tsCol: String,
      xCol: String,
      yCol: String,
      window: String,
      keyCols: Seq[String]): DataFrame = {
    val pts = events.withColumn("_g", st_point(col(xCol), col(yCol)))
    pts.groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        st_envelopeAgg(col("_g")).as("bounds"))
  }

  /** Tag each event with the geofence polygons (small, broadcast) it falls
    * in — the streaming form of the points-in-polygons sjoin.
    */
  def geofence(
      events: DataFrame, xCol: String, yCol: String,
      fences: DataFrame, fenceGeomCol: String): DataFrame = {
    val pts = events.withColumn("_g", st_point(col(xCol), col(yCol)))
    pts.join(broadcast(fences), st_contains(fences(fenceGeomCol), pts("_g")), "inner")
      .drop("_g")
  }

  /** Grid-bucketed stream-static spatial join (r10): streaming points vs a
    * static polygon table, joined on fixed origin-anchored grid cells so
    * the per-event work is an EQUI-join probe instead of the broadcast-NLJ
    * predicate scan of [[geofence]] — the shape that holds when the static
    * side is too wide for per-event full scans but its cell index still
    * broadcasts.
    *
    * Exactly-once is STRUCTURAL, not stateful: the static side explodes to
    * its covering cells once (it is a batch DataFrame — Catalyst plans the
    * explode+broadcast once per micro-batch), while each streaming point
    * owns exactly ONE cell; a (point, polygon) pair can therefore meet
    * only in the point's cell, so no dedup state is kept and the join
    * stays fully stateless (append-mode safe, no watermark needed).
    *
    * `predicate`: "intersects" (default), "contains" (polygon strictly
    * contains point) or "dwithin" (within `distance`; pads the static
    * side's cells, preserving the grid-join invariant). The exact
    * predicate always re-checks inside the matched cell — the grid only
    * prunes.
    */
  def streamStaticSjoin(
      stream: DataFrame, xCol: String, yCol: String,
      static: DataFrame, staticGeomCol: String,
      cellSize: Double,
      predicate: String = "intersects",
      distance: Double = 0.0): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val pad = predicate match {
      case "intersects" | "contains" => 0.0
      case "dwithin" =>
        require(distance >= 0, "dwithin needs a non-negative distance"); distance
      case other => throw new IllegalArgumentException(
        s"unknown streamStaticSjoin predicate '$other' (intersects | contains | dwithin)")
    }
    val cells = static.withColumn("_cell", explode(
      st_gridCellsSizedPad(col(staticGeomCol), lit(cellSize), lit(pad))))
    val pts = stream.withColumn("_g", st_point(col(xCol), col(yCol)))
      .withColumn("_cell", element_at(
        st_gridCellsSized(col("_g"), lit(cellSize)), 1))
    val exact = predicate match {
      case "contains" => st_contains(cells(staticGeomCol), pts("_g"))
      case "dwithin"  => st_dwithin(cells(staticGeomCol), pts("_g"), lit(distance))
      case _          => st_intersects(cells(staticGeomCol), pts("_g"))
    }
    pts.join(broadcast(cells), pts("_cell") === cells("_cell") && exact, "inner")
      .drop("_g").drop("_cell")
  }

  /** Watermarked STREAM-STREAM proximity join (r11): pairs of events from
    * two live point streams that occur within `distance` of each other AND
    * within `withinSeconds` of each other — the moving-proximity join
    * (vehicle encounters, contact tracing, sensor co-observation). Spark's
    * stream-stream machinery needs equality keys plus a bounded event-time
    * range: the GRID supplies the equality key — the left point explodes
    * to its distance-padded cells, the right point keeps its single home
    * cell, so each qualifying pair meets in EXACTLY one cell (the right
    * home) with no dedup pass, the same exactly-once construction as the
    * batch grid sjoin. State is bounded by the watermark: each side keeps
    * only rows younger than `watermarkDelay` + `withinSeconds`.
    *
    * Left columns pass through; right columns COLLIDING with a left
    * name come back `_r`-suffixed (non-colliding right columns keep
    * their names); a rename that would itself collide with an existing
    * right column is refused loudly. Both timestamp columns must be
    * TimestampType.
    */
  def streamStreamDwithin(
      left: DataFrame, lx: String, ly: String, lts: String,
      right: DataFrame, rx: String, ry: String, rts: String,
      cellSize: Double, distance: Double, withinSeconds: Long,
      watermarkDelay: String = "30 seconds"): DataFrame = {
    require(cellSize > 0 && distance >= 0 && withinSeconds >= 0,
      "streamStreamDwithin: bad parameters")
    val l = left.withWatermark(lts, watermarkDelay)
      .withColumn("_lg", st_point(col(lx), col(ly)))
      .withColumn("_cell", explode(
        st_gridCellsSizedPad(col("_lg"), lit(cellSize), lit(distance))))
    val rRenamed = right.columns.foldLeft(right) { (acc, c) =>
      if (left.columns.contains(c)) {
        require(!right.columns.contains(c + "_r"),
          s"streamStreamDwithin: renaming right column '$c' to '${c}_r' " +
            "collides with an existing right column — rename one first")
        acc.withColumnRenamed(c, c + "_r")
      } else acc
    }
    val rtsName = if (left.columns.contains(rts)) rts + "_r" else rts
    val rxName = if (left.columns.contains(rx)) rx + "_r" else rx
    val ryName = if (left.columns.contains(ry)) ry + "_r" else ry
    val r = rRenamed.withWatermark(rtsName, watermarkDelay)
      .withColumn("_rg", st_point(col(rxName), col(ryName)))
      .withColumn("_rcell", element_at(
        st_gridCellsSized(col("_rg"), lit(cellSize)), 1))
    val timeBand = col(rtsName) >= col(lts) - expr(s"INTERVAL $withinSeconds SECONDS") &&
      col(rtsName) <= col(lts) + expr(s"INTERVAL $withinSeconds SECONDS")
    l.join(r, col("_cell") === col("_rcell") && timeBand &&
        st_dwithin(col("_lg"), col("_rg"), lit(distance)), "inner")
      .drop("_lg", "_rg", "_cell", "_rcell")
  }

  /** Stateful geofence ENTER/EXIT detection per entity: keeps the set of
    * fences each key is currently inside as keyed state
    * (`flatMapGroupsWithState`) and emits one row per transition. The fence
    * set is small and rides to executors via broadcast; per-key state is an
    * id array — both independent of stream volume. Output columns:
    * (key, ts, fence_id, event) with event in {enter, exit}.
    */
  def geofenceTransitions(
      events: DataFrame,
      keyCol: String, tsCol: String, xCol: String, yCol: String,
      fences: Map[Long, graft.geom.Geometry]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val fencesB = spark.sparkContext.broadcast(
      fences.toSeq.map { case (id, g) => (id, graft.geom.Wkb.write(g)) })

    // rows with a null key/timestamp/coordinate are dropped, not fatal:
    // one bad event must not abort the micro-batch through the
    // non-nullable tuple encoder (or NPE in the per-key time sort)
    val typed = events.select(col(keyCol).cast("string"), col(tsCol).cast("timestamp"),
        col(xCol).cast("double"), col(yCol).cast("double"))
      .na.drop()
      .as[(String, java.sql.Timestamp, Double, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, java.sql.Timestamp, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[Array[Long]]) =>
          // decode ONCE per executor per broadcast, not once per key per
          // micro-batch (10k fences x 50k keys would re-parse 500M times)
          val fns = GeoStreaming.decodedFences(fencesB)
          var current = state.getOption.map(_.toSet).getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[(String, java.sql.Timestamp, Long, String)]()
          it.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, x, y) =>
            val nowIn = fns.collect {
              case (id, g) if graft.geom.Predicates.intersects(g, graft.geom.Point(x, y)) => id
            }.toSet
            (nowIn -- current).toSeq.sorted.foreach(id => out += ((key, ts, id, "enter")))
            (current -- nowIn).toSeq.sorted.foreach(id => out += ((key, ts, id, "exit")))
            current = nowIn
          }
          state.update(current.toArray)
          out.iterator
      }
      .toDF(keyCol, tsCol, "fence_id", "event")
  }

  /** Streaming GeoParquet sink: each micro-batch lands as its own
    * hive-partition directory `batch=<id>` written through
    * [[graft.io.GeoParquetIO.write]] — so every batch gets footer
    * metadata (CRS, per-file bbox) and an optional covering column, and a
    * RETRIED batch overwrites its own directory instead of appending
    * duplicates (foreachBatch's at-least-once becomes idempotent).
    * [[graft.io.GeoParquetIO.read]] on the root sees one dataset:
    * footers recurse, `batch` surfaces as a partition column, and `.cx`
    * file-prunes across all batches. Footer stamping per batch touches
    * ONLY that batch's files — cost stays proportional to the batch, not
    * the dataset.
    */
  def writeStreamGeoParquet(
      stream: DataFrame,
      path: String,
      checkpointLocation: String,
      geometryColumn: String = "geometry",
      crs: Option[String] = None,
      covering: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val g0 = graft.api.GeoDataFrame(batch, geometryColumn)
        val g = crs.map(g0.setCrs).getOrElse(g0)
        graft.io.GeoParquetIO.write(g, s"$path/batch=$batchId",
          mode = "overwrite", covering = covering)
      }
      .start()
  }
}
