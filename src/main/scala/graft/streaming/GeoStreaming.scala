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

    val typed = events.select(col(keyCol).cast("string"), col(tsCol).cast("timestamp"),
        col(xCol).cast("double"), col(yCol).cast("double"))
      .as[(String, java.sql.Timestamp, Double, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, java.sql.Timestamp, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[Array[Long]]) =>
          val fns = fencesB.value.map { case (id, wkb) => (id, graft.geom.Wkb.read(wkb)) }
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
}
