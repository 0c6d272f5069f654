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
}
