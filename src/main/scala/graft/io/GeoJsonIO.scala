package graft.io

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Newline-delimited GeoJSON feature IO (OGR's "GeoJSONSeq" driver in the
  * reference's read_file surface, `io/file.py:49-149`). One Feature object
  * per line, so the scan is a plain splittable distributed text read — the
  * scale-right GeoJSON variant (a single FeatureCollection document is not
  * splittable and is deliberately not implemented).
  *
  * Read: geometry parses via `st_geomfromgeojson`; feature properties come
  * back as one JSON string column — apply `from_json` with a schema or
  * `get_json_object` to extract fields (properties are schemaless in
  * GeoJSON, so the engine does not guess column types).
  * Write: each row becomes `{"type":"Feature","geometry":...,
  * "properties":{non-geometry columns}}`.
  * Coordinates are CRS84 by RFC 7946 — reads attach that CRS.
  */
object GeoJsonIO {

  def readSeq(
      spark: SparkSession,
      path: String,
      geometryColumn: String = "geometry",
      propertiesColumn: String = "properties"): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val df = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        st_geomFromGeoJson(get_json_object(col("value"), "$.geometry")).as(geometryColumn),
        get_json_object(col("value"), "$.properties").as(propertiesColumn))
    GeoDataFrame(df, geometryColumn).setCrs("OGC:CRS84")
  }

  def writeSeq(gdf: GeoDataFrame, path: String, mode: String = "overwrite"): Unit = {
    val df = gdf.df
    val propCols = df.columns.filter(_ != gdf.geometryColumn)
    val props =
      if (propCols.isEmpty) lit("{}")
      else to_json(struct(propCols.map(df(_)): _*))
    df.select(concat(
        lit("""{"type":"Feature","geometry":"""),
        // a null geometry is a legal RFC 7946 feature ("geometry": null);
        // without the coalesce, concat null-propagates and the whole row
        // degenerates to an empty line that read-back silently drops
        coalesce(st_asGeoJson(df(gdf.geometryColumn)), lit("null")),
        lit(""","properties":"""), props,
        lit("}")).as("value"))
      .write.mode(mode).text(path)
  }
}
