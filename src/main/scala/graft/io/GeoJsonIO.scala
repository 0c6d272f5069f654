package graft.io

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON IO (OGR's "GeoJSONSeq" and "GeoJSON" drivers in the reference's
  * read_file surface, `io/file.py:49-149`).
  *
  * Two layouts:
  *   - `readSeq`/`writeSeq`: newline-delimited features (GeoJSONSeq). One
  *     Feature object per line, so the scan is a plain splittable
  *     distributed text read — the scale-right variant for big single files.
  *   - `read`/`write`: RFC 7946 FeatureCollection documents (the common
  *     `.geojson` interchange file). A FeatureCollection is ONE JSON tree —
  *     inherently non-splittable — so, like KML, scale comes from FILE
  *     parallelism: `write` emits one `part-NNNNN.geojson` per partition
  *     task-side and `read` schedules one task per file.
  *
  * Read: geometry parses to WKB; feature properties come back as one JSON
  * string column — apply `from_json` with a schema or `get_json_object` to
  * extract fields (properties are schemaless in GeoJSON, so the engine does
  * not guess column types).
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

  // --------------------------------------------- FeatureCollection documents

  /** Read FeatureCollection document(s): a single `.geojson` file or a
    * directory of them, one task per file. Also accepts a bare Feature or a
    * bare geometry as the document root (both legal inputs to OGR's GeoJSON
    * driver).
    */
  def read(
      spark: SparkSession,
      path: String,
      geometryColumn: String = "geometry",
      propertiesColumn: String = "properties"): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".geojson")).map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .geojson files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        try parseDocument(in) finally in.close()
      }
    val schema = StructType(Seq(
      StructField(geometryColumn, BinaryType),
      StructField(propertiesColumn, StringType)))
    GeoDataFrame(spark.createDataFrame(rows, schema), geometryColumn)
      .setCrs("OGC:CRS84")
  }

  private def parseDocument(in: java.io.InputStream): Seq[Row] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.readTree(in)
    require(doc != null && doc.has("type"), "geojson: document has no type")
    def featureRow(f: com.fasterxml.jackson.databind.JsonNode): Row = {
      val gNode = f.get("geometry")
      val wkb =
        if (gNode == null || gNode.isNull) null
        else graft.geom.Wkb.write(graft.geom.GeoJson.readNode(gNode))
      val pNode = f.get("properties")
      val props =
        if (pNode == null || pNode.isNull) null
        else mapper.writeValueAsString(pNode)
      Row(wkb, props)
    }
    doc.get("type").asText() match {
      case "FeatureCollection" =>
        val feats = doc.get("features")
        if (feats == null || !feats.isArray) Seq.empty
        else {
          val b = Seq.newBuilder[Row]
          val it = feats.elements()
          while (it.hasNext) b += featureRow(it.next())
          b.result()
        }
      case "Feature" => Seq(featureRow(doc))
      case _ => // bare geometry document
        Seq(Row(graft.geom.Wkb.write(graft.geom.GeoJson.readNode(doc)), null))
    }
  }

  /** Write one FeatureCollection per partition (`part-NNNNN.geojson`),
    * task-side. Non-geometry columns become typed JSON properties via
    * Spark's `to_json` (numbers stay numbers); null attributes are omitted
    * per row, an all-null row gets `"properties": {}`.
    */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val df = gdf.df
    val propCols = df.columns.filter(_ != gdf.geometryColumn)
    val props =
      if (propCols.isEmpty) lit("{}")
      else to_json(struct(propCols.map(df(_)): _*))
    val features = df.select(concat(
      lit("""{"type":"Feature","geometry":"""),
      coalesce(st_asGeoJson(df(gdf.geometryColumn)), lit("null")),
      lit(""","properties":"""), coalesce(props, lit("{}")),
      lit("}")).as("feature"))
    val conf = new GeoParquetIO.SerializableConf(df.sparkSession.sessionState.newHadoopConf())
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    fs.delete(root, true)
    fs.mkdirs(root)
    val pathStr = path
    features.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(f"$pathStr%s/part-$pid%05d.geojson")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p) { os =>
          val w = new java.io.OutputStreamWriter(
            new java.io.BufferedOutputStream(os, 1 << 20), "UTF-8")
          w.write("""{"type":"FeatureCollection","features":[""")
          var first = true
          it.foreach { row =>
            if (!first) w.write(",")
            w.write("\n")
            w.write(row.getString(0))
            first = false
          }
          w.write("\n]}\n")
          w.flush()
        }
      }
    }
  }
}
