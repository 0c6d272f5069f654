package graft.io

import graft.api.GeoDataFrame
import graft.geom.Envelope
import graft.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** GeoParquet-style IO (reference `dask_geopandas/io/parquet.py` +
  * `io/arrow.py:22-63`): geometry travels as WKB columns; dataset-level
  * metadata (primary geometry column, CRS, per-file bbox) lives in each
  * parquet file footer under the standard "geo" key, so files written here
  * interoperate with readers that understand GeoParquet metadata and —
  * more importantly at scale — bbox queries can skip whole files from the
  * footers alone, before any scan task is scheduled (the Spark analog of
  * the reference's gather_spatial_partitions + cx partition pruning,
  * `io/parquet.py:22-42` + `expr.py:1042-1052`).
  *
  * Write path (fully distributed — nothing data-sized touches the driver):
  *  1. normal Spark parquet write, optionally hive-partitioned
  *     (`partitionBy`, reference `partition_on` —
  *     `tests/io/test_parquet.py:186-215`);
  *  2. one distributed aggregation computes each written file's bbox
  *     (task-side, grouped by `input_file_name`);
  *  3. footer rewrites run as a Spark job over the file list — each task
  *     appends the "geo" footer entry via parquet-mr's appendFile (row
  *     groups byte-copied, no re-encode). The driver only lists file names.
  */
object GeoParquetIO {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Minimal serializable Hadoop-configuration carrier so footer-rewrite
    * tasks see the session's filesystem settings (credentials etc.).
    */
  private[graft] final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Scheme-independent path form used to key per-file bboxes
    * (`input_file_name` returns a URI, FileSystem listings a Path).
    */
  private def normPath(s: String): String = new Path(s).toUri.getPath

  /** Recursively list data files of a (possibly hive-partitioned) dataset. */
  private def listParquetFiles(conf: Configuration, root: Path): Seq[Path] = {
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val out = ArrayBuffer[Path]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
        !name.startsWith(".")) out += st.getPath
    }
    out.toSeq
  }

  // --------------------------------------------------------------- write
  /** `covering = true` writes the GeoParquet 1.1 "covering" bbox column
    * (`<geom>_bbox` struct of xmin/ymin/xmax/ymax) next to the geometry and
    * declares it in the footer. Readers then get ROW-GROUP-level pruning
    * from parquet's native column min/max stats — file-level footer bboxes
    * skip whole files, the covering column skips row groups inside the
    * files a query does touch, via plain Catalyst nested-field pushdown
    * (no geo-aware reader needed).
    */
  private val GeoArrowKinds = Set("point", "linestring", "polygon",
    "multipoint", "multilinestring", "multipolygon")

  /** `geometryEncoding`: "WKB" (default), a GeoParquet 1.1 native kind
    * ("point" … "multipolygon" — geometry stored as nested arrow lists of
    * coordinate structs instead of WKB blobs), or "geoarrow" to infer the
    * kind from the first geometry (single-type columns by spec; a
    * mismatched row fails the write loudly rather than corrupting the
    * column). Native-encoded datasets read straight back through [[read]],
    * which decodes to the engine's WKB representation at the scan edge.
    */
  def write(gdf: GeoDataFrame, path: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil, covering: Boolean = false,
      geometryEncoding: String = "WKB",
      // additional WKB geometry columns to declare in the footer (each
      // with its own CRS from its column metadata — geopandas frames carry
      // several geometry columns, tests/io/test_parquet.py:84-103)
      extraGeometry: Seq[String] = Nil): Unit = {
    val spark = gdf.df.sparkSession
    extraGeometry.foreach { c =>
      require(gdf.df.columns.contains(c) &&
        gdf.df.schema(c).dataType == org.apache.spark.sql.types.BinaryType,
        s"extraGeometry '$c' must be an existing WKB binary column")
    }
    val extraCrs: Seq[(String, Option[String])] =
      extraGeometry.map(c => (c, gdf.crsFor(c)))
    val geomKind: Option[String] = geometryEncoding.toLowerCase match {
      case "wkb" => None
      case "geoarrow" =>
        val t = gdf.df.select(st_geometryType(gdf.geom))
          .filter(col(gdf.geometryColumn).isNotNull).limit(1)
          .collect().headOption.map(_.getString(0))
        Some(t.getOrElse(throw new IllegalArgumentException(
          "geometryEncoding=geoarrow: cannot infer the kind of an all-null " +
            "geometry column — pass the kind explicitly")).toLowerCase)
      case k if GeoArrowKinds.contains(k) => Some(k)
      case other => throw new IllegalArgumentException(
        s"unknown geometryEncoding '$other' (WKB | geoarrow | ${GeoArrowKinds.mkString(" | ")})")
    }
    val coveringCol = if (covering) Some(gdf.geometryColumn + "_bbox") else None
    val outDf0 = coveringCol match {
      case Some(bc) => gdf.df.withColumn(bc, st_bounds(gdf.geom))
      case None     => gdf.df
    }
    val outDf = geomKind match {
      case Some(k) => outDf0.withColumn(gdf.geometryColumn,
        graft.sql.functions.st_toGeoArrow(k, col(gdf.geometryColumn)))
      case None => outDf0
    }
    val writer = outDf.write.mode(mode)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(path)

    // per-file bbox: one distributed aggregation over the written files
    val written = spark.read.parquet(path)
    val writtenGeom = geomKind match {
      case Some(k) => graft.sql.functions.st_fromGeoArrow(k, col(gdf.geometryColumn))
      case None    => col(gdf.geometryColumn)
    }
    val bboxes: Map[String, Envelope] = written
      .groupBy(input_file_name().as("file"))
      .agg(st_envelopeAgg(writtenGeom).as("b"))
      .select(col("file"), col("b.xmin"), col("b.ymin"), col("b.xmax"), col("b.ymax"))
      .collect()
      // a file whose geometries are all NULL aggregates to a null struct:
      // it simply gets no footer bbox (and readers then skip file pruning)
      .collect { case r if !r.isNullAt(1) =>
        (normPath(r.getString(0)),
          Envelope(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      }
      .toMap

    val conf = spark.sessionState.newHadoopConf()
    val files = listParquetFiles(conf, new Path(path))

    // footer rewrites are independent per file: run them as a Spark job so
    // a 100k-file dataset rewrites with full cluster parallelism (each task
    // is a byte-copy + footer append; the driver ships only file names)
    val work = files.map(p => (p.toString, bboxes.get(normPath(p.toString))))
    val sconf = new SerializableConf(conf)
    val geomCol = gdf.geometryColumn
    val crs = gdf.crs
    val slices = math.max(1, math.min(work.size, spark.sparkContext.defaultParallelism))
    val encName = geomKind.getOrElse("WKB")
    spark.sparkContext.parallelize(work, slices).foreach { case (file, bbox) =>
      addGeoFooter(sconf.value, new Path(file), geomCol, crs, bbox, coveringCol,
        encName, extraCrs)
    }
  }

  /** Rewrite one parquet file with the "geo" footer key added. Row groups
    * are byte-copied (appendFile), only the footer changes.
    */
  private def addGeoFooter(conf: Configuration, file: Path, geomCol: String,
      crs: Option[String], bbox: Option[Envelope],
      coveringCol: Option[String] = None, encoding: String = "WKB",
      extraCols: Seq[(String, Option[String])] = Nil): Unit = {
    val in = HadoopInputFile.fromPath(file, conf)
    val footer = ParquetFileReader.open(in)
    val schema = footer.getFooter.getFileMetaData.getSchema
    val existing = footer.getFooter.getFileMetaData.getKeyValueMetaData
    footer.close()

    val colMeta = mapper.createObjectNode()
    colMeta.put("encoding", encoding)
    crs.foreach(c => colMeta.put("crs", c))
    bbox.foreach { e =>
      val arr = colMeta.putArray("bbox")
      arr.add(e.minX); arr.add(e.minY); arr.add(e.maxX); arr.add(e.maxY)
    }
    // GeoParquet 1.1 covering declaration: each bound names [column, field]
    coveringCol.foreach { bc =>
      val paths = mapper.createObjectNode()
      Seq("xmin", "ymin", "xmax", "ymax").foreach { f =>
        val p = paths.putArray(f); p.add(bc); p.add(f)
      }
      val cov = mapper.createObjectNode()
      cov.set[com.fasterxml.jackson.databind.JsonNode]("bbox", paths)
      colMeta.set[com.fasterxml.jackson.databind.JsonNode]("covering", cov)
    }
    val geo = mapper.createObjectNode()
    geo.put("version",
      if (coveringCol.isDefined || encoding != "WKB") "1.1.0" else "1.0.0")
    geo.put("primary_column", geomCol)
    val colsNode = geo.putObject("columns")
    colsNode.set[com.fasterxml.jackson.databind.JsonNode](geomCol, colMeta)
    extraCols.foreach { case (name, ecrs) =>
      val em = mapper.createObjectNode()
      em.put("encoding", "WKB")
      ecrs.foreach(c => em.put("crs", c))
      colsNode.set[com.fasterxml.jackson.databind.JsonNode](name, em)
    }

    val meta = new java.util.HashMap[String, String](existing)
    meta.put("geo", mapper.writeValueAsString(geo))

    val tmp = new Path(file.getParent, "." + file.getName + ".geo.tmp")
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), schema, ParquetFileWriter.Mode.OVERWRITE,
      128L * 1024 * 1024, 8 * 1024 * 1024)
    writer.start()
    writer.appendFile(HadoopInputFile.fromPath(file, conf))
    writer.end(meta)

    val fs = file.getFileSystem(conf)
    // hadoop FS signals failure by RETURNING false: an unchecked rename
    // after a successful delete would silently lose the data file
    if (!fs.delete(file, false))
      throw new java.io.IOException(s"failed to delete $file for footer rewrite")
    if (!fs.rename(tmp, file))
      throw new java.io.IOException(
        s"failed to rename $tmp to $file — original deleted, data preserved at $tmp")
  }

  // ---------------------------------------------------------------- read
  final case class GeoFileMeta(primaryColumn: String, crs: Option[String],
      fileBBoxes: Map[String, Envelope], covering: Option[String] = None,
      // total data files in the dataset: fileBBoxes is only safe to PRUNE
      // with when it covers every file (a bbox-less file must never be
      // silently excluded from a re-planned scan)
      fileCount: Int = 0,
      encoding: String = "WKB",
      // non-primary geometry columns declared in the footer: (name, crs)
      extraColumns: Seq[(String, Option[String])] = Nil)

  /** Footer `crs` field → CRS string. The GeoParquet spec stores CRS as a
    * PROJJSON OBJECT (what real geopandas/pyarrow writers emit; a string
    * was only ever a pre-1.0 shortcut) — `asText()` on an object node
    * returns "" and silently dropped the CRS. Objects pass through as
    * their raw JSON text: column metadata keeps the verbatim PROJJSON and
    * `st_transform`/normCrs reduce it via `WktCrs.parseProjJson` at use
    * time.
    */
  private[io] def crsNodeToString(
      n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
    Option(n).filterNot(_.isNull).flatMap { node =>
      if (node.isTextual) Some(node.asText()).filter(_.nonEmpty)
      else if (node.isObject) Some(node.toString)
      else None
    }

  /** Parse one file's "geo" footer entry: (primary column, crs, bbox,
    * covering bbox-column name, geometry encoding).
    */
  private def footerGeo(conf: Configuration, p: Path):
      Option[(String, Option[String], Option[Envelope], Option[String], String,
        Seq[(String, Option[String])])] = {
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    val kv = try r.getFooter.getFileMetaData.getKeyValueMetaData finally r.close()
    Option(kv.get("geo")).map { json =>
      val node = mapper.readTree(json)
      val primary = node.get("primary_column").asText()
      val colNode = node.get("columns").get(primary)
      val crs = crsNodeToString(colNode.get("crs"))
      val bbox =
        if (colNode.has("bbox")) {
          val b = colNode.get("bbox")
          Some(Envelope(b.get(0).asDouble(), b.get(1).asDouble(),
            b.get(2).asDouble(), b.get(3).asDouble()))
        } else None
      // malformed/unknown covering forms degrade to None like every other
      // optional footer field — never fail the read over an optimization
      val covering =
        Option(colNode.get("covering")).map(_.get("bbox")).flatMap {
          case b if b != null && b.has("xmin") && b.get("xmin").isArray &&
            b.get("xmin").size() > 0 => Some(b.get("xmin").get(0).asText())
          case _ => None
        }
      val encoding =
        if (colNode.has("encoding") && !colNode.get("encoding").isNull)
          colNode.get("encoding").asText() else "WKB"
      val extras = {
        val it = node.get("columns").fieldNames()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
        while (it.hasNext) {
          val name = it.next()
          if (name != primary) {
            val cn = node.get("columns").get(name)
            out += ((name, crsNodeToString(cn.get("crs"))))
          }
        }
        out.toSeq
      }
      (primary, crs, bbox, covering, encoding, extras)
    }
  }

  /** Read the "geo" footer metadata of the dataset (recursing through hive
    * partition directories). Per-file bbox gathering runs as a Spark job over
    * the file list — at 100k files the driver ships file names only, never
    * blocks on serial footer I/O (the bottleneck the reference documents for
    * gather_spatial_partitions, `doc/source/parquet.md:14-16`).
    * `gatherBBoxes = false` opts out entirely (reference
    * `gather_spatial_partitions=False`, `io/parquet.py:72-82`): one footer
    * read gives the dataset-level metadata (primary column, CRS) and no
    * per-file bboxes are collected.
    */
  def readMeta(spark: SparkSession, path: String,
      gatherBBoxes: Boolean = true): Option[GeoFileMeta] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = listParquetFiles(conf, new Path(path))
    if (files.isEmpty) return None

    if (!gatherBBoxes || files.size == 1)
      footerGeo(conf, files.head).map { case (primary, crs, bbox, covering, enc, extras) =>
        GeoFileMeta(primary, crs,
          if (gatherBBoxes) bbox.map(files.head.toString -> _).toMap else Map.empty,
          covering, files.size, enc, extras)
      }
    else {
      val sconf = new SerializableConf(conf)
      val names = files.map(_.toString)
      val slices = math.max(1, math.min(names.size, spark.sparkContext.defaultParallelism))
      val metas = spark.sparkContext.parallelize(names, slices)
        .map(f => (f, footerGeo(sconf.value, new Path(f))))
        .collect()
      val geo = metas.collect { case (f, Some(t)) => (f, t) }
      if (geo.isEmpty) None
      else {
        val primary = geo.head._2._1
        val crs = geo.flatMap(_._2._2).headOption
        val bboxes = geo.collect { case (f, (_, _, Some(e), _, _, _)) => (f, e) }.toMap
        Some(GeoFileMeta(primary, crs, bboxes, geo.flatMap(_._2._4).headOption,
          files.size, geo.head._2._5, geo.head._2._6))
      }
    }
  }

  /** Read a GeoParquet dataset into a GeoDataFrame (geometry column stays
    * WKB binary — our native representation). CRS comes from the footer;
    * defaults to OGC:CRS84 when absent, like the reference
    * (`io/arrow.py:29`, tests/io/test_parquet.py:231-259).
    */
  def read(spark: SparkSession, path: String,
      gatherBBoxes: Boolean = true): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val meta = readMeta(spark, path, gatherBBoxes)
    val raw0 = spark.read.parquet(path)
    // stamp the geometry FIELD (relation-level schema, not a Project
    // above it) with its covering column's name: filters get pushed
    // beneath any Project, so SpatialFilterPushdown's covering rewrite
    // must find the metadata on the relation's own output attribute —
    // a .withMetadata Project would be invisible to the pushed filter
    val raw = meta.flatMap(m => m.covering.filter(raw0.columns.contains)
        .map((m.primaryColumn, _))) match {
      case Some((geomCol, cov)) =>
        val stamped = org.apache.spark.sql.types.StructType(raw0.schema.map { f =>
          if (f.name == geomCol)
            f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata).putString("graft.covering", cov).build())
          else f
        })
        spark.read.schema(stamped).parquet(path)
      case None => raw0
    }
    meta match {
      case Some(m) =>
        // native (geoarrow) encoding: decode the nested column back to WKB
        // at the scan edge — everything downstream sees the engine's
        // uniform representation
        val native = m.encoding != "WKB"
        val decode = (d: org.apache.spark.sql.DataFrame) =>
          if (native) d.withColumn(m.primaryColumn,
            graft.sql.functions.st_fromGeoArrow(m.encoding.toLowerCase, col(m.primaryColumn)))
          else d
        val df = decode(raw)
        val g0 = GeoDataFrame(df, m.primaryColumn).setCrs(m.crs.getOrElse("OGC:CRS84"))
        // non-primary footer geometry columns keep their own CRS, like
        // geopandas multi-geometry frames (tests/io/test_parquet.py:84-103)
        val g = m.extraColumns.foldLeft(g0) { case (acc, (name, ecrs)) =>
          if (acc.df.columns.contains(name) && ecrs.isDefined)
            acc.setCrsFor(name, ecrs.get)
          else acc
        }
          // a declared covering bbox column lets cx push plain nested-field
          // range predicates into the scan (row-group min/max skipping)
          .copy(coveringSource = m.covering.filter(df.columns.contains))
        // carry the footer bboxes on the wrapper: a subsequent cx prunes
        // whole files and sjoin gets grid bounds, both without another job.
        // ONLY when every file has a bbox — pruning from a partial map
        // would silently drop the bbox-less files from the re-planned scan.
        // Native-encoded datasets re-plan through the rebuild hook (the
        // on-disk schema differs from the in-plan WKB schema).
        if (m.fileBBoxes.nonEmpty && m.fileBBoxes.size == m.fileCount) {
          val rebuild =
            if (native) Some((keep: Seq[String]) => decode(
              spark.read.schema(raw.schema).option("basePath", path).parquet(keep: _*)))
            else None
          g.copy(fileSource =
            Some(graft.api.FileSourceMeta(path, m.fileBBoxes, g.df, rebuild)))
        } else g
      case None => GeoDataFrame(raw)
    }
  }

  /** Bbox-pruned read: drop whole files from the scan using only footer
    * bboxes — no task ever touches a pruned file. This is the 100 TB path:
    * after a spatialShuffle+write, a selective bbox query reads the few
    * files whose extent intersects it. Now sugar for `read(...).cx(...)`:
    * the read carries footer bboxes on the wrapper and `cx` re-plans the
    * scan over surviving files (`basePath` keeps hive partition columns).
    */
  def readPruned(spark: SparkSession, path: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): GeoDataFrame =
    read(spark, path).cx(xmin, ymin, xmax, ymax)
}
