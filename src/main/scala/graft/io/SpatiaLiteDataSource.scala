package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for SpatiaLite feature tables — the fifth
  * connector, sharing the GeoPackage SQLite scan machinery
  * ([[GpkgPartition]]/[[GpkgReaderFactory]] with the SpatiaLite geometry
  * dialect) the same way [[SpatiaLiteIO]] shares the RDD path:
  *
  * {{{
  *   spark.read.format("spatialite")
  *     .option("table", "roads")
  *     .option("bbox", "x0,y0,x1,y1")   // optional: idx_ R*-tree pruned
  *     .load("/data/file.sqlite")
  * }}}
  *
  * Partitioning mirrors `GeoPackageIO.readFeatureTable`: subtree-grouped
  * b-tree walks, or sorted rowid point-lookups from the
  * `idx_<table>_<geom>_node` R*-tree under a `bbox`, with the exact
  * envelope residual task-side. COUNT(*) is never metadata-answered
  * (SpatiaLite keeps no maintained feature-count table).
  */
class SpatiaLiteDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spatialite"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoPackageDataSource.schemaFor(
      GeoPackageDataSource.pathOf(options), SpatiaLiteDataSource.tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SlTable(schema, properties)
}

object SpatiaLiteDataSource {
  def tableOf(options: java.util.Map[String, String]): String = {
    val t = options.get("table")
    require(t != null && t.nonEmpty, "spatialite: the 'table' option is required")
    t
  }

  private[graft] def geomColFor(path: String, table: String): Option[String] =
    try {
      SpatiaLiteIO.geometryColumns(SparkSession.active, path)
        .get(table).map(_._1)
    } catch { case _: Exception => None }
}

private[graft] class SlTable(tableSchema: StructType,
    props: java.util.Map[String, String]) extends Table with SupportsRead {
  private[graft] def graftGeomCol: Option[String] =
    SpatiaLiteDataSource.geomColFor(
      GeoPackageDataSource.pathOf(props), SpatiaLiteDataSource.tableOf(props))
  override def name(): String =
    "spatialite:" + GeoPackageDataSource.pathOf(props) + "#" +
      SpatiaLiteDataSource.tableOf(props)
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](props)
    merged.putAll(options)
    new SlScanBuilder(tableSchema, merged)
  }
}

private[graft] class SlScanBuilder(fullSchema: StructType,
    options: java.util.Map[String, String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SlScan(fullSchema, required, options)
}

private[graft] class SlScan(fullSchema: StructType, required: StructType,
    options: java.util.Map[String, String]) extends Scan with Batch {

  private val path = GeoPackageDataSource.pathOf(options)
  private val table = SpatiaLiteDataSource.tableOf(options)
  private val bbox = GeoPackageDataSource.bboxOf(options)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"spatialite $path#$table" + bbox.map(b => s" bbox=$b").getOrElse("")

  private[graft] lazy val graftGeomCol: Option[String] =
    SpatiaLiteDataSource.geomColFor(path, table)
  private[graft] def graftBbox: Option[(Double, Double, Double, Double)] = bbox
  private[graft] def graftWithBbox(b: String): Scan = {
    val m = new java.util.HashMap[String, String](options)
    m.put("bbox", b)
    new SlScan(fullSchema, required, m)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val src = GeoPackageIO.openSource(spark.sessionState.newHadoopConf(), path)
    try {
      val master = GeoPackageIO.readMaster(src)
      val m = master.find(_.name == table).getOrElse(
        throw new IllegalArgumentException(
          s"no table '$table' in $path (tables: ${master.map(_.name).mkString(", ")})"))
      require(m.rootPage > 0, s"table '$table' is virtual — not readable")
      val geomCol = graftGeomCol
      val candidates: Option[Array[Long]] = (bbox, geomCol) match {
        case (Some((qx0, qy0, qx1, qy1)), Some(g)) =>
          master.find(mm => mm.name == s"idx_${table}_${g}_node" && mm.rootPage > 0)
            .map(node => GeoPackageIO.rtreeCandidates(src, node.rootPage,
              qx0, qy0, qx1, qy1).sorted)
        case _ => None
      }
      candidates match {
        case Some(ids) if ids.isEmpty => Array.empty
        case Some(ids) =>
          val par = math.max(1, spark.sparkContext.defaultParallelism)
          val chunkSize = math.max(256, ids.length / par)
          ids.grouped(chunkSize)
            .map(chunk => GpkgPartition(m.rootPage, chunk, null): InputPartition)
            .toArray
        case None =>
          GeoPackageIO.groupedSubtreeRoots(src, m.rootPage, 0,
              target = spark.sparkContext.defaultParallelism * 4)
            .map(g => GpkgPartition(m.rootPage, null, g.toArray): InputPartition)
            .toArray
      }
    } finally src.close()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val src = GeoPackageIO.openSource(spark.sessionState.newHadoopConf(), path)
    val (colArr, geomIdx) = try {
      val master = GeoPackageIO.readMaster(src)
      val m = master.find(_.name == table).get
      val cols = GeoPackageIO.parseColumns(m.sql).toArray
      (cols, graftGeomCol.map(g => cols.indexWhere(_.name == g)).getOrElse(-1))
    } finally src.close()
    val reorder = required.fields.map(f => fullSchema.fieldIndex(f.name))
    GpkgReaderFactory(
      new GeoParquetIO.SerializableConf(spark.sessionState.newHadoopConf()),
      path, table, colArr, geomIdx, bbox, reorder, required,
      geomDialect = "spatialite")
  }
}
