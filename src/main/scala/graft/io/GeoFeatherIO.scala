package graft.io

import graft.api.GeoDataFrame
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

/** Feather (Arrow IPC file) IO — the reference's `read_feather`/`to_feather`
  * (`dask_geopandas/io/arrow.py:246-430`). Feather v2 IS the Arrow IPC file
  * format, and Spark ships arrow-java, so no extra dependency is needed.
  *
  * Layout mirrors the reference (`io/arrow.py:400`): one `part-NNNNN.arrow`
  * file per Spark partition, written task-side (the driver never sees data).
  * Geometry travels as a binary (WKB) column; the primary geometry column
  * and CRS ride in the Arrow schema's custom metadata under the same "geo"
  * JSON used by the parquet footer path, so feather files written here are
  * self-describing.
  *
  * Scale note: reads parallelize over files (one task per file — write with
  * enough partitions); batches stream through `ArrowFileReader`, so memory
  * per task is one record batch, not one file.
  */
object GeoFeatherIO {

  // arrow-memory-netty needs reflective access to java.nio internals on
  // JDK 17+; must be set before the allocator's static init
  System.setProperty("io.netty.tryReflectionSetAccessible", "true")

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType  => new ArrowType.Utf8
      case BinaryType  => new ArrowType.Binary
      case BooleanType => ArrowType.Bool.INSTANCE
      case other => throw new UnsupportedOperationException(
        s"feather write: unsupported column type $other for ${f.name}")
    }
    new Field(f.name, FieldType.nullable(t), null)
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8   => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Bool   => BooleanType
    case other => throw new UnsupportedOperationException(s"feather read: unsupported arrow type $other")
  }

  // --------------------------------------------------------------- write
  def write(gdf: GeoDataFrame, path: String, batchSize: Int = 4096): Unit = {
    val df = gdf.df
    val spark = df.sparkSession
    val schema = df.schema
    val geomCol = gdf.geometryColumn
    val crs = gdf.crs

    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)

    val colMeta = mapper.createObjectNode()
    colMeta.put("encoding", "WKB")
    crs.foreach(c => colMeta.put("crs", c))
    val geo = mapper.createObjectNode()
    geo.put("version", "1.0.0")
    geo.put("primary_column", geomCol)
    geo.putObject("columns").set[com.fasterxml.jackson.databind.JsonNode](geomCol, colMeta)
    val geoJson = mapper.writeValueAsString(geo)

    // arrow Field pojos are not Serializable: ship the Spark schema and
    // rebuild the arrow schema inside each task
    val serializableConfProps = conf.asScala.map(e => (e.getKey, e.getValue)).toArray
    val pathStr = path
    val sparkSchema = schema

    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val taskConf = new org.apache.hadoop.conf.Configuration(false)
      serializableConfProps.foreach { case (k, v) => taskConf.set(k, v) }
      val file = new Path(pathStr, f"part-$pid%05d.arrow")
      val tfs = file.getFileSystem(taskConf)
      val allocator = new RootAllocator()
      val fields = sparkSchema.fields.map(arrowField).toSeq
      val arrowSchema = new Schema(fields.asJava, Map("geo" -> geoJson).asJava)
      val vroot = VectorSchemaRoot.create(arrowSchema, allocator)
      val out = tfs.create(file, true)
      val writer = new ArrowFileWriter(vroot, null, Channels.newChannel(out))
      try {
        writer.start()
        val vectors = vroot.getFieldVectors.asScala.toArray
        var n = 0
        def flush(): Unit = {
          if (n > 0) { vroot.setRowCount(n); writer.writeBatch(); n = 0 }
          vectors.foreach(_.reset())
        }
        it.foreach { row =>
          var c = 0
          while (c < vectors.length) {
            val v = row.get(c)
            vectors(c) match {
              case vec: BigIntVector =>
                if (v == null) vec.setNull(n) else vec.setSafe(n, v.asInstanceOf[Long])
              case vec: IntVector =>
                if (v == null) vec.setNull(n) else vec.setSafe(n, v.asInstanceOf[Int])
              case vec: Float8Vector =>
                if (v == null) vec.setNull(n) else vec.setSafe(n, v.asInstanceOf[Double])
              case vec: Float4Vector =>
                if (v == null) vec.setNull(n) else vec.setSafe(n, v.asInstanceOf[Float])
              case vec: VarCharVector =>
                if (v == null) vec.setNull(n)
                else vec.setSafe(n, v.asInstanceOf[String].getBytes("UTF-8"))
              case vec: VarBinaryVector =>
                if (v == null) vec.setNull(n) else vec.setSafe(n, v.asInstanceOf[Array[Byte]])
              case vec: BitVector =>
                if (v == null) vec.setNull(n)
                else vec.setSafe(n, if (v.asInstanceOf[Boolean]) 1 else 0)
              case other => throw new IllegalStateException(s"unhandled vector $other")
            }
            c += 1
          }
          n += 1
          if (n >= batchSize) flush()
        }
        flush()
        writer.end()
      } finally {
        writer.close(); out.close(); vroot.close(); allocator.close()
      }
      Iterator.single(file.toString)
    }.collect()
  }

  // ---------------------------------------------------------------- read
  private def listArrowFiles(conf: org.apache.hadoop.conf.Configuration,
      root: Path): Seq[Path] = {
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".arrow") && !p.getName.startsWith("."))
      .sortBy(_.getName)
  }

  /** Load a whole arrow file into memory as a seekable channel (feather's
    * columnar layout needs random access; files are partition-sized).
    */
  private def openChannel(conf: org.apache.hadoop.conf.Configuration,
      p: Path): org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel = {
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bytes)
  }

  def read(spark: SparkSession, path: String): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val conf = spark.sessionState.newHadoopConf()
    val files = listArrowFiles(conf, new Path(path))
    require(files.nonEmpty, s"no .arrow files under $path")

    // schema + geo metadata from the first file's footer (driver-side, tiny)
    val (sparkSchema, geoMeta): (StructType, Option[String]) = {
      val allocator = new RootAllocator()
      val reader = new ArrowFileReader(openChannel(conf, files.head), allocator)
      try {
        val s = reader.getVectorSchemaRoot.getSchema
        val struct = StructType(s.getFields.asScala.toSeq.map(f =>
          StructField(f.getName, sparkType(f), nullable = true)))
        (struct, Option(s.getCustomMetadata.get("geo")))
      } finally { reader.close(); allocator.close() }
    }

    val serializableConfProps = conf.asScala.map(e => (e.getKey, e.getValue)).toArray
    val fileNames = files.map(_.toString)
    val nFields = sparkSchema.length
    val rows = spark.sparkContext.parallelize(fileNames, fileNames.length).flatMap { f =>
      val taskConf = new org.apache.hadoop.conf.Configuration(false)
      serializableConfProps.foreach { case (k, v) => taskConf.set(k, v) }
      val p = new Path(f)
      val allocator = new RootAllocator()
      val reader = new ArrowFileReader(openChannel(taskConf, p), allocator)
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      try {
        val vroot = reader.getVectorSchemaRoot
        while (reader.loadNextBatch()) {
          val vectors = vroot.getFieldVectors.asScala.toArray
          var r = 0
          val rc = vroot.getRowCount
          while (r < rc) {
            val vals = new Array[Any](nFields)
            var c = 0
            while (c < nFields) {
              vals(c) = vectors(c).getObject(r) match {
                case null                              => null
                case t: org.apache.arrow.vector.util.Text => t.toString
                case other                             => other
              }
              c += 1
            }
            out += Row.fromSeq(vals.toIndexedSeq)
            r += 1
          }
        }
      } finally { reader.close(); allocator.close() }
      out.iterator
    }
    val df: DataFrame = spark.createDataFrame(rows, sparkSchema)
    geoMeta match {
      case Some(json) =>
        val node = mapper.readTree(json)
        val primary = node.get("primary_column").asText()
        val colNode = node.get("columns").get(primary)
        val crs = if (colNode.has("crs") && !colNode.get("crs").isNull)
          Some(colNode.get("crs").asText()) else None
        GeoDataFrame(df, primary).setCrs(crs.getOrElse("OGC:CRS84"))
      case None => GeoDataFrame(df)
    }
  }
}
