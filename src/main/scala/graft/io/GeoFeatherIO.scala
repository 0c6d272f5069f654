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

  private[io] val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[io] def arrowField(f: StructField): Field = {
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

  private def isDoublePairList(f: Field): Boolean = f.getType match {
    case l: ArrowType.FixedSizeList => l.getListSize == 2 &&
      f.getChildren.size() == 1 && (f.getChildren.get(0).getType match {
        case fp: ArrowType.FloatingPoint =>
          fp.getPrecision == FloatingPointPrecision.DOUBLE
        case _ => false
      })
    case _ => false
  }

  private[io] def sparkType(f: Field, declaredEnc: Option[String]): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8   => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Bool   => BooleanType
    // GeoArrow interleaved point coordinates (FixedSizeList<double>[2]):
    // surfaces as WKB binary — the encoding is an interchange representation,
    // downstream operators always see WKB. Gated on BOTH the Float8 child
    // AND the column being declared a geometry column in the file's geo
    // metadata: a non-geometry double pair (e.g. a [min,max] stats column
    // written by another Arrow tool) surfaces as array<double>, not as
    // silently-corrupted point blobs.
    case _: ArrowType.FixedSizeList if isDoublePairList(f) =>
      if (declaredEnc.exists(_.startsWith("geoarrow"))) BinaryType else ArrayType(DoubleType)
    // nested GeoArrow (linestring/polygon/multi*): List wrappers around the
    // coordinate pair — only a DECLARED geometry column maps to WKB; list
    // columns from other Arrow writers stay unsupported-loudly as before
    case _: ArrowType.List if declaredEnc.exists(_.startsWith("geoarrow")) => BinaryType
    case other => throw new UnsupportedOperationException(s"feather read: unsupported arrow type $other")
  }

  // ----------------------------------------------- GeoArrow nested layouts

  /** List nesting depth above the interleaved coordinate pair per GeoArrow
    * encoding (geoarrow.org/format): point 0, linestring/multipoint 1,
    * polygon/multilinestring 2, multipolygon 3.
    */
  private[io] def geoarrowDepth(encoding: String): Int = encoding match {
    case "geoarrow.point" => 0
    case "geoarrow.linestring" | "geoarrow.multipoint" => 1
    case "geoarrow.polygon" | "geoarrow.multilinestring" => 2
    case "geoarrow.multipolygon" => 3
    case other => throw new IllegalArgumentException(s"unknown GeoArrow encoding $other")
  }

  private[io] def geoarrowEncodingOf(g: graft.geom.Geometry): String = g match {
    case _: graft.geom.Point => "geoarrow.point"
    case _: graft.geom.LineString => "geoarrow.linestring"
    case _: graft.geom.MultiPoint => "geoarrow.multipoint"
    case _: graft.geom.Polygon => "geoarrow.polygon"
    case _: graft.geom.MultiLineString => "geoarrow.multilinestring"
    case _: graft.geom.MultiPolygon => "geoarrow.multipolygon"
    case other => throw new IllegalArgumentException(
      s"no GeoArrow encoding for ${other.geometryType}")
  }

  /** The Arrow field for a GeoArrow geometry column: `depth` List wrappers
    * around FixedSizeList<double>[2] ("xy", interleaved).
    */
  private[io] def geoarrowField(name: String, depth: Int): Field = {
    val coord = new Field("xy", FieldType.notNullable(
      new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null)
    // conventional geoarrow child names, inside out: vertices | rings | polygons
    val wrapperNames = Seq("rings", "polygons")
    var f = new Field(
      if (depth == 0) name else "vertices",
      FieldType.nullable(new ArrowType.FixedSizeList(2)), Seq(coord).asJava)
    var d = 0
    while (d < depth) {
      val outerName =
        if (d == depth - 1) name
        else wrapperNames(d) // d=0 wraps vertices into rings, d=1 rings into polygons
      f = new Field(outerName, FieldType.nullable(new ArrowType.List()),
        Seq(f).asJava)
      d += 1
    }
    f
  }

  /** Geometry as nested flat-xy rings matching a GeoArrow depth:
    * depth 1 -> Seq(flatXy); depth 2 -> Seq(rings); depth 3 -> Seq(polys).
    */
  private def geomParts(g: graft.geom.Geometry, encoding: String): Seq[Seq[Array[Double]]] =
    (g, encoding) match {
      case (l: graft.geom.LineString, "geoarrow.linestring") => Seq(Seq(l.xy))
      case (mp: graft.geom.MultiPoint, "geoarrow.multipoint") =>
        Seq(Seq(mp.pts.flatMap(p => Array(p.x, p.y)).toArray))
      case (p: graft.geom.Polygon, "geoarrow.polygon") => Seq(p.rings.toSeq)
      case (ml: graft.geom.MultiLineString, "geoarrow.multilinestring") =>
        Seq(ml.lines.toSeq.map(_.xy))
      case (mpg: graft.geom.MultiPolygon, "geoarrow.multipolygon") =>
        mpg.polys.toSeq.map(_.rings.toSeq)
      case _ => throw new IllegalArgumentException(
        s"feather encoding=$encoding requires uniform geometry " +
          s"(GeoArrow single-type rule), found ${g.geometryType}")
    }

  /** Write interleaved pairs from flat xy into a FixedSizeList at `start`. */
  private def writePairs(fsl: org.apache.arrow.vector.complex.FixedSizeListVector,
      start: Int, xy: Array[Double]): Int = {
    val inner = fsl.getDataVector.asInstanceOf[Float8Vector]
    val k = xy.length / 2
    var j = 0
    while (j < k) {
      fsl.setNotNull(start + j)
      inner.setSafe((start + j) * 2, xy(2 * j))
      inner.setSafe((start + j) * 2 + 1, xy(2 * j + 1))
      j += 1
    }
    k
  }

  /** Write one geometry into a (possibly nested) GeoArrow vector at row `n`.
    * Offsets stay consistent because rows are written strictly in order —
    * each `startNewValue` continues where the previous row's `endValue`
    * left off.
    */
  private[io] def writeGeoArrowCell(vec: FieldVector, n: Int, g: graft.geom.Geometry,
      encoding: String): Unit = {
    import org.apache.arrow.vector.complex.{FixedSizeListVector, ListVector}
    (geoarrowDepth(encoding), vec) match {
      case (0, fsl: FixedSizeListVector) =>
        g match {
          case p: graft.geom.Point =>
            fsl.setNotNull(n)
            val inner = fsl.getDataVector.asInstanceOf[Float8Vector]
            inner.setSafe(n * 2, p.x)
            inner.setSafe(n * 2 + 1, p.y)
          case other => throw new IllegalArgumentException(
            "feather encoding=geoarrow.point supports POINT geometry only " +
              s"(GeoArrow single-type rule), found ${other.geometryType}")
        }
      case (1, lv: ListVector) =>
        val xy = geomParts(g, encoding).head.head
        val s = lv.startNewValue(n)
        val k = writePairs(lv.getDataVector.asInstanceOf[FixedSizeListVector], s, xy)
        lv.endValue(n, k)
      case (2, lv: ListVector) =>
        val rings = geomParts(g, encoding).head
        val inner = lv.getDataVector.asInstanceOf[ListVector]
        val rs = lv.startNewValue(n)
        var i = 0
        while (i < rings.length) {
          val vs = inner.startNewValue(rs + i)
          val k = writePairs(inner.getDataVector.asInstanceOf[FixedSizeListVector], vs, rings(i))
          inner.endValue(rs + i, k)
          i += 1
        }
        lv.endValue(n, rings.length)
      case (3, lv: ListVector) =>
        val polys = geomParts(g, encoding)
        val ringsVec = lv.getDataVector.asInstanceOf[ListVector]
        val vertsVec = ringsVec.getDataVector.asInstanceOf[ListVector]
        val ps = lv.startNewValue(n)
        var i = 0
        while (i < polys.length) {
          val rings = polys(i)
          val rs = ringsVec.startNewValue(ps + i)
          var r = 0
          while (r < rings.length) {
            val vs = vertsVec.startNewValue(rs + r)
            val k = writePairs(vertsVec.getDataVector.asInstanceOf[FixedSizeListVector], vs, rings(r))
            vertsVec.endValue(rs + r, k)
            r += 1
          }
          ringsVec.endValue(ps + i, rings.length)
          i += 1
        }
        lv.endValue(n, polys.length)
      case (d, v) => throw new IllegalStateException(
        s"GeoArrow depth $d does not match vector ${v.getClass.getSimpleName}")
    }
  }

  /** A decoded Arrow cell as a WKB value: pass binary through, rebuild
    * geometry from (possibly nested) GeoArrow coordinate lists per the
    * column's declared encoding.
    */
  private[io] def cellToWkb(v: Any, encoding: String): Array[Byte] = {
    def pairs(l: java.util.List[_]): Array[Double] = {
      val out = new Array[Double](l.size * 2)
      var i = 0
      while (i < l.size) {
        val p = l.get(i).asInstanceOf[java.util.List[_]]
        out(2 * i) = p.get(0).asInstanceOf[Number].doubleValue()
        out(2 * i + 1) = p.get(1).asInstanceOf[Number].doubleValue()
        i += 1
      }
      out
    }
    def rings(l: java.util.List[_]): Array[Array[Double]] =
      Array.tabulate(l.size)(i => pairs(l.get(i).asInstanceOf[java.util.List[_]]))
    v match {
      case null => null
      case b: Array[Byte] => b
      case l: java.util.List[_] => graft.geom.Wkb.write(encoding match {
        case "geoarrow.point" => graft.geom.Point(
          l.get(0).asInstanceOf[Number].doubleValue(),
          l.get(1).asInstanceOf[Number].doubleValue())
        case "geoarrow.linestring" => graft.geom.LineString(pairs(l))
        case "geoarrow.multipoint" =>
          val xy = pairs(l)
          graft.geom.MultiPoint(Array.tabulate(xy.length / 2)(i =>
            graft.geom.Point(xy(2 * i), xy(2 * i + 1))))
        case "geoarrow.polygon" => graft.geom.Polygon(rings(l))
        case "geoarrow.multilinestring" =>
          graft.geom.MultiLineString(rings(l).map(graft.geom.LineString(_)))
        case "geoarrow.multipolygon" =>
          graft.geom.MultiPolygon(Array.tabulate(l.size)(i =>
            graft.geom.Polygon(rings(l.get(i).asInstanceOf[java.util.List[_]]))))
        case other => throw new IllegalStateException(
          s"list cell in a non-GeoArrow column (encoding $other)")
      })
      case other => throw new IllegalStateException(s"not a geometry cell: $other")
    }
  }

  /** Envelope of a decoded GeoArrow cell (any nesting) without building
    * the geometry — bbox filtering never materializes discarded rows.
    */
  private def cellEnvelope(l: java.util.List[_]): graft.geom.Envelope = {
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    def walk(x: Any): Unit = x match {
      case ll: java.util.List[_] if ll.size == 2 &&
          ll.get(0).isInstanceOf[Number] && !ll.get(0).isInstanceOf[java.util.List[_]] =>
        val px = ll.get(0).asInstanceOf[Number].doubleValue()
        val py = ll.get(1).asInstanceOf[Number].doubleValue()
        minX = math.min(minX, px); maxX = math.max(maxX, px)
        minY = math.min(minY, py); maxY = math.max(maxY, py)
      case ll: java.util.List[_] =>
        var i = 0
        while (i < ll.size) { walk(ll.get(i)); i += 1 }
      case _ =>
    }
    walk(l)
    graft.geom.Envelope(minX, minY, maxX, maxY)
  }

  // --------------------------------------------------------------- write
  /** `encoding`: "WKB" (default) or "geoarrow" — the GeoArrow native
    * layouts (geoarrow.org/format; reference offers WKB or GeoArrow in the
    * interchange, `backends.py:81-92`): interleaved `FixedSizeList<double>[2]`
    * coordinates with one List wrapper per nesting level
    * (point / linestring / polygon / multipoint / multilinestring /
    * multipolygon — the concrete layout follows the data's geometry type,
    * sampled from the first row). GeoArrow files are zero-copy-readable by
    * Arrow-native tools. One encoding per column (the GeoArrow single-type
    * rule): a row of any other type fails loudly. GeometryCollection has no
    * GeoArrow layout — use WKB. Readers accept all encodings side by side
    * in one dataset directory.
    */
  /** Write one scalar (non-GeoArrow) value into an arrow vector — shared
    * by the feather file writer and the in-memory interchange writer.
    */
  private[io] def setScalarCell(vec: FieldVector, n: Int, v: Any): Unit = vec match {
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

  def write(gdf: GeoDataFrame, path: String, batchSize: Int = 4096,
      encoding: String = "WKB"): Unit = {
    require(Set("WKB", "geoarrow").contains(encoding),
      s"unknown feather geometry encoding '$encoding' (WKB | geoarrow)")
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

    // GeoArrow layout follows the data's (single) geometry type, sampled
    // from the first non-null row; tasks enforce the single-type rule on
    // every row (geoarrow.org/format: one encoding per column)
    val geoarrowEnc: String =
      if (encoding != "geoarrow") "WKB"
      else df.select(org.apache.spark.sql.functions.col(geomCol))
        .filter(org.apache.spark.sql.functions.col(geomCol).isNotNull)
        .limit(1).collect().headOption
        .map(r => geoarrowEncodingOf(graft.geom.Wkb.read(r.getAs[Array[Byte]](0))))
        .getOrElse("geoarrow.point")

    val colMeta = mapper.createObjectNode()
    colMeta.put("encoding", if (encoding == "geoarrow") geoarrowEnc else "WKB")
    crs.foreach(c => colMeta.put("crs", c))
    val geo = mapper.createObjectNode()
    geo.put("version", "1.0.0")
    geo.put("primary_column", geomCol)
    geo.putObject("columns").set[com.fasterxml.jackson.databind.JsonNode](geomCol, colMeta)
    val geoJson = mapper.writeValueAsString(geo)

    // arrow Field pojos are not Serializable: ship the Spark schema and
    // rebuild the arrow schema inside each task
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val pathStr = path
    val sparkSchema = schema
    val useGeoArrow = encoding == "geoarrow"
    val taskEnc = geoarrowEnc
    val geomName = geomCol

    val geomIdx = schema.fieldIndex(geomCol)
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val taskConf = sconf.value
      val file = new Path(pathStr, f"part-$pid%05d.arrow")
      val tfs = file.getFileSystem(taskConf)
      val allocator = new RootAllocator()
      val fields = sparkSchema.fields.map { f =>
        if (useGeoArrow && f.name == geomName)
          geoarrowField(f.name, geoarrowDepth(taskEnc))
        else arrowField(f)
      }.toSeq
      val arrowSchema = new Schema(fields.asJava, Map("geo" -> geoJson).asJava)
      val vroot = VectorSchemaRoot.create(arrowSchema, allocator)
      AtomicTaskFile.withOutput(tfs, file) { out =>
      // footer custom metadata: the map is serialized at end(), so the
      // per-file bbox accumulated while writing can be added just before —
      // that's what lets reads prune whole files from footers alone
      val footerMeta = new java.util.HashMap[String, String]()
      val writer = new ArrowFileWriter(vroot, null, Channels.newChannel(out), footerMeta)
      var fileEnv = graft.geom.Envelope.empty
      try {
        writer.start()
        val vectors = vroot.getFieldVectors.asScala.toArray
        var n = 0
        def flush(): Unit = {
          if (n > 0) { vroot.setRowCount(n); writer.writeBatch(); n = 0 }
          vectors.foreach(_.reset())
        }
        it.foreach { row =>
          val gv = row.get(geomIdx)
          if (gv != null)
            fileEnv = fileEnv.union(graft.geom.Wkb.envelopeOf(gv.asInstanceOf[Array[Byte]]))
          var c = 0
          while (c < vectors.length) {
            val v = row.get(c)
            if (useGeoArrow && c == geomIdx) {
              if (v == null) vectors(c).asInstanceOf[FieldVector] match {
                case fsl: org.apache.arrow.vector.complex.FixedSizeListVector => fsl.setNull(n)
                case lv: org.apache.arrow.vector.complex.ListVector => lv.setNull(n)
                case other => throw new IllegalStateException(s"unhandled vector $other")
              }
              else writeGeoArrowCell(vectors(c), n,
                graft.geom.Wkb.read(v.asInstanceOf[Array[Byte]]), taskEnc)
            } else setScalarCell(vectors(c), n, v)
            c += 1
          }
          n += 1
          if (n >= batchSize) flush()
        }
        flush()
        if (!fileEnv.isEmpty)
          footerMeta.put("geo_bbox",
            s"${fileEnv.minX},${fileEnv.minY},${fileEnv.maxX},${fileEnv.maxY}")
        writer.end()
      } finally {
        writer.close(); vroot.close(); allocator.close()
      }
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

  /** Seekable channel directly over the filesystem stream: the Arrow IPC
    * file layout needs random access for the footer, but batch bodies then
    * stream — nothing buffers the whole file.
    */
  private final class FsSeekableChannel(in: org.apache.hadoop.fs.FSDataInputStream,
      length: Long) extends java.nio.channels.SeekableByteChannel {
    private var pos = 0L
    private var open = true
    override def read(dst: java.nio.ByteBuffer): Int = {
      val want = dst.remaining()
      if (want == 0) return 0
      if (pos >= length) return -1
      val buf = new Array[Byte](math.min(want.toLong, length - pos).toInt)
      val n = in.read(pos, buf, 0, buf.length) // positioned read
      if (n > 0) { dst.put(buf, 0, n); pos += n }
      n
    }
    override def write(src: java.nio.ByteBuffer): Int = throw new UnsupportedOperationException
    override def position(): Long = pos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = { pos = p; this }
    override def size(): Long = length
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new UnsupportedOperationException
    override def isOpen: Boolean = open
    override def close(): Unit = { open = false; in.close() }
  }

  /** Per-file bboxes from the Arrow footer custom metadata ("geo_bbox",
    * accumulated task-side at write time). Gathered as a Spark job over the
    * file list — same scale posture as the GeoParquet footer read: the
    * driver ships file names only.
    */
  private def footerBBox(conf: org.apache.hadoop.conf.Configuration,
      f: String): (String, Option[String]) = {
    val p = new Path(f)
    val fs = p.getFileSystem(conf)
    val allocator = new RootAllocator()
    val reader = new ArrowFileReader(
      new FsSeekableChannel(fs.open(p), fs.getFileStatus(p).getLen), allocator)
    try {
      reader.getVectorSchemaRoot // forces footer read
      (f, Option(reader.getMetaData.get("geo_bbox")))
    } finally { reader.close(); allocator.close() }
  }

  /** Per-file footer bboxes. Footers are a few positioned reads each, so up
    * to a few hundred files the driver probes them directly (micro-seconds
    * on a local FS, no job); only genuinely large file sets pay a
    * distributed metadata pass.
    */
  def fileBBoxes(spark: SparkSession, path: String): Map[String, graft.geom.Envelope] = {
    val conf = spark.sessionState.newHadoopConf()
    val files = listArrowFiles(conf, new Path(path))
    if (files.isEmpty) return Map.empty
    val raw: Seq[(String, Option[String])] =
      if (files.size <= 256) files.map(f => footerBBox(conf, f.toString))
      else {
        val sconf = new GeoParquetIO.SerializableConf(conf)
        val names = files.map(_.toString)
        val slices = math.max(1, math.min(names.size, spark.sparkContext.defaultParallelism))
        spark.sparkContext.parallelize(names, slices)
          .map(f => footerBBox(sconf.value, f)).collect().toSeq
      }
    raw.collect { case (f, Some(s)) =>
      val a = s.split(",")
      (f, graft.geom.Envelope(a(0).toDouble, a(1).toDouble, a(2).toDouble, a(3).toDouble))
    }.toMap
  }

  /** Evaluate one `(value op literal)` attribute predicate on a decoded
    * vector cell. Nulls fail every op (SQL three-valued logic collapsed to
    * "don't keep"); two integral numbers compare as longs (a double
    * widening would conflate int64 neighbors beyond 2^53 — snowflake-style
    * ids live there), mixed/floating numerics widen to double; arrow
    * `Text` compares as a JVM String.
    */
  private def predicateHolds(raw: Any, op: String, lit: Any): Boolean = {
    val v = raw match {
      case t: org.apache.arrow.vector.util.Text => t.toString
      case other => other
    }
    if (v == null) return false
    def integral(n: Number): Boolean = n match {
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte => true
      case _ => false
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Number, y: Number) if integral(x) && integral(y) =>
        Some(java.lang.Long.compare(x.longValue(), y.longValue()))
      case (x: Number, y: Number) =>
        Some(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
      case (x: String, y: String)   => Some(x.compareTo(y))
      case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
      case _ => None
    }
    op match {
      case "in" => lit match {
        case xs: Iterable[_] => xs.exists(x => cmp(v, x).contains(0))
        case _ => throw new IllegalArgumentException("'in' filter needs an Iterable literal")
      }
      case _ => cmp(v, lit) match {
        case None => throw new IllegalArgumentException(
          s"incomparable filter operands: ${v.getClass.getSimpleName} vs $lit")
        case Some(c) => op match {
          case "=" | "==" => c == 0
          case "!="       => c != 0
          case "<"        => c < 0
          case "<="       => c <= 0
          case ">"        => c > 0
          case ">="       => c >= 0
        }
      }
    }
  }

  /** Read a feather dataset.
    *
    * `columns` projects at decode time (reference `read_feather(columns=)`,
    * `io/arrow.py:227-235`): only the selected vectors materialize into
    * rows. Batch bodies are still fetched (the IPC batch is one contiguous
    * body; per-buffer skipping would need buffer-level seeks), so this
    * saves decode + row width, not raw I/O bytes.
    * `bbox` filters rows during decode against the geometry envelope —
    * filtered rows are never materialized.
    * `filters` are attribute predicates in DNF (reference `filters=`,
    * `io/arrow.py:90-96`, pyarrow tuple form): outer Seq = OR of clauses,
    * inner Seq = AND of `(column, op, literal)` with ops
    * `= == != < <= > >= in`. Like `bbox`, they run against the decoded
    * vectors BEFORE a row materializes, and may reference non-projected
    * columns. A row with a null in a filtered column fails the predicate
    * (SQL comparison semantics).
    *
    * Memory per task is one record batch: batches stream lazily through a
    * per-batch iterator over a seekable channel on the filesystem stream,
    * and each decoded batch's rows are released before the next loads.
    * If `columns` excludes the primary geometry column, the result wraps
    * the plain projected DataFrame (no CRS/geometry semantics attached).
    */
  def read(spark: SparkSession, path: String,
      columns: Seq[String] = Nil,
      bbox: Option[graft.geom.Envelope] = None,
      filters: Seq[Seq[(String, String, Any)]] = Nil): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val conf = spark.sessionState.newHadoopConf()
    val files = listArrowFiles(conf, new Path(path))
    require(files.nonEmpty, s"no .arrow files under $path")

    // schema + geo metadata from the first file's footer (driver-side, tiny)
    val (fileSchema, geoMeta): (StructType, Option[String]) = {
      val allocator = new RootAllocator()
      val fs = files.head.getFileSystem(conf)
      val chan = new FsSeekableChannel(fs.open(files.head),
        fs.getFileStatus(files.head).getLen)
      val reader = new ArrowFileReader(chan, allocator)
      try {
        val s = reader.getVectorSchemaRoot.getSchema
        val geoJson = Option(s.getCustomMetadata.get("geo"))
        // geometry columns DECLARED by the file's geo metadata, with their
        // encodings: only these map GeoArrow layouts → WKB; any other
        // double-pair / list column stays non-geometry (see sparkType)
        val declared: Map[String, String] = geoJson.map { j =>
          val cols = mapper.readTree(j).get("columns")
          val it = cols.fieldNames(); val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val n = it.next()
            val enc = Option(cols.get(n).get("encoding")).map(_.asText()).getOrElse("WKB")
            b += n -> enc
          }
          b.result()
        }.getOrElse(Map.empty)
        val struct = StructType(s.getFields.asScala.toSeq.map(f =>
          StructField(f.getName, sparkType(f, declared.get(f.getName)), nullable = true)))
        (struct, geoJson)
      } finally { reader.close(); allocator.close() }
    }
    val primaryGeom: Option[String] = geoMeta.map { json =>
      mapper.readTree(json).get("primary_column").asText()
    }
    // per-column declared encodings (WKB | geoarrow.*) for cell decoding
    val colEncodings: Map[String, String] = geoMeta.map { json =>
      val cols = mapper.readTree(json).get("columns")
      val it = cols.fieldNames(); val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val n = it.next()
        val enc = Option(cols.get(n).get("encoding")).map(_.asText()).getOrElse("WKB")
        b += n -> enc
      }
      b.result()
    }.getOrElse(Map.empty)

    val projIdx: Array[Int] =
      if (columns.isEmpty) fileSchema.fieldNames.indices.toArray
      else columns.map { c =>
        require(fileSchema.fieldNames.contains(c), s"no such column in feather schema: $c")
        fileSchema.fieldIndex(c)
      }.toArray
    val outSchema = StructType(projIdx.map(fileSchema.fields(_)).toIndexedSeq)
    // bbox filtering decodes the geometry vector even when it isn't projected
    val geomIdx: Int = bbox match {
      case Some(_) =>
        val g = primaryGeom.getOrElse(
          throw new IllegalArgumentException("bbox filter needs geo metadata"))
        fileSchema.fieldIndex(g)
      case None => -1
    }

    val sconf = new GeoParquetIO.SerializableConf(conf)
    // file-level pruning first: files whose footer bbox misses the filter
    // never schedule a scan task at all (files without a recorded bbox are
    // kept — correctness over pruning)
    val fileNames = bbox match {
      case Some(b) =>
        val bx = fileBBoxes(spark, path)
        files.map(_.toString).filter(f => bx.get(f).forall(_.intersects(b)))
      case None => files.map(_.toString)
    }
    // attribute filters resolve to file-schema indices on the driver; the
    // compiled (idx, op, literal) triples ship to tasks, names do not
    val compiledFilters: Array[Array[(Int, String, Any)]] = filters.map { clause =>
      clause.map { case (c, op, lit) =>
        require(fileSchema.fieldNames.contains(c), s"no such column in feather schema: $c")
        require(Set("=", "==", "!=", "<", "<=", ">", ">=", "in").contains(op),
          s"unsupported filter op: $op")
        (fileSchema.fieldIndex(c), op, lit)
      }.toArray
    }.toArray
    val nOut = projIdx.length
    // per-output-column WKB gating mirrors the schema mapping: only a
    // declared-geometry list cell becomes a WKB point; other double pairs
    // surface as array<double> (outSchema.fields(c) pairs with projIdx(c))
    val wkbOut: Array[Boolean] = outSchema.fields.map(_.dataType == BinaryType)
    val outEnc: Array[String] =
      outSchema.fields.map(f => colEncodings.getOrElse(f.name, "WKB"))
    val box = bbox.orNull
    val rows =
      if (fileNames.isEmpty)
        spark.sparkContext.emptyRDD[Row]
      else spark.sparkContext.parallelize(fileNames, fileNames.length).flatMap { f =>
      val taskConf = sconf.value
      val p = new Path(f)
      val fs = p.getFileSystem(taskConf)
      val allocator = new RootAllocator()
      val chan = new FsSeekableChannel(fs.open(p), fs.getFileStatus(p).getLen)
      val reader = new ArrowFileReader(chan, allocator)
      def closeAll(): Unit = { reader.close(); allocator.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
      val vroot = reader.getVectorSchemaRoot
      // one decoded batch at a time: the iterator pulls the next IPC batch
      // only after the previous batch's rows have been consumed downstream
      val batches = new Iterator[Seq[Row]] {
        private var done = false
        override def hasNext: Boolean = !done
        override def next(): Seq[Row] = {
          if (!reader.loadNextBatch()) { done = true; return Nil }
          val vectors = vroot.getFieldVectors.asScala.toArray
          val rc = vroot.getRowCount
          if (rc == 0) return Nil
          val out = new scala.collection.mutable.ArrayBuffer[Row](rc)
          var r = 0
          while (r < rc) {
            val keep = (box == null || (vectors(geomIdx).getObject(r) match {
              case null => false
              // allocation-free envelope scan — never materialize the
              // geometry just to test (and usually discard) its bbox
              case wkb: Array[Byte] => graft.geom.Wkb.envelopeOf(wkb).intersects(box)
              // GeoArrow cell (any nesting): scan coordinates in place
              case l: java.util.List[_] => cellEnvelope(l).intersects(box)
              case _ => false
            })) && (compiledFilters.isEmpty || compiledFilters.exists(_.forall {
              case (ci, op, lit) => predicateHolds(vectors(ci).getObject(r), op, lit)
            }))
            if (keep) {
              val vals = new Array[Any](nOut)
              var c = 0
              while (c < nOut) {
                vals(c) = vectors(projIdx(c)).getObject(r) match {
                  case null                                 => null
                  case t: org.apache.arrow.vector.util.Text => t.toString
                  case l: java.util.List[_] =>
                    if (wkbOut(c)) cellToWkb(l, outEnc(c))
                    else l.asScala.toSeq.map(_.asInstanceOf[Number].doubleValue())
                  case other                                => other
                }
                c += 1
              }
              out += Row.fromSeq(vals.toIndexedSeq)
            }
            r += 1
          }
          out.toSeq
        }
      }
      batches.flatten
    }
    val df: DataFrame = spark.createDataFrame(rows, outSchema)
    (geoMeta, primaryGeom) match {
      case (Some(json), Some(primary)) if outSchema.fieldNames.contains(primary) =>
        val colNode = mapper.readTree(json).get("columns").get(primary)
        val crs = if (colNode.has("crs") && !colNode.get("crs").isNull)
          Some(colNode.get("crs").asText()) else None
        val g = GeoDataFrame(df, primary).setCrs(crs.getOrElse("OGC:CRS84"))
        // .cx re-plans as a bbox read — whole files prune on their footer
        // bboxes and rows filter at decode time — but ONLY when at least
        // one file actually prunes: the probe is a cheap driver footer
        // pass, and declining keeps the no-prune case on the original
        // scan's plain filter path (a blind re-read costs a second full
        // decode for nothing). Skipped when this read already narrows by
        // bbox (the hook would widen the window).
        if (bbox.isEmpty)
          g.copy(boxSource = Some(graft.api.BoxSourceMeta(g.df, { box =>
            val bx = fileBBoxes(spark, path)
            if (bx.nonEmpty && bx.values.exists(!_.intersects(box)))
              Some(read(spark, path, columns, Some(box), filters).df)
            else None
          })))
        else g
      case _ => GeoDataFrame(df)
    }
  }
}
