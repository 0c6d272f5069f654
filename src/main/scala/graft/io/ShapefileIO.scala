package graft.io

import graft.geom.{Envelope, Geometry, LineString, Measures, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ESRI Shapefile IO — the reference's most common ingestion path
  * (`dask_geopandas/io/file.py:49-149`, pyogrio-backed `read_file`). The
  * .shp/.shx/.dbf trio are public fixed-layout formats (ESRI Shapefile
  * Technical Description, 1998; dBASE III), simple enough to read without
  * native OGR libraries.
  *
  * Distributed read (the pyogrio chunking analog, `io/file.py:32-46`):
  * the driver touches METADATA only — file sizes (record counts derive
  * from the .shx length: (len-100)/8) and one .dbf header for the schema —
  * then splits every file into `chunkSize`-record ranges, the RangeIndex
  * divisions analog (`io/file.py:117-128`). Each task seeks via the .shx
  * record index straight to its range (positioned reads; never the whole
  * file) and decodes .shp geometries to WKB + .dbf attributes into rows.
  *
  * Write: one part-NNNNN.{shp,shx,dbf} trio per Spark partition, written
  * task-side (the driver never sees data) — the same layout the feather
  * writer uses. Geometry coordinates are IEEE doubles (exact roundtrip);
  * dBASE numeric attributes are fixed-width ASCII, so LongType roundtrips
  * exactly while DoubleType attributes carry %.17g (up to-the-ulp for all
  * but pathological exponents — put exactness-critical doubles in the
  * geometry, not the attributes).
  *
  * Supported shapes: Point, MultiPoint, PolyLine, Polygon (incl. holes by
  * the CW-outer/CCW-hole winding rule, multiple outers -> MultiPolygon).
  * Z/M variants are rejected loudly.
  */
object ShapefileIO {

  // shape type codes (2D only)
  private val NullShape = 0
  private val PointT = 1
  private val PolyLineT = 3
  private val PolygonT = 5
  private val MultiPointT = 8

  // ------------------------------------------------------------ dbf schema
  private final case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  private final case class DbfHeader(recordCount: Int, headerLen: Int, recordLen: Int,
      fields: Seq[DbfField])

  private def parseDbfHeader(bytes: Array[Byte]): DbfHeader = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val recordCount = bb.getInt(4)
    val headerLen = bb.getShort(8) & 0xffff
    val recordLen = bb.getShort(10) & 0xffff
    val fields = scala.collection.mutable.ArrayBuffer.empty[DbfField]
    var off = 32
    while (off + 32 <= headerLen && bytes(off) != 0x0d) {
      val nameEnd = {
        var e = off
        while (e < off + 11 && bytes(e) != 0) e += 1
        e
      }
      fields += DbfField(new String(bytes, off, nameEnd - off, "US-ASCII"),
        bytes(off + 11).toChar, bytes(off + 16) & 0xff, bytes(off + 17) & 0xff)
      off += 32
    }
    DbfHeader(recordCount, headerLen, recordLen, fields.toSeq)
  }

  private def sparkTypeOf(f: DbfField): DataType = f.ftype match {
    case 'C' => StringType
    case 'N' => if (f.decimals == 0) LongType else DoubleType
    case 'F' => DoubleType
    case 'L' => BooleanType
    case 'D' => StringType // yyyymmdd, kept verbatim
    case other => throw new UnsupportedOperationException(s"dbf field type '$other'")
  }

  def schemaOf(spark: SparkSession, path: String, geomCol: String = "geometry"): StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val shp = shpFiles(conf, path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .shp files under $path"))
    val fs = shp.getFileSystem(conf)
    val dbfPath = sibling(shp, "dbf")
    val in = fs.open(dbfPath)
    val header = try {
      val head = new Array[Byte](32)
      in.readFully(0, head)
      val hlen = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getShort(8) & 0xffff
      val full = new Array[Byte](hlen)
      in.readFully(0, full)
      parseDbfHeader(full)
    } finally in.close()
    // the .prj sidecar's CRS rides on the geometry field as the same
    // `crs` metadata key GeoDataFrame.setCrs writes, so DSv2 reads carry
    // it too (spark.read.format("shapefile") -> GeoDataFrame(df) keeps it)
    val geomMeta = readPrjCrs(conf, path) match {
      case Some(c) => new org.apache.spark.sql.types.MetadataBuilder()
        .putString("crs", c).build()
      case None => org.apache.spark.sql.types.Metadata.empty
    }
    StructType(header.fields.map(f => StructField(f.name, sparkTypeOf(f))) :+
      StructField(geomCol, BinaryType, nullable = true, geomMeta))
  }

  private[io] def sibling(shp: Path, ext: String): Path = {
    val n = shp.getName
    new Path(shp.getParent, n.substring(0, n.length - 3) + ext)
  }

  private[io] def shpFiles(conf: org.apache.hadoop.conf.Configuration, path: String): Seq[Path] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val st = fs.getFileStatus(root)
    if (st.isFile) Seq(root)
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".shp") && !p.getName.startsWith("."))
      .sortBy(_.getName)
  }

  /** CRS from the dataset's `.prj` sidecar (WKT1, reduced through
    * [[graft.sql.WktCrs]] to an EPSG code or synthesized proj record the
    * engine serves). `path` may be one .shp or a directory — the first
    * file's sidecar speaks for the set, the same single-schema contract
    * the reader already applies to the .dbf header. None when no sidecar
    * exists or its WKT names an unsupported family.
    */
  def readPrjCrs(conf: org.apache.hadoop.conf.Configuration,
      path: String): Option[String] =
    shpFiles(conf, path).headOption.flatMap { f =>
      val prj = new Path(f.getParent,
        f.getName.replaceAll("(?i)\\.shp$", ".prj"))
      val fs = prj.getFileSystem(conf)
      if (!fs.exists(prj)) None
      else {
        val in = fs.open(prj)
        val text = try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        graft.sql.WktCrs.parse(text)
      }
    }

  // -------------------------------------------------------------- reading
  /** One chunk of one file: records [startRec, startRec+nRecs). */
  private[io] final case class Chunk(shp: String, startRec: Int, nRecs: Int)

  /** Chunk plan for a dataset: record counts come from .shx FILE SIZES —
    * no data reads at planning time beyond one 100-byte header per file
    * when a bbox is given (the .shp header carries the file envelope, so
    * whole files outside the query window are pruned before any task is
    * scheduled). Shared by `read` and the DSv2 connector.
    */
  private[io] def planChunks(conf: org.apache.hadoop.conf.Configuration,
      path: String, chunkSize: Int,
      bbox: Option[(Double, Double, Double, Double)] = None): Seq[Chunk] =
    shpFiles(conf, path).flatMap { shp =>
      val fs = shp.getFileSystem(conf)
      val pruned = bbox.exists { case (qx0, qy0, qx1, qy1) =>
        val in = fs.open(shp)
        val head = new Array[Byte](100)
        try in.readFully(0, head) finally in.close()
        val bb = ByteBuffer.wrap(head, 36, 32).order(ByteOrder.LITTLE_ENDIAN)
        val fx0 = bb.getDouble; val fy0 = bb.getDouble
        val fx1 = bb.getDouble; val fy1 = bb.getDouble
        !(fx0 <= qx1 && fx1 >= qx0 && fy0 <= qy1 && fy1 >= qy0)
      }
      if (pruned) Nil
      else {
        val shxLen = fs.getFileStatus(sibling(shp, "shx")).getLen
        val nRecs = ((shxLen - 100) / 8).toInt
        (0 until nRecs by chunkSize).map(s =>
          Chunk(shp.toString, s, math.min(chunkSize, nRecs - s)))
      }
    }

  /** Distributed read. `chunkSize` = records per task (the reference's
    * `chunksize`, `io/file.py:106-128`); record counts come from .shx FILE
    * SIZES — the driver reads no data, only one .dbf header for the schema.
    */
  def read(spark: SparkSession, path: String, chunkSize: Int = 65536,
      geomCol: String = "geometry",
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val files = shpFiles(conf, path)
    require(files.nonEmpty, s"no .shp files under $path")
    val schema = schemaOf(spark, path, geomCol)
    // bbox: whole files outside the window drop on their 100-byte header
    // envelope at planning time; surviving rows apply the exact
    // envelope-intersects residual task-side
    val chunks = planChunks(conf, path, chunkSize, bbox)
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val nFields = schema.length - 1
    val fieldTypes = schema.fields.take(nFields).map(_.dataType)
    val allAttrs = Array.fill(nFields)(true)
    val rows = spark.sparkContext
      .parallelize(chunks, math.max(1, chunks.size))
      .flatMap { ch =>
        val it = readChunk(sconf.value, ch, fieldTypes, allAttrs, wantGeom = true)
        bbox match {
          case Some((qx0, qy0, qx1, qy1)) => it.filter { r =>
            val w = r.get(r.length - 1).asInstanceOf[Array[Byte]]
            w != null && {
              val e = graft.geom.Wkb.envelopeOf(w)
              !e.isEmpty && e.minX <= qx1 && e.maxX >= qx0 &&
                e.minY <= qy1 && e.maxY >= qy0
            }
          }
          case None => it
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Read one chunk, decoding only the wanted attribute columns (dBASE
    * records are fixed-width so the IO is the full record either way —
    * the mask saves per-field parse CPU) and skipping geometry decode
    * entirely when `wantGeom` is false (e.g. a COUNT(*) over the
    * connector). Output rows carry kept attrs in file order, geometry
    * last when wanted.
    */
  private[io] def readChunk(conf: org.apache.hadoop.conf.Configuration, ch: Chunk,
      fieldTypes: Array[DataType], wantAttr: Array[Boolean],
      wantGeom: Boolean): Iterator[Row] = {
    val shp = new Path(ch.shp)
    val fs = shp.getFileSystem(conf)
    // .shx slice for this range: byte offsets of each record's content
    val shxIn = fs.open(sibling(shp, "shx"))
    val offsets = try {
      val buf = new Array[Byte](ch.nRecs * 8)
      shxIn.readFully(100L + 8L * ch.startRec, buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)
      Array.tabulate(ch.nRecs) { i =>
        (bb.getInt(i * 8) * 2L, bb.getInt(i * 8 + 4) * 2) // (byteOffset, contentBytes)
      }
    } finally shxIn.close()
    // one contiguous positioned read covering the range's records
    val start = offsets.head._1
    val end = offsets.last._1 + 8 + offsets.last._2
    val shpBytes = new Array[Byte]((end - start).toInt)
    val shpIn = fs.open(shp)
    try shpIn.readFully(start, shpBytes) finally shpIn.close()
    val geoms: Array[Array[Byte]] =
      if (!wantGeom) null
      else offsets.map { case (off, len) =>
        // +8 skips the record header (BE record number + content length)
        decodeShape(ByteBuffer.wrap(shpBytes, (off - start).toInt + 8, len)
          .order(ByteOrder.LITTLE_ENDIAN))
      }
    // .dbf slice: fixed-size records, direct seek
    val dbfPath = sibling(shp, "dbf")
    val dbfIn = fs.open(dbfPath)
    val (attrs, deleted) = try {
      val head = new Array[Byte](32)
      dbfIn.readFully(0, head)
      val hlen = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getShort(8) & 0xffff
      val full = new Array[Byte](hlen)
      dbfIn.readFully(0, full)
      val header = parseDbfHeader(full)
      // each file parses with ITS OWN header, so a sibling whose schema
      // diverged from the dataset schema must fail loudly, not misparse
      require(header.fields.length == fieldTypes.length &&
        header.fields.map(sparkTypeOf) == fieldTypes.toSeq,
        s"$dbfPath schema ${header.fields.map(f => s"${f.name}:${f.ftype}")} " +
          "differs from the dataset schema (taken from the first file)")
      val buf = new Array[Byte](ch.nRecs * header.recordLen)
      dbfIn.readFully(header.headerLen.toLong + header.recordLen.toLong * ch.startRec, buf)
      (Array.tabulate(ch.nRecs) { i =>
        parseDbfRecord(buf, i * header.recordLen, header, fieldTypes, wantAttr)
      },
        // dBASE soft deletes: '*' in the record's first byte (un-packed
        // editors leave these behind; OGR/pyogrio skip them)
        Array.tabulate(ch.nRecs)(i => buf(i * header.recordLen) == '*'.toByte))
    } finally dbfIn.close()
    Iterator.tabulate(ch.nRecs) { i =>
      if (deleted(i)) null
      else if (wantGeom) Row.fromSeq(attrs(i).toIndexedSeq :+ geoms(i))
      else Row.fromSeq(attrs(i).toIndexedSeq)
    }.filter(_ != null)
  }

  private def parseDbfRecord(buf: Array[Byte], off0: Int, header: DbfHeader,
      fieldTypes: Array[DataType], want: Array[Boolean]): Array[Any] = {
    var off = off0 + 1 // skip deletion flag
    val out = new Array[Any](want.count(identity))
    var i = 0
    var o = 0
    while (i < header.fields.length) {
      val f = header.fields(i)
      if (want(i)) {
        val s = new String(buf, off, f.length, "US-ASCII").trim
        out(o) =
          if (s.isEmpty) null
          else fieldTypes(i) match {
            case LongType    => s.toLong
            case DoubleType  => s.toDouble
            case BooleanType => s == "T" || s == "t" || s == "Y" || s == "y"
            case _           => s
          }
        o += 1
      }
      off += f.length
      i += 1
    }
    out
  }

  /** Decode one .shp record content to WKB (null for NullShape). */
  private def decodeShape(bb: ByteBuffer): Array[Byte] = {
    val shapeType = bb.getInt
    val g: Geometry = shapeType match {
      case NullShape => null
      case PointT => Point(bb.getDouble, bb.getDouble)
      case MultiPointT =>
        bb.position(bb.position() + 32) // skip bbox
        val n = bb.getInt
        MultiPoint(Array.fill(n)(Point(bb.getDouble, bb.getDouble)))
      case PolyLineT | PolygonT =>
        bb.position(bb.position() + 32) // skip bbox
        val nParts = bb.getInt
        val nPoints = bb.getInt
        val parts = Array.fill(nParts)(bb.getInt)
        val xy = new Array[Double](nPoints * 2)
        var i = 0
        while (i < nPoints * 2) { xy(i) = bb.getDouble; i += 1 }
        val paths = Array.tabulate(nParts) { p =>
          val s = parts(p)
          val e = if (p + 1 < nParts) parts(p + 1) else nPoints
          java.util.Arrays.copyOfRange(xy, s * 2, e * 2)
        }
        if (shapeType == PolyLineT) {
          if (paths.length == 1) LineString(paths(0))
          else MultiLineString(paths.map(LineString(_)))
        } else assemblePolygons(paths)
      case z if Set(11, 13, 15, 18, 21, 23, 25, 28).contains(z) =>
        throw new UnsupportedOperationException(
          s"shapefile Z/M shape type $z not supported (2D shapes only)")
      case other => throw new IllegalArgumentException(s"unknown shape type $other")
    }
    if (g == null) null else Wkb.write(g)
  }

  /** Shapefile winding rule: clockwise rings (negative signed area) are
    * outers, counter-clockwise are holes; a hole belongs to the outer
    * containing its first vertex. Multiple outers -> MultiPolygon.
    */
  private[io] def assemblePolygons(rings: Array[Array[Double]]): Geometry = {
    val outers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val holes = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    rings.foreach { r =>
      if (Measures.signedRingArea(r) <= 0) outers += r else holes += r
    }
    if (outers.isEmpty) { outers ++= holes; holes.clear() } // malformed: all CCW
    if (outers.length == 1) {
      Polygon((outers(0) +: holes.toSeq).toArray)
    } else {
      val assigned = outers.map(o => scala.collection.mutable.ArrayBuffer(o))
      holes.foreach { h =>
        val idx = outers.indexWhere(o =>
          graft.geom.Predicates.pointInPolygon(h(0), h(1), Polygon(Array(o))) !=
            graft.geom.Predicates.OUT)
        assigned(if (idx < 0) 0 else idx) += h
      }
      MultiPolygon(assigned.map(rs => Polygon(rs.toArray)).toArray)
    }
  }

  // -------------------------------------------------------------- writing
  /** Distributed write: one part trio per partition, task-side. Attribute
    * columns: Long -> N(19,0), Double -> F(20, %.17g truncated to fit),
    * Boolean -> L, String -> C(min(254, declared)), geometry -> .shp.
    */
  def write(df: DataFrame, path: String, geomCol: String = "geometry",
      maxStringLen: Int = 64, crs: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrFields = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    attrFields.foreach { case (f, _) =>
      require(Set[DataType](LongType, IntegerType, DoubleType, BooleanType, StringType)
        .contains(f.dataType), s"shapefile write: unsupported attribute type ${f.dataType}")
      require(f.name.length <= 10, s"dbf field name '${f.name}' exceeds 10 chars")
    }
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val pathStr = path
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      writePartition(sconf.value, pathStr, pid, it, attrFields, geomIdx, maxStringLen)
      Iterator.single(pid)
    }.collect()
    // one .prj per written part trio (OGR's per-file sidecar layout), for
    // the CRS strings WktCrs can synthesize — absent support the sidecar
    // is skipped, never wrong
    crs.flatMap(graft.sql.WktCrs.toWkt).foreach { wkt =>
      val bytes = wkt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      shpFiles(conf, path).foreach { f =>
        val out = fs.create(new Path(f.getParent,
          f.getName.replaceAll("(?i)\\.shp$", ".prj")), true)
        try out.write(bytes) finally out.close()
      }
    }
    ()
  }

  private def writePartition(conf: org.apache.hadoop.conf.Configuration, path: String,
      pid: Int, it: Iterator[Row], attrFields: Array[(StructField, Int)], geomIdx: Int,
      maxStringLen: Int): Unit = {
    val rows = it.toArray
    // encode geometries first to learn the file-level shape type + bbox
    val shapes = rows.map { row =>
      val gv = row.get(geomIdx)
      if (gv == null) (NullShape, Array.empty[Byte], Envelope.empty)
      else encodeShape(Wkb.read(gv.asInstanceOf[Array[Byte]]))
    }
    val fileType = shapes.collectFirst { case (t, _, _) if t != NullShape => t }.getOrElse(PointT)
    require(shapes.forall { case (t, _, _) => t == NullShape || t == fileType },
      "shapefile write: mixed shape types in one file (split by type first)")
    val env = shapes.foldLeft(Envelope.empty) { case (e, (_, _, se)) => e.union(se) }
    val (minX, minY, maxX, maxY) =
      if (env.isEmpty) (0.0, 0.0, 0.0, 0.0) else (env.minX, env.minY, env.maxX, env.maxY)

    def header(totalBytes: Long, shapeType: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(100)
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0, 9994)
      bb.putInt(24, (totalBytes / 2).toInt) // length in 16-bit words
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(28, 1000)
      bb.putInt(32, shapeType)
      bb.putDouble(36, minX); bb.putDouble(44, minY)
      bb.putDouble(52, maxX); bb.putDouble(60, maxY)
      bb.array()
    }

    val base = f"part-$pid%05d"
    val fs = new Path(path).getFileSystem(conf)
    // ---- .shp + .shx (attempt-private temps + rename: speculative-safe)
    AtomicTaskFile.withOutput(fs, new Path(path, s"$base.shp")) { shpOut =>
    AtomicTaskFile.withOutput(fs, new Path(path, s"$base.shx")) { shxOut =>
    {
      var shpPos = 100L
      val shxBody = ByteBuffer.allocate(rows.length * 8).order(ByteOrder.BIG_ENDIAN)
      val shpBody = new java.io.ByteArrayOutputStream()
      shapes.zipWithIndex.foreach { case ((stype, content, _), i) =>
        val contentBytes = if (stype == NullShape) 4 else content.length
        val rec = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        rec.putInt(i + 1).putInt(contentBytes / 2)
        shpBody.write(rec.array())
        if (stype == NullShape) {
          val nb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(NullShape)
          shpBody.write(nb.array())
        } else shpBody.write(content)
        shxBody.putInt((shpPos / 2).toInt).putInt(contentBytes / 2)
        shpPos += 8 + contentBytes
      }
      shpOut.write(header(shpPos, fileType))
      shpOut.write(shpBody.toByteArray)
      shxOut.write(header(100L + rows.length * 8L, fileType))
      shxOut.write(shxBody.array())
    } } }

    // ---- .dbf
    val dbfFields = attrFields.map { case (f, _) =>
      f.dataType match {
        // 20, not 19: Long.MinValue prints as 20 characters
        case LongType | IntegerType => DbfField(f.name, 'N', 20, 0)
        case DoubleType             => DbfField(f.name, 'F', 20, 0)
        case BooleanType            => DbfField(f.name, 'L', 1, 0)
        case StringType             => DbfField(f.name, 'C', math.min(254, maxStringLen), 0)
        case other => throw new IllegalStateException(other.toString)
      }
    }
    val recordLen = 1 + dbfFields.map(_.length).sum
    val headerLen = 32 + 32 * dbfFields.length + 1
    AtomicTaskFile.withOutput(fs, new Path(path, s"$base.dbf")) { dbfOut =>
    {
      val head = ByteBuffer.allocate(headerLen).order(ByteOrder.LITTLE_ENDIAN)
      head.put(0, 0x03.toByte)
      head.putInt(4, rows.length)
      head.putShort(8, headerLen.toShort)
      head.putShort(10, recordLen.toShort)
      dbfFields.zipWithIndex.foreach { case (f, i) =>
        val off = 32 + 32 * i
        val nameB = f.name.getBytes("US-ASCII")
        var j = 0
        while (j < nameB.length) { head.put(off + j, nameB(j)); j += 1 }
        head.put(off + 11, f.ftype.toByte)
        head.put(off + 16, f.length.toByte)
        head.put(off + 17, f.decimals.toByte)
      }
      head.put(headerLen - 1, 0x0d.toByte)
      dbfOut.write(head.array())
      val rec = new Array[Byte](recordLen)
      rows.foreach { row =>
        java.util.Arrays.fill(rec, ' '.toByte)
        var off = 1
        attrFields.zip(dbfFields).foreach { case ((f, idx), df2) =>
          val v = row.get(idx)
          val s: String =
            if (v == null) ""
            else f.dataType match {
              case LongType    => v.asInstanceOf[Long].toString
              case IntegerType => v.asInstanceOf[Int].toString
              case DoubleType  => fmtDouble(v.asInstanceOf[Double], 20)
              case BooleanType => if (v.asInstanceOf[Boolean]) "T" else "F"
              case _           => v.asInstanceOf[String]
            }
          val b = s.getBytes("US-ASCII")
          require(b.length <= df2.length,
            s"value '$s' exceeds dbf field ${f.name}(${df2.length})")
          // numerics right-justified, text left-justified (dBASE convention)
          val pad = if (df2.ftype == 'C') 0 else df2.length - b.length
          System.arraycopy(b, 0, rec, off + pad, b.length)
          off += df2.length
        }
        dbfOut.write(rec)
      }
      dbfOut.write(0x1a) // EOF marker
    } }
  }

  /** Encode one geometry to (shapeType, recordContentBytes, envelope). */
  private def encodeShape(g: Geometry): (Int, Array[Byte], Envelope) = {
    def withBBoxPaths(stype: Int, paths: Seq[Array[Double]]): (Int, Array[Byte], Envelope) = {
      val nPoints = paths.map(_.length / 2).sum
      val bb = ByteBuffer.allocate(4 + 32 + 8 + paths.length * 4 + nPoints * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      val env = paths.foldLeft(Envelope.empty)((e, p) => e.union(Envelope.ofPacked(p)))
      bb.putInt(stype)
      bb.putDouble(env.minX).putDouble(env.minY).putDouble(env.maxX).putDouble(env.maxY)
      bb.putInt(paths.length).putInt(nPoints)
      var acc = 0
      paths.foreach { p => bb.putInt(acc); acc += p.length / 2 }
      paths.foreach { p =>
        var i = 0
        while (i < p.length) { bb.putDouble(p(i)); i += 1 }
      }
      (stype, bb.array(), env)
    }
    g match {
      case p: Point =>
        val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(PointT).putDouble(p.x).putDouble(p.y)
        (PointT, bb.array(), Envelope(p.x, p.y, p.x, p.y))
      case mp: MultiPoint =>
        val bb = ByteBuffer.allocate(4 + 32 + 4 + mp.pts.length * 16)
          .order(ByteOrder.LITTLE_ENDIAN)
        val env = mp.envelope
        bb.putInt(MultiPointT)
        bb.putDouble(env.minX).putDouble(env.minY).putDouble(env.maxX).putDouble(env.maxY)
        bb.putInt(mp.pts.length)
        mp.pts.foreach(p => bb.putDouble(p.x).putDouble(p.y))
        (MultiPointT, bb.array(), env)
      case l: LineString => withBBoxPaths(PolyLineT, Seq(l.xy))
      case ml: MultiLineString => withBBoxPaths(PolyLineT, ml.lines.toSeq.map(_.xy))
      case poly: Polygon => withBBoxPaths(PolygonT, windPolygon(poly))
      case mpoly: MultiPolygon =>
        withBBoxPaths(PolygonT, mpoly.polys.toSeq.flatMap(windPolygon))
      case other => throw new UnsupportedOperationException(
        s"shapefile write: unsupported geometry ${other.geometryType}")
    }
  }

  /** Format a double into at most `width` ASCII characters for a dBASE F
    * field: start at 17 significant digits (exact for every double) and
    * shed precision only when the rendering overflows the field — the
    * documented lossy path (exponents that need the wide form).
    */
  private def fmtDouble(d: Double, width: Int): String = {
    // Locale.ROOT: default-locale formatting would emit a comma decimal
    // separator on de_DE/fr_FR/tr_TR JVMs, which violates dBASE and breaks
    // the read side's locale-independent s.toDouble on roundtrip
    def g(p: Int) = String.format(java.util.Locale.ROOT, s"%.${p}g", Double.box(d))
    var p = 17
    var s = g(p)
    while (s.length > width && p > 1) { p -= 1; s = g(p) }
    require(s.length <= width, s"cannot format $d within $width chars")
    s
  }

  /** Enforce shapefile winding: outer ring clockwise (signed area <= 0),
    * holes counter-clockwise.
    */
  private[io] def windPolygon(p: Polygon): Seq[Array[Double]] =
    p.rings.toSeq.zipWithIndex.map { case (r, i) =>
      val sa = Measures.signedRingArea(r)
      val wantCw = i == 0
      if ((wantCw && sa > 0) || (!wantCw && sa < 0)) reverse(r) else r
    }

  private def reverse(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < n) {
      out(i * 2) = ring((n - 1 - i) * 2)
      out(i * 2 + 1) = ring((n - 1 - i) * 2 + 1)
      i += 1
    }
    out
  }
}
