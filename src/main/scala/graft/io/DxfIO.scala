package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, GeometryCollection, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** AutoCAD DXF (ASCII) read/write — pure JVM, no OGR (reference `read_file`
  * reaches .dxf through pyogrio's DXF driver, `io/file.py:32-46`; the
  * format is Autodesk's published group-code/value text spec).
  *
  * Read surface (the ENTITIES section, like OGR): POINT, LINE,
  * LWPOLYLINE, POLYLINE/VERTEX/SEQEND, CIRCLE and ARC (stroked to
  * LineStrings at 1-degree resolution, OGR's default treatment), SOLID
  * (as its polygon), TEXT/MTEXT (as the insertion point with the text in
  * the `text` column). Each entity carries its `layer` (group 8) and
  * `entity` type name; BLOCKS/INSERT expansion is not performed (OGR
  * expands inserts by default — documented difference; entity-level
  * parity covers the survey/CAD-exchange files read_file users feed it).
  * Z coordinates (group 30/31) are ignored, matching this repo's 2D
  * kernel (the shapefile reader's policy for Z shapes).
  *
  * Write surface: one .dxf per partition (directory dataset, the bulk
  * path) or a driver-assembled single file — a minimal ENTITIES-only
  * document (spec-valid; AutoCAD and OGR both accept header-less DXF):
  * Point→POINT, LineString→LWPOLYLINE, Polygon→one closed LWPOLYLINE per
  * ring, Multi* exploded.
  *
  * Scale shape: DXF is a non-splittable text document — one task per
  * file, like the KML/GPX/MIF codecs; bulk interchange belongs to
  * GeoParquet/FlatGeobuf.
  */
object DxfIO {

  // ------------------------------------------------------------------ read

  def read(spark: SparkSession, path: String,
      geometryColumn: String = "geometry"): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".dxf"))
          .map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .dxf files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val schema = StructType(Seq(
      StructField("layer", StringType),
      StructField("entity", StringType),
      StructField("text", StringType),
      StructField(geometryColumn, BinaryType)))
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        val body = try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        parseEntities(body).map { e =>
          Row(e.layer, e.entity, e.text.orNull, Wkb.write(e.geom))
        }
      }
    GeoDataFrame(spark.createDataFrame(rows, schema), geometryColumn)
  }

  private[io] final case class Ent(layer: String, entity: String,
      text: Option[String], geom: Geometry)

  /** One (group code, value) pair per two physical lines. */
  private def pairs(body: String): Iterator[(Int, String)] = {
    val lines = body.linesIterator.map(_.stripSuffix("\r")).buffered
    new Iterator[(Int, String)] {
      def hasNext: Boolean = lines.hasNext
      def next(): (Int, String) = {
        val code = lines.next().trim
        val value = if (lines.hasNext) lines.next() else ""
        (try code.toInt catch { case _: NumberFormatException => -9999 }, value.trim)
      }
    }
  }

  private def strokeArc(cx: Double, cy: Double, r: Double,
      a0Deg: Double, a1Deg: Double, close: Boolean): Geometry = {
    // DXF angles are degrees counterclockwise from +x; end < start wraps
    val a1 = if (a1Deg <= a0Deg) a1Deg + 360.0 else a1Deg
    val steps = math.max(2, math.ceil(a1 - a0Deg).toInt) // ~1 degree
    val xs = new Array[Double](2 * (steps + 1))
    var i = 0
    while (i <= steps) {
      val a = math.toRadians(a0Deg + (a1 - a0Deg) * i / steps)
      xs(2 * i) = cx + r * math.cos(a)
      xs(2 * i + 1) = cy + r * math.sin(a)
      i += 1
    }
    if (close) { // full circle: snap the last vertex onto the first
      xs(2 * steps) = xs(0); xs(2 * steps + 1) = xs(1)
    }
    LineString(xs)
  }

  private[io] def parseEntities(body: String): Seq[Ent] = {
    val it = pairs(body)
    val out = mutable.ArrayBuffer.empty[Ent]
    var inEntities = false
    // current entity accumulator
    var entity: String = null
    var layer = "0"
    var text: Option[String] = None
    var flags = 0
    val xs = mutable.ArrayBuffer.empty[Double] // interleaved x,y (10/20)
    var x1, y1, x2, y2, x3, y3 = Double.NaN    // 11/21, 12/22, 13/23
    var radius = Double.NaN
    var ang0 = 0.0; var ang1 = 360.0
    // POLYLINE container state
    var polyOpen = false
    var polyLayer = "0"
    var polyFlags = 0
    val polyXs = mutable.ArrayBuffer.empty[Double]

    def flush(): Unit = {
      if (entity == null) return
      val e = entity
      entity = null
      val g: Option[Geometry] = e match {
        case "POINT" if xs.size >= 2 => Some(Point(xs(0), xs(1)))
        case "TEXT" | "MTEXT" if xs.size >= 2 => Some(Point(xs(0), xs(1)))
        case "LINE" if xs.size >= 2 && !x1.isNaN =>
          Some(LineString(Array(xs(0), xs(1), x1, y1)))
        case "LWPOLYLINE" if xs.size >= 4 =>
          val closed = (flags & 1) != 0
          val pts = if (closed && (xs(0) != xs(xs.size - 2) || xs(1) != xs.last))
            (xs ++ Seq(xs(0), xs(1))).toArray else xs.toArray
          Some(LineString(pts))
        case "CIRCLE" if xs.size >= 2 && !radius.isNaN =>
          Some(strokeArc(xs(0), xs(1), radius, 0.0, 360.0, close = true))
        case "ARC" if xs.size >= 2 && !radius.isNaN =>
          Some(strokeArc(xs(0), xs(1), radius, ang0, ang1, close = false))
        case "SOLID" if xs.size >= 2 && !x1.isNaN && !x2.isNaN =>
          // SOLID vertex order is 1,2,4,3 (the spec's bowtie quirk)
          val ring =
            if (x3.isNaN) Array(xs(0), xs(1), x1, y1, x2, y2, xs(0), xs(1))
            else Array(xs(0), xs(1), x1, y1, x3, y3, x2, y2, xs(0), xs(1))
          Some(Polygon(Array(ring)))
        case _ => None
      }
      g.foreach(gg => out += Ent(layer, e, if (e == "TEXT" || e == "MTEXT") text else None, gg))
      layer = "0"; text = None; flags = 0
      xs.clear()
      x1 = Double.NaN; y1 = Double.NaN; x2 = Double.NaN; y2 = Double.NaN
      x3 = Double.NaN; y3 = Double.NaN
      radius = Double.NaN; ang0 = 0.0; ang1 = 360.0
    }

    def flushPoly(): Unit = {
      if (polyOpen && polyXs.size >= 4) {
        val closed = (polyFlags & 1) != 0
        val pts = if (closed && (polyXs(0) != polyXs(polyXs.size - 2) ||
            polyXs(1) != polyXs.last))
          (polyXs ++ Seq(polyXs(0), polyXs(1))).toArray else polyXs.toArray
        out += Ent(polyLayer, "POLYLINE", None, LineString(pts))
      }
      polyOpen = false; polyXs.clear(); polyFlags = 0; polyLayer = "0"
    }

    var section = ""
    while (it.hasNext) {
      val (code, value) = it.next()
      if (code == 2 && section == "pending") { section = value; inEntities = value == "ENTITIES" }
      else if (code == 0) value match {
        case "SECTION" => section = "pending"
        case "ENDSEC"  => flush(); flushPoly(); inEntities = false; section = ""
        case "EOF"     => flush(); flushPoly()
        case v if inEntities =>
          v match {
            case "POLYLINE" =>
              flush(); flushPoly(); polyOpen = true
            case "VERTEX" if polyOpen =>
              flush() // VERTEX coordinates accumulate below via code 10/20
              entity = "VERTEX"
            case "SEQEND" if polyOpen =>
              flush(); flushPoly()
            case other =>
              flush()
              if (polyOpen && other != "VERTEX") flushPoly()
              entity = other
          }
        case _ => ()
      }
      else if (inEntities) {
        if (polyOpen && entity == "VERTEX") code match {
          case 10 => polyXs += value.toDouble
          case 20 => polyXs += value.toDouble
          case 8  => () // vertex layer ignored
          case _  => ()
        } else if (polyOpen && entity == null) code match {
          case 8  => polyLayer = value
          case 70 => polyFlags = value.toInt
          case _  => ()
        } else if (entity != null) code match {
          case 8  => layer = value
          case 1  => text = Some(value)
          case 10 => xs += value.toDouble
          case 20 => xs += value.toDouble
          case 11 => x1 = value.toDouble
          case 21 => y1 = value.toDouble
          case 12 => x2 = value.toDouble
          case 22 => y2 = value.toDouble
          case 13 => x3 = value.toDouble
          case 23 => y3 = value.toDouble
          case 40 => radius = value.toDouble
          case 50 => ang0 = value.toDouble
          case 51 => ang1 = value.toDouble
          case 70 => flags = value.toInt
          case 90 => () // LWPOLYLINE vertex count — implied by the 10/20s
          case _  => ()
        }
      }
    }
    flush(); flushPoly()
    out.toSeq
  }

  // ----------------------------------------------------------------- write

  /** Serialize one partition's geometries as a minimal ENTITIES-only DXF
    * document. `layerOf` supplies the layer name per row.
    */
  private def entitiesDoc(rows: Iterator[(String, Geometry)]): String = {
    val sb = new StringBuilder
    sb ++= "0\nSECTION\n2\nENTITIES\n"
    def vtx(x: Double, y: Double): Unit =
      sb ++= s"10\n$x\n20\n$y\n"
    def lwpoly(layer: String, xy: Array[Double], closed: Boolean): Unit = {
      val n = xy.length / 2
      sb ++= s"0\nLWPOLYLINE\n8\n$layer\n90\n$n\n70\n${if (closed) 1 else 0}\n"
      var i = 0
      while (i < n) { vtx(xy(2 * i), xy(2 * i + 1)); i += 1 }
    }
    def emit(layer: String, g: Geometry): Unit = g match {
      case p: Point if !p.isEmpty =>
        sb ++= s"0\nPOINT\n8\n$layer\n"; vtx(p.x, p.y)
      case l: LineString if !l.isEmpty => lwpoly(layer, l.xy, closed = false)
      case p: Polygon if !p.isEmpty =>
        p.rings.foreach { r =>
          // DXF closed polylines omit the repeated closing vertex
          val open = if (r.length >= 4 && r(0) == r(r.length - 2) &&
            r(1) == r(r.length - 1)) r.dropRight(2) else r
          lwpoly(layer, open, closed = true)
        }
      case m: MultiPoint      => m.pts.foreach(emit(layer, _))
      case m: MultiLineString => m.lines.foreach(emit(layer, _))
      case m: MultiPolygon    => m.polys.foreach(emit(layer, _))
      case c: GeometryCollection => c.geoms.foreach(emit(layer, _))
      case _ => ()
    }
    rows.foreach { case (layer, g) => emit(layer, g) }
    sb ++= "0\nENDSEC\n0\nEOF\n"
    sb.toString
  }

  /** Directory dataset: one .dxf per partition, written task-side. */
  def writeDir(df: DataFrame, dir: String, geometryColumn: String = "geometry",
      layerColumn: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val conf = new GeoParquetIO.SerializableConf(spark.sessionState.newHadoopConf())
    val gi = df.schema.fieldIndex(geometryColumn)
    val li = layerColumn.map(df.schema.fieldIndex)
    val out = new Path(dir)
    val fs = out.getFileSystem(conf.value)
    fs.mkdirs(out)
    df.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val rows = it.flatMap { r =>
        if (r.isNullAt(gi)) None
        else Some((li.map(r.getString).getOrElse("0"),
          Wkb.read(r.getAs[Array[Byte]](gi))))
      }
      if (rows.hasNext) {
        val doc = entitiesDoc(rows)
        val p = new Path(dir, f"part-$pid%05d.dxf")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p)(
          _.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }
  }

  /** Single-file write (driver-assembled by format necessity, like the
    * single-file KML/GPX writers; `writeDir` is the bulk path).
    */
  def write(df: DataFrame, path: String, geometryColumn: String = "geometry",
      layerColumn: Option[String] = None): Unit = {
    val gi = df.schema.fieldIndex(geometryColumn)
    val li = layerColumn.map(df.schema.fieldIndex)
    val rows = df.collect().iterator.flatMap { r =>
      if (r.isNullAt(gi)) None
      else Some((li.map(r.getString).getOrElse("0"),
        Wkb.read(r.getAs[Array[Byte]](gi))))
    }
    val doc = entitiesDoc(rows)
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val os = fs.create(p, true)
    try os.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }
}
