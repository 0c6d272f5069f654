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
  * `entity` type name. BLOCKS/INSERT expansion is performed like OGR's
  * default: block definitions parse through the same entity state
  * machine, INSERT placements apply base-shift -> scale (41/42) ->
  * rotate (50) -> translate, legacy 70/71 array inserts replicate on the
  * rotated grid, nested inserts compose placements (cycle-bounded at
  * depth 8), and content on layer "0" adopts the INSERT's layer (the
  * by-block convention).
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
        // cheap substring probe skips the BLOCKS tokenization pass for the
        // common blockless survey/exchange file (a false positive only
        // costs the harmless extra parse)
        val blocks =
          if (body.contains("BLOCKS")) parseBlocks(body)
          else Map.empty[String, Block]
        val (ents, ins) = parseEntitiesWithInserts(body)
        val expanded = ents ++ ins.flatMap(instantiate(_, blocks, 0))
        expanded.map { e =>
          Row(e.layer, e.entity, e.text.orNull, Wkb.write(e.geom))
        }
      }
    GeoDataFrame(spark.createDataFrame(rows, schema), geometryColumn)
  }

  private[io] final case class Ent(layer: String, entity: String,
      text: Option[String], geom: Geometry)

  /** An INSERT placement: block reference + the affine placement params
    * (translate/scale/rotate, plus the legacy array-insert grid). */
  private[io] final case class Insert(layer: String, block: String,
      x: Double, y: Double, sx: Double, sy: Double, rotDeg: Double,
      cols: Int = 1, rows: Int = 1, colSp: Double = 0.0, rowSp: Double = 0.0)

  /** A BLOCK definition: base point + content (and any nested INSERTs). */
  private[io] final case class Block(baseX: Double, baseY: Double,
      ents: Seq[Ent], inserts: Seq[Insert])

  /** Parse the BLOCKS section into named definitions. Block bodies share
    * the ENTITIES grammar, so each body is re-parsed through the entity
    * state machine (wrapped in a synthetic ENTITIES section).
    */
  private[io] def parseBlocks(body: String): Map[String, Block] = {
    val it = pairs(body)
    var section = ""
    var inBlocks = false
    var inBlock = false
    var headerMode = false
    var name: String = null
    var bx = 0.0; var by = 0.0
    val content = new StringBuilder
    val out = mutable.Map.empty[String, Block]
    def finish(): Unit = {
      if (inBlock && name != null) {
        val (ents, ins) = parseEntitiesWithInserts(
          "0\nSECTION\n2\nENTITIES\n" + content.result() + "0\nENDSEC\n0\nEOF\n")
        out(name) = Block(bx, by, ents, ins)
      }
      inBlock = false; headerMode = false; name = null; bx = 0.0; by = 0.0
      content.clear()
    }
    while (it.hasNext) {
      val (code, value) = it.next()
      if (code == 2 && section == "pending") {
        section = value; inBlocks = value == "BLOCKS"
      } else if (code == 0) value match {
        case "SECTION" => section = "pending"
        case "ENDSEC"  => finish(); inBlocks = false; section = ""
        case "EOF"     => finish()
        case "BLOCK" if inBlocks => finish(); inBlock = true; headerMode = true
        case "ENDBLK" if inBlocks => finish()
        case v if inBlock =>
          headerMode = false
          content.append("0\n").append(v).append('\n')
        case _ => ()
      } else if (inBlock) {
        if (headerMode) code match {
          case 2  => name = value
          case 10 => bx = value.toDouble
          case 20 => by = value.toDouble
          case _  => ()
        } else content.append(code).append('\n').append(value).append('\n')
      }
    }
    finish()
    out.toMap
  }

  /** Instantiate one INSERT: block-local coordinates are shifted to the
    * base point, scaled, rotated, then translated to the insertion point
    * (per copy for legacy 70/71 array inserts, the grid offsets living in
    * the insert's rotated+scaled frame). Entities on layer "0" adopt the
    * INSERT's layer (the DXF by-block convention); nested INSERTs compose
    * placements and are bounded by `depth` against definition cycles.
    */
  private[io] def instantiate(ins: Insert, blocks: Map[String, Block],
      depth: Int): Seq[Ent] = {
    if (depth > 8) return Nil
    blocks.get(ins.block).toSeq.flatMap { b =>
      // right-angle rotations (the overwhelmingly common CAD case) stay
      // exact instead of picking up cos(pi/2) ~ 6e-17 noise
      val rot = ins.rotDeg % 360.0
      val (cos, sin) =
        if (rot % 90.0 == 0.0) {
          val q = ((rot / 90.0).toInt % 4 + 4) % 4
          q match {
            case 0 => (1.0, 0.0); case 1 => (0.0, 1.0)
            case 2 => (-1.0, 0.0); case _ => (0.0, -1.0)
          }
        } else (math.cos(math.toRadians(rot)), math.sin(math.toRadians(rot)))
      (0 until math.max(1, ins.cols)).flatMap { c =>
        (0 until math.max(1, ins.rows)).flatMap { r =>
          val ox = c * ins.colSp * ins.sx
          val oy = r * ins.rowSp * ins.sy
          def tf(x: Double, y: Double): (Double, Double) = {
            val dx = (x - b.baseX) * ins.sx + ox
            val dy = (y - b.baseY) * ins.sy + oy
            (ins.x + dx * cos - dy * sin, ins.y + dx * sin + dy * cos)
          }
          val direct = b.ents.map { e =>
            e.copy(layer = if (e.layer == "0") ins.layer else e.layer,
              geom = e.geom.mapCoords(tf))
          }
          // nested inserts instantiate in THEIR OWN frame first, then the
          // parent transform maps the produced coordinates — composing the
          // placement parameters instead (sx*sx, rot+rot) is wrong under
          // non-uniform or mirrored parent scale combined with child
          // rotation (R_p·S_p·R_c ≠ R_p·R_c·S_p)
          val nested = b.inserts.flatMap { ni =>
            instantiate(ni, blocks, depth + 1).map { e =>
              e.copy(layer = if (e.layer == "0") ins.layer else e.layer,
                geom = e.geom.mapCoords(tf))
            }
          }
          direct ++ nested
        }
      }
    }
  }

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

  private[io] def parseEntities(body: String): Seq[Ent] =
    parseEntitiesWithInserts(body)._1

  private[io] def parseEntitiesWithInserts(
      body: String): (Seq[Ent], Seq[Insert]) = {
    val it = pairs(body)
    val out = mutable.ArrayBuffer.empty[Ent]
    val inserts = mutable.ArrayBuffer.empty[Insert]
    // INSERT accumulator (code 2 name, 41/42 scales, 70/71 grid, 44/45 gaps)
    var insName: String = null
    var insSx = 1.0; var insSy = 1.0
    var insCols = 1; var insRows = 1
    var insColSp = 0.0; var insRowSp = 0.0
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
        case "INSERT" if xs.size >= 2 && insName != null =>
          // rotation rides in on code 50 (the ang0 slot)
          inserts += Insert(layer, insName, xs(0), xs(1), insSx, insSy,
            ang0, insCols, insRows, insColSp, insRowSp)
          None
        case _ => None
      }
      g.foreach(gg => out += Ent(layer, e, if (e == "TEXT" || e == "MTEXT") text else None, gg))
      layer = "0"; text = None; flags = 0
      xs.clear()
      x1 = Double.NaN; y1 = Double.NaN; x2 = Double.NaN; y2 = Double.NaN
      x3 = Double.NaN; y3 = Double.NaN
      radius = Double.NaN; ang0 = 0.0; ang1 = 360.0
      insName = null; insSx = 1.0; insSy = 1.0
      insCols = 1; insRows = 1; insColSp = 0.0; insRowSp = 0.0
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
          case 2  => if (entity == "INSERT") insName = value
          case 10 => xs += value.toDouble
          case 20 => xs += value.toDouble
          case 11 => x1 = value.toDouble
          case 21 => y1 = value.toDouble
          case 12 => x2 = value.toDouble
          case 22 => y2 = value.toDouble
          case 13 => x3 = value.toDouble
          case 23 => y3 = value.toDouble
          case 40 => radius = value.toDouble
          case 41 => if (entity == "INSERT") insSx = value.toDouble
          case 42 => if (entity == "INSERT") insSy = value.toDouble
          case 44 => if (entity == "INSERT") insColSp = value.toDouble
          case 45 => if (entity == "INSERT") insRowSp = value.toDouble
          case 50 => ang0 = value.toDouble
          case 51 => ang1 = value.toDouble
          case 70 => if (entity == "INSERT") insCols = value.toInt else flags = value.toInt
          case 71 => if (entity == "INSERT") insRows = value.toInt
          case 90 => () // LWPOLYLINE vertex count — implied by the 10/20s
          case _  => ()
        }
      }
    }
    flush(); flushPoly()
    (out.toSeq, inserts.toSeq)
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
