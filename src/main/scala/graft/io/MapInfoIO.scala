package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, LineString, Measures, MultiLineString, MultiPoint,
  MultiPolygon, Point, Polygon, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** MapInfo Interchange Format (MIF/MID) read/write — pure JVM, no OGR
  * (reference `read_file` reaches MapInfo files through pyogrio's MapInfo
  * driver, `io/file.py:32-46`; the format is MapInfo's published text
  * interchange spec: a `.mif` file holding a header + geometry section and
  * a sibling `.mid` file holding one delimited attribute row per feature).
  *
  * Geometry sections supported: NONE, POINT, LINE, PLINE [MULTIPLE],
  * REGION, MULTIPOINT, RECT (read as its polygon). Style clauses (PEN,
  * BRUSH, SYMBOL, SMOOTH, CENTER) are skipped on read and not written.
  * REGION rings carry no winding contract in the spec, so rings are
  * classified by containment parity (a ring inside an odd number of other
  * rings is a hole, assigned to its smallest enclosing outer) — the same
  * rule OGR's mitab driver applies.
  *
  * Column types: Char(n)→string, Integer/Smallint→long, Float/Decimal→
  * double, Logical→boolean, Date→string verbatim (same policy as the
  * shapefile DBF reader).
  *
  * Scale shape: like the other text formats here, one `.mif` is one
  * document — non-splittable; `read` schedules one task per file and
  * `write` emits one MIF/MID pair per Spark partition task-side (never
  * through the driver).
  */
object MapInfoIO {

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
          .filter(_.getName.toLowerCase.endsWith(".mif"))
          .map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .mif files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    // schema + crs from the first file (all parts of one dataset share them)
    val (firstCols, firstCrs) = {
      val in = fs.open(new Path(files.head))
      try { val h = parseHeader(readAll(in)); (h.cols, h.crs) }
      finally in.close()
    }
    val schema = StructType(
      firstCols.map(c => StructField(c.name, c.sparkType)) :+
        StructField(geometryColumn, BinaryType))
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val mifIn = tfs.open(p)
        val mifText = try readAll(mifIn) finally mifIn.close()
        val midPath = sibling(p)
        val midText =
          if (midPath.exists(tfs.exists)) {
            val in = tfs.open(midPath.get)
            try Some(readAll(in)) finally in.close()
          } else None
        parseFile(mifText, midText)
      }
    val g = GeoDataFrame(spark.createDataFrame(rows, schema), geometryColumn)
    firstCrs.map(g.setCrs).getOrElse(g)
  }

  private def readAll(in: java.io.InputStream): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def sibling(mif: Path): Option[Path] = {
    val n = mif.getName
    val base = n.substring(0, n.length - 4)
    // .mid and .MID both occur in the wild
    Some(new Path(mif.getParent, base + (if (n.endsWith(".MIF")) ".MID" else ".mid")))
  }

  private final case class MifCol(name: String, mifType: String) {
    def sparkType: DataType = {
      val t = mifType.toLowerCase
      if (t.startsWith("char")) StringType
      else if (t.startsWith("integer") || t.startsWith("smallint")) LongType
      else if (t.startsWith("float") || t.startsWith("decimal")) DoubleType
      else if (t.startsWith("logical")) BooleanType
      else StringType // date and anything else, verbatim
    }
  }

  private final case class Header(cols: Seq[MifCol], delimiter: Char,
      crs: Option[String], dataStart: Int)

  /** Parses the MIF header (everything up to and including the DATA line).
    * Returns the column table, the MID delimiter, the CRS when the
    * CoordSys line is the WGS84 lat/lon form this writer emits, and the
    * character offset where the geometry section begins.
    */
  private def parseHeader(text: String): Header = {
    var delimiter = '\t' // spec default when no DELIMITER line
    var crs: Option[String] = None
    val cols = mutable.ArrayBuffer.empty[MifCol]
    var pos = 0
    var dataStart = -1
    def nextLine(): String = {
      if (pos >= text.length) return null
      val nl = text.indexOf('\n', pos)
      val line = if (nl < 0) text.substring(pos) else text.substring(pos, nl)
      pos = if (nl < 0) text.length else nl + 1
      line.stripSuffix("\r")
    }
    var line = nextLine()
    while (line != null && dataStart < 0) {
      val t = line.trim
      val u = t.toUpperCase
      if (u.startsWith("DELIMITER")) {
        val q = t.indexOf('"')
        if (q >= 0 && q + 1 < t.length) delimiter = t.charAt(q + 1)
      } else if (u.startsWith("COORDSYS")) {
        // only the geographic WGS84 form maps to an EPSG code here;
        // projected CoordSys clauses are dataset-specific and left unset
        val compact = u.replaceAll("\\s+", " ")
        if (compact.contains("EARTH PROJECTION 1, 104") ||
            compact.contains("EARTH PROJECTION 1,104"))
          crs = Some("EPSG:4326")
      } else if (u.startsWith("COLUMNS")) {
        val n = t.split("\\s+").last.toInt
        var i = 0
        while (i < n) {
          val cl = nextLine().trim
          val sp = cl.indexWhere(_.isWhitespace)
          cols += MifCol(cl.substring(0, sp), cl.substring(sp).trim)
          i += 1
        }
      } else if (u == "DATA") {
        dataStart = pos
      }
      if (dataStart < 0) line = nextLine()
    }
    require(dataStart >= 0, "MIF file has no DATA section")
    Header(cols.toSeq, delimiter, crs, dataStart)
  }

  private val StyleKeywords = Set("PEN", "BRUSH", "SYMBOL", "SMOOTH")

  private def parseFile(mifText: String, midText: Option[String]): Seq[Row] = {
    val h = parseHeader(mifText)
    val geoms = parseGeometries(mifText.substring(h.dataStart))
    val attrs: Seq[Seq[Any]] = midText match {
      case Some(mid) if h.cols.nonEmpty =>
        mid.split("\n").iterator.map(_.stripSuffix("\r")).filter(_.nonEmpty)
          .map(l => parseMidLine(l, h.delimiter, h.cols)).toSeq
      case _ => Seq.fill(geoms.length)(Seq.fill(h.cols.length)(null))
    }
    require(attrs.isEmpty || attrs.length == geoms.length,
      s"MID has ${attrs.length} rows but MIF has ${geoms.length} features")
    geoms.zipWithIndex.map { case (g, i) =>
      val a = if (attrs.isEmpty) Seq.fill(h.cols.length)(null: Any) else attrs(i)
      Row.fromSeq(a :+ (if (g == null) null else Wkb.write(g)))
    }
  }

  /** Whitespace-tokenized geometry-section parser: coordinates may be
    * split across lines freely, so the grammar is driven by keywords and
    * counts, never by line structure.
    */
  private def parseGeometries(body: String): Seq[Geometry] = {
    val toks = body.split("\\s+").filter(_.nonEmpty)
    var i = 0
    def num(): Double = { val v = toks(i).toDouble; i += 1; v }
    def int(): Int = { val v = toks(i).toInt; i += 1; v }
    def coords(n: Int): Array[Double] = {
      val a = new Array[Double](2 * n)
      var j = 0
      while (j < a.length) { a(j) = num(); j += 1 }
      a
    }
    val out = mutable.ArrayBuffer.empty[Geometry]
    while (i < toks.length) {
      toks(i).toUpperCase match {
        case "NONE" => i += 1; out += null
        case "POINT" => i += 1; out += Point(num(), num())
        case "LINE" => i += 1
          out += LineString(Array(num(), num(), num(), num()))
        case "PLINE" => i += 1
          val sections =
            if (toks(i).equalsIgnoreCase("MULTIPLE")) { i += 1; int() } else 1
          val parts = Array.fill(sections)(coords(int()))
          out += (if (sections == 1) LineString(parts(0))
                  else MultiLineString(parts.map(LineString(_))))
        case "REGION" => i += 1
          val nRings = int()
          out += assembleRegion(Array.fill(nRings)(closeRing(coords(int()))))
        case "MULTIPOINT" => i += 1
          val n = int()
          out += MultiPoint(Array.fill(n)(Point(num(), num())))
        case "RECT" => i += 1
          val (x1, y1, x2, y2) = (num(), num(), num(), num())
          val (xa, xb) = (math.min(x1, x2), math.max(x1, x2))
          val (ya, yb) = (math.min(y1, y2), math.max(y1, y2))
          out += Polygon(Array(Array(xa, ya, xb, ya, xb, yb, xa, yb, xa, ya)))
        case "CENTER" => i += 3 // CENTER x y (region label point) — skip
        case kw if StyleKeywords.contains(kw) =>
          i += 1
          // PEN (…) / BRUSH (…) / SYMBOL (…) carry a parenthesized arg
          // list (SMOOTH none); args may contain spaces
          if (kw != "SMOOTH" && i < toks.length && toks(i).startsWith("(")) {
            while (i < toks.length && !toks(i).endsWith(")")) i += 1
            i += 1
          }
        case other => throw new UnsupportedOperationException(
          s"MIF geometry keyword '$other' not supported " +
            "(supported: NONE POINT LINE PLINE REGION MULTIPOINT RECT)")
      }
    }
    out.toSeq
  }

  private[io] def closeRing(xy: Array[Double]): Array[Double] = {
    val n = xy.length
    if (n >= 4 && (xy(0) != xy(n - 2) || xy(1) != xy(n - 1)))
      xy ++ Array(xy(0), xy(1))
    else xy
  }

  /** Containment-parity ring classification: REGION carries no winding
    * contract, so a ring inside an odd number of the other rings is a
    * hole, assigned to its smallest enclosing outer.
    */
  private[io] def assembleRegion(rings: Array[Array[Double]]): Geometry = {
    if (rings.length == 1) return Polygon(rings)
    val depth = rings.indices.map { a =>
      rings.indices.count { b =>
        b != a && graft.geom.Predicates.pointInPolygon(
          rings(a)(0), rings(a)(1), Polygon(Array(rings(b)))) != graft.geom.Predicates.OUT
      }
    }
    val outerIdx = rings.indices.filter(depth(_) % 2 == 0)
    val holeIdx = rings.indices.filter(depth(_) % 2 == 1)
    if (outerIdx.isEmpty) return Polygon(rings) // degenerate: keep as-is
    val assigned = outerIdx.map(o => mutable.ArrayBuffer(rings(o))).toArray
    holeIdx.foreach { hi =>
      val containing = outerIdx.zipWithIndex.filter { case (oi, _) =>
        graft.geom.Predicates.pointInPolygon(
          rings(hi)(0), rings(hi)(1), Polygon(Array(rings(oi)))) != graft.geom.Predicates.OUT
      }
      if (containing.nonEmpty) {
        // smallest enclosing outer wins (innermost under parity nesting)
        val tgt = containing.minBy { case (oi, _) =>
          math.abs(Measures.signedRingArea(rings(oi)))
        }._2
        assigned(tgt) += rings(hi)
      } else assigned(0) += rings(hi)
    }
    if (assigned.length == 1) Polygon(assigned(0).toArray)
    else MultiPolygon(assigned.map(rs => Polygon(rs.toArray)))
  }

  /** One MID line → typed values. Char fields are quoted (doubled inner
    * quotes); everything else is bare text between delimiters.
    */
  private def parseMidLine(line: String, delim: Char, cols: Seq[MifCol]): Seq[Any] = {
    val raw = mutable.ArrayBuffer.empty[String]
    val quoted = mutable.ArrayBuffer.empty[Boolean]
    val sb = new StringBuilder
    var i = 0
    var inQuotes = false
    var sawQuote = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
          else inQuotes = false
        } else sb += c
      } else if (c == '"') { inQuotes = true; sawQuote = true }
      else if (c == delim) {
        raw += sb.result(); quoted += sawQuote; sb.clear(); sawQuote = false
      } else sb += c
      i += 1
    }
    raw += sb.result(); quoted += sawQuote
    cols.zipWithIndex.map { case (c, idx) =>
      val s = if (idx < raw.length) raw(idx).trim else ""
      c.sparkType match {
        case StringType =>
          // bare-empty field = null (this writer's null encoding);
          // a quoted empty string "" survives as the empty string
          if (idx >= raw.length || (raw(idx).isEmpty && !quoted(idx))) null
          else raw(idx)
        case LongType => if (s.isEmpty) null else java.lang.Long.valueOf(s.toLong)
        case DoubleType => if (s.isEmpty) null else java.lang.Double.valueOf(s.toDouble)
        case BooleanType =>
          if (s.isEmpty) null
          else java.lang.Boolean.valueOf(s.equalsIgnoreCase("T") || s.equalsIgnoreCase("true"))
        case _ => s
      }
    }
  }

  // ----------------------------------------------------------------- write

  /** Distributed write: one MIF/MID pair per partition, task-side (the
    * scale path — the driver never sees feature bytes). Attribute types:
    * string→Char(maxStringLen), int/long→Integer, float/double→Float,
    * boolean→Logical; geometry→the matching MIF section.
    */
  def write(gdf: GeoDataFrame, path: String, maxStringLen: Int = 254): Unit = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    val schema = df.schema
    val geomIdx = schema.fieldIndex(geomCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    attrs.foreach { case (f, _) =>
      require(Set[DataType](LongType, IntegerType, DoubleType, FloatType,
        BooleanType, StringType).contains(f.dataType),
        s"MIF write: unsupported attribute type ${f.dataType} for '${f.name}'")
    }
    val wgs84 = gdf.crs.exists(c => c.equalsIgnoreCase("EPSG:4326") || c == "4326")
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val pathStr = path

    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val taskConf = sconf.value
      val mifPath = new Path(pathStr, f"part-$pid%05d.mif")
      val midPath = new Path(pathStr, f"part-$pid%05d.mid")
      val tfs = mifPath.getFileSystem(taskConf)
      def fmt(v: Double): String = {
        val s = java.lang.Double.toString(v)
        if (s.endsWith(".0")) s.dropRight(2) else s
      }
      AtomicTaskFile.withOutput(tfs, mifPath) { mifOs =>
      AtomicTaskFile.withOutput(tfs, midPath) { midOs =>
        val mif = new java.io.OutputStreamWriter(
          new java.io.BufferedOutputStream(mifOs), "UTF-8")
        val mid = new java.io.OutputStreamWriter(
          new java.io.BufferedOutputStream(midOs), "UTF-8")
        mif.write("Version 300\nCharset \"Neutral\"\nDelimiter \",\"\n")
        if (wgs84) mif.write("CoordSys Earth Projection 1, 104\n")
        mif.write(s"Columns ${attrs.length}\n")
        attrs.foreach { case (f, _) =>
          val t = f.dataType match {
            case StringType => s"Char($maxStringLen)"
            case LongType | IntegerType => "Integer"
            case DoubleType | FloatType => "Float"
            case BooleanType => "Logical"
            case other => throw new IllegalStateException(other.toString)
          }
          mif.write(s"  ${f.name} $t\n")
        }
        mif.write("Data\n\n")
        it.foreach { row =>
          // MID row first (feature order pairs the two files)
          mid.write(attrs.map { case (f, idx) =>
            if (row.isNullAt(idx)) ""
            else f.dataType match {
              case StringType =>
                "\"" + row.getString(idx).replace("\"", "\"\"") + "\""
              case BooleanType => if (row.getBoolean(idx)) "T" else "F"
              case DoubleType => fmt(row.getDouble(idx))
              case FloatType => fmt(row.getFloat(idx).toDouble)
              case _ => row.get(idx).toString
            }
          }.mkString(","))
          mid.write("\n")
          if (row.isNullAt(geomIdx)) mif.write("NONE\n")
          else writeGeom(mif, Wkb.read(row.getAs[Array[Byte]](geomIdx)), fmt)
        }
        mif.flush(); mid.flush()
      } }
      Iterator.single(pid)
    }.count()
    ()
  }

  private def writeGeom(w: java.io.Writer, g: Geometry,
      fmt: Double => String): Unit = {
    def pts(xy: Array[Double]): Unit = {
      var i = 0
      while (i + 1 < xy.length) {
        w.write(s"${fmt(xy(i))} ${fmt(xy(i + 1))}\n"); i += 2
      }
    }
    g match {
      case Point(x, y, _) => w.write(s"Point ${fmt(x)} ${fmt(y)}\n")
      case MultiPoint(ps) =>
        w.write(s"Multipoint ${ps.length}\n")
        ps.foreach(p => w.write(s"${fmt(p.x)} ${fmt(p.y)}\n"))
      case l: LineString =>
        w.write(s"Pline ${l.xy.length / 2}\n"); pts(l.xy)
      case m: MultiLineString =>
        w.write(s"Pline Multiple ${m.lines.length}\n")
        m.lines.foreach { l => w.write(s"${l.xy.length / 2}\n"); pts(l.xy) }
      case p: Polygon =>
        w.write(s"Region ${p.rings.length}\n")
        p.rings.foreach { r => w.write(s"${r.length / 2}\n"); pts(r) }
      case m: MultiPolygon =>
        val rings = m.polys.flatMap(_.rings)
        w.write(s"Region ${rings.length}\n")
        rings.foreach { r => w.write(s"${r.length / 2}\n"); pts(r) }
      case other => throw new UnsupportedOperationException(
        s"MIF write: ${other.getClass.getSimpleName} has no MIF section " +
          "(supported: Point, MultiPoint, LineString, MultiLineString, Polygon, MultiPolygon)")
    }
  }
}
