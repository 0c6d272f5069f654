package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, GeometryCollection, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** GML read/write — pure JVM via the JDK's StAX (reference `read_file`/
  * `to_file` reach GML through pyogrio's GML driver, `io/file.py:49-149`;
  * the format is OGC GML, a public spec).
  *
  * Like KML and single-document GeoJSON, a GML document is ONE XML tree —
  * non-splittable — so scale comes from FILE parallelism: `write` emits one
  * `part-NNNNN.gml` per partition task-side and `read` schedules one task
  * per file.
  *
  * Read accepts both encodings in the wild: GML 3 `pos`/`posList` with
  * `exterior`/`interior` rings, and GML 2 `coordinates` with
  * `outerBoundaryIs`/`innerBoundaryIs`. Features are the elements directly
  * inside `featureMember`/`member`/`featureMembers`; their simple-text child
  * elements become a `props: map<string,string>` column (GML application
  * schemas are arbitrary — typed extraction is `element_at(props, k).cast`),
  * the first geometry element found becomes the WKB geometry column, and
  * `gml:id` is surfaced as props key `gml_id`. `boundedBy` envelopes are
  * skipped. Write emits the OGR-flavored layout (an `ogr:FeatureCollection`
  * of `gml:featureMember`s) with GML 3.2 geometry encoding.
  */
object GmlIO {

  val schema: StructType = StructType(Seq(
    StructField("props", MapType(StringType, StringType)),
    StructField("geometry", BinaryType)))

  private val GeomNames = Set("Point", "LineString", "Polygon", "Curve",
    "MultiPoint", "MultiCurve", "MultiLineString", "MultiSurface",
    "MultiPolygon", "MultiGeometry")

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
          .filter(_.getName.toLowerCase.endsWith(".gml")).map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .gml files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        try parseFeatures(in) finally in.close()
      }
    val out = schema.fields.map {
      case f if f.name == "geometry" => f.copy(name = geometryColumn)
      case f => f
    }
    GeoDataFrame(
      spark.createDataFrame(rows, StructType(out.toIndexedSeq)), geometryColumn)
  }

  private def parseFeatures(in: java.io.InputStream): Seq[Row] = {
    val fac = XMLInputFactory.newInstance()
    // no DTD/external-entity resolution (untrusted third-party files)
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = fac.createXMLStreamReader(in)
    val out = mutable.ArrayBuffer.empty[Row]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          Set("featureMember", "member", "featureMembers")(r.getLocalName)) {
          // each DIRECT child element is one feature (featureMembers may
          // hold several)
          var depth = 1
          while (depth > 0 && r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT => out += readFeature(r)
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ =>
            }
          }
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Cursor ON the feature's START_ELEMENT; returns with the cursor on its
    * END_ELEMENT.
    */
  private def readFeature(r: XMLStreamReader): Row = {
    val props = mutable.LinkedHashMap.empty[String, String]
    var geom: Geometry = null
    val id = r.getAttributeValue("http://www.opengis.net/gml/3.2", "id") match {
      case null => r.getAttributeValue("http://www.opengis.net/gml", "id") match {
        case null => r.getAttributeValue(null, "fid")
        case v => v
      }
      case v => v
    }
    if (id != null) props("gml_id") = id
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "boundedBy" => skipElement(r)
            case g if GeomNames(g) =>
              if (geom == null) geom = readGeometry(r, g) else skipElement(r)
            case name =>
              // property wrapper: either simple text, or a wrapper holding a
              // geometry element (e.g. ogr:geometryProperty)
              val inner = readPropertyOrGeometry(r)
              inner match {
                case Left(text) => if (text != null) props(name) = text
                case Right(g) => if (geom == null) geom = g
              }
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
        case _ =>
      }
    }
    Row(if (props.isEmpty) null else props.toMap,
      if (geom == null) null else Wkb.write(geom))
  }

  /** Cursor ON a non-geometry child element. Captures its text content, or
    * the geometry nested one level inside it. Returns with the cursor on
    * its END_ELEMENT.
    */
  private def readPropertyOrGeometry(r: XMLStreamReader): Either[String, Geometry] = {
    val text = new StringBuilder
    var geom: Geometry = null
    var sawChild = false
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          sawChild = true
          r.getLocalName match {
            case g if GeomNames(g) && geom == null => geom = readGeometry(r, g)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case _ =>
      }
    }
    if (geom != null) Right(geom)
    else if (sawChild) Left(null) // structured non-geometry content: skip
    else Left(text.toString.trim match { case "" => null; case t => t })
  }

  private def skipElement(r: XMLStreamReader): Unit = {
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
  }

  /** Parse one geometry element (cursor ON its START_ELEMENT); returns with
    * the cursor on its END_ELEMENT.
    */
  private def readGeometry(r: XMLStreamReader, kind: String): Geometry = kind match {
    case "Point" =>
      val xy = coordsIn(r)
      if (xy.isEmpty) Point.empty else Point(xy(0), xy(1))
    case "LineString" | "Curve" => LineString(coordsIn(r))
    case "Polygon" => readPolygon(r)
    case "MultiPoint" =>
      MultiPoint(readMembers(r).map(_.asInstanceOf[Point]).toArray)
    case "MultiCurve" | "MultiLineString" =>
      MultiLineString(readMembers(r).map(_.asInstanceOf[LineString]).toArray)
    case "MultiSurface" | "MultiPolygon" =>
      MultiPolygon(readMembers(r).map(_.asInstanceOf[Polygon]).toArray)
    case "MultiGeometry" =>
      val parts = readMembers(r).toArray
      if (parts.nonEmpty && parts.forall(_.isInstanceOf[Point]))
        MultiPoint(parts.map(_.asInstanceOf[Point]))
      else if (parts.nonEmpty && parts.forall(_.isInstanceOf[LineString]))
        MultiLineString(parts.map(_.asInstanceOf[LineString]))
      else if (parts.nonEmpty && parts.forall(_.isInstanceOf[Polygon]))
        MultiPolygon(parts.map(_.asInstanceOf[Polygon]))
      else GeometryCollection(parts)
  }

  /** Child geometries of a Multi* container (pointMember, curveMember,
    * surfaceMember, geometryMember, and the plural *Members forms).
    */
  private def readMembers(r: XMLStreamReader): Seq[Geometry] = {
    val parts = mutable.ArrayBuffer.empty[Geometry]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case g if GeomNames(g) => parts += readGeometry(r, g)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    parts.toSeq
  }

  private def readPolygon(r: XMLStreamReader): Polygon = {
    var outer: Array[Double] = null
    val holes = mutable.ArrayBuffer.empty[Array[Double]]
    var inOuter = true
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "exterior" | "outerBoundaryIs" => inOuter = true; depth += 1
            case "interior" | "innerBoundaryIs" => inOuter = false; depth += 1
            case "posList" | "coordinates" =>
              val xy = parseCoords(r.getElementText, r.getLocalName == "coordinates")
              if (inOuter && outer == null) outer = xy else holes += xy
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    require(outer != null, "gml: Polygon without exterior ring")
    Polygon(Array(outer) ++ holes)
  }

  /** Coordinates of the current geometry element: first `pos`, `posList`, or
    * `coordinates` child at any depth (GML 3 Curve wraps posList in
    * segments/LineStringSegment). Cursor ends on the geometry's END_ELEMENT.
    */
  private def coordsIn(r: XMLStreamReader): Array[Double] = {
    var xy: Array[Double] = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "pos" | "posList" if xy == null =>
              xy = parseCoords(r.getElementText, gml2 = false)
            case "coordinates" if xy == null =>
              xy = parseCoords(r.getElementText, gml2 = true)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    if (xy == null) Array.empty else xy
  }

  /** GML 3 posList: "x y x y ..." (whitespace-separated scalars).
    * GML 2 coordinates: "x,y x,y ..." (comma tuples, space-separated).
    */
  private def parseCoords(text: String, gml2: Boolean): Array[Double] = {
    val t = text.trim
    if (t.isEmpty) return Array.empty
    if (gml2) {
      val tuples = t.split("\\s+").filter(_.nonEmpty)
      val xy = new Array[Double](2 * tuples.length)
      var i = 0
      while (i < tuples.length) {
        val parts = tuples(i).split(",")
        require(parts.length >= 2, s"gml: bad coordinate tuple '${tuples(i)}'")
        xy(2 * i) = java.lang.Double.parseDouble(parts(0))
        xy(2 * i + 1) = java.lang.Double.parseDouble(parts(1))
        i += 1
      }
      xy
    } else {
      val scalars = t.split("\\s+").filter(_.nonEmpty)
      require(scalars.length % 2 == 0,
        s"gml: odd scalar count ${scalars.length} in posList (3D not supported)")
      val xy = new Array[Double](scalars.length)
      var i = 0
      while (i < scalars.length) {
        xy(i) = java.lang.Double.parseDouble(scalars(i))
        i += 1
      }
      xy
    }
  }

  // ----------------------------------------------------------------- write

  /** One `part-NNNNN.gml` per partition, task-side: an OGR-flavored
    * `ogr:FeatureCollection` of `gml:featureMember`s with GML 3.2 geometry
    * encoding. Attribute columns become simple-text child elements; null
    * attributes are omitted per row.
    */
  def write(gdf: GeoDataFrame, path: String, featureName: String = "feature"): Unit = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    val geomIdx = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    attrs.foreach { case (f, _) =>
      require(Set[DataType](StringType, LongType, IntegerType, DoubleType,
        FloatType, BooleanType, ShortType, ByteType).contains(f.dataType),
        s"gml write: unsupported column type ${f.dataType} for '${f.name}'")
    }
    require(featureName.matches("[A-Za-z_][A-Za-z0-9_.-]*"),
      s"gml write: '$featureName' is not a valid XML element name")
    val conf = new GeoParquetIO.SerializableConf(df.sparkSession.sessionState.newHadoopConf())
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    fs.delete(root, true)
    fs.mkdirs(root)
    val pathStr = path
    val attrMeta = attrs.map { case (f, i) => (f.name, i) }
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(f"$pathStr%s/part-$pid%05d.gml")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p) { os =>
          val w = new java.io.OutputStreamWriter(
            new java.io.BufferedOutputStream(os, 1 << 20), "UTF-8")
          w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
          w.write("\n<ogr:FeatureCollection xmlns:ogr=\"http://ogr.maptools.org/\" " +
            "xmlns:gml=\"http://www.opengis.net/gml/3.2\">\n")
          var n = 0L
          it.foreach { row =>
            w.write("<gml:featureMember>\n")
            w.write(s"""<ogr:$featureName gml:id="F$pid-$n">""")
            attrMeta.foreach { case (name, i) =>
              val v = row.get(i)
              if (v != null)
                w.write(s"<ogr:${escName(name)}>${esc(v.toString)}</ogr:${escName(name)}>")
            }
            val wkb = row.get(geomIdx).asInstanceOf[Array[Byte]]
            if (wkb != null) {
              w.write("<ogr:geometryProperty>")
              writeGeometry(w, Wkb.read(wkb))
              w.write("</ogr:geometryProperty>")
            }
            w.write(s"</ogr:$featureName>\n</gml:featureMember>\n")
            n += 1
          }
          w.write("</ogr:FeatureCollection>\n")
          w.flush()
        }
      }
    }
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escName(s: String): String = {
    require(s.matches("[A-Za-z_][A-Za-z0-9_.-]*"),
      s"gml write: column name '$s' is not a valid XML element name")
    s
  }

  private def posList(xy: Array[Double]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < xy.length) {
      if (i > 0) sb.append(' ')
      sb.append(xy(i)) // Double.toString: locale-independent
      i += 1
    }
    sb.toString
  }

  private def writeGeometry(w: java.io.Writer, g: Geometry): Unit = g match {
    case p: Point =>
      w.write(s"<gml:Point><gml:pos>${p.x} ${p.y}</gml:pos></gml:Point>")
    case l: LineString =>
      w.write(s"<gml:LineString><gml:posList>${posList(l.xy)}</gml:posList></gml:LineString>")
    case pg: Polygon =>
      w.write("<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>")
      w.write(posList(pg.rings(0)))
      w.write("</gml:posList></gml:LinearRing></gml:exterior>")
      var i = 1
      while (i < pg.rings.length) {
        w.write("<gml:interior><gml:LinearRing><gml:posList>")
        w.write(posList(pg.rings(i)))
        w.write("</gml:posList></gml:LinearRing></gml:interior>")
        i += 1
      }
      w.write("</gml:Polygon>")
    case mp: MultiPoint =>
      w.write("<gml:MultiPoint>")
      mp.pts.foreach { p =>
        w.write("<gml:pointMember>"); writeGeometry(w, p); w.write("</gml:pointMember>")
      }
      w.write("</gml:MultiPoint>")
    case ml: MultiLineString =>
      w.write("<gml:MultiCurve>")
      ml.lines.foreach { l =>
        w.write("<gml:curveMember>"); writeGeometry(w, l); w.write("</gml:curveMember>")
      }
      w.write("</gml:MultiCurve>")
    case mpg: MultiPolygon =>
      w.write("<gml:MultiSurface>")
      mpg.polys.foreach { p =>
        w.write("<gml:surfaceMember>"); writeGeometry(w, p); w.write("</gml:surfaceMember>")
      }
      w.write("</gml:MultiSurface>")
    case gc: GeometryCollection =>
      w.write("<gml:MultiGeometry>")
      gc.geoms.foreach { p =>
        w.write("<gml:geometryMember>"); writeGeometry(w, p); w.write("</gml:geometryMember>")
      }
      w.write("</gml:MultiGeometry>")
  }
}
