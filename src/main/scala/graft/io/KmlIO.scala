package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, LineString, MultiLineString, MultiPoint, MultiPolygon,
  Point, Polygon, GeometryCollection, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** KML read/write — pure JVM via the JDK's StAX, no XML library dependency
  * (reference `read_file`/`to_file` reach KML through pyogrio's LIBKML/KML
  * drivers, `io/file.py:49-149`; the format is OGC KML 2.2, a public spec).
  *
  * A KML document is ONE XML tree — inherently non-splittable, like a
  * single-FeatureCollection GeoJSON (which this repo deliberately does not
  * split either). Scale comes from FILE parallelism: `write` emits one
  * `part-NNNNN.kml` per Spark partition task-side, and `read` schedules one
  * task per file — the same distribution contract OGR-based readers get.
  *
  * Schema is fixed, not inferred (no extra schema-discovery pass over the
  * data): `name` and `description` from the Placemark, every
  * `ExtendedData/Data` entry in a `props: map<string,string>` column
  * (ExtendedData is schemaless in KML — typed extraction is one
  * `element_at(props, 'key').cast(...)` away), and the geometry as WKB.
  * Point/LineString/Polygon (with inner rings)/MultiGeometry all map; KML
  * coordinates are lon,lat[,alt] in CRS84 per spec, so reads attach
  * OGC:CRS84.
  */
object KmlIO {

  val schema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("props", MapType(StringType, StringType)),
    StructField("geometry", BinaryType)))

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
          .filter(_.getName.toLowerCase.endsWith(".kml")).map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .kml files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        try parsePlacemarks(in) finally in.close()
      }
    val out = schema.fields.map {
      case f if f.name == "geometry" => f.copy(name = geometryColumn)
      case f => f
    }
    GeoDataFrame(
      spark.createDataFrame(rows, StructType(out.toIndexedSeq)), geometryColumn)
      .setCrs("OGC:CRS84")
  }

  /** StAX walk of one document: collects every Placemark. Only the element
    * names the mapping needs are inspected; unknown elements (styles,
    * folders, camera, ...) stream past untouched.
    */
  private def parsePlacemarks(in: java.io.InputStream): Seq[Row] = {
    val fac = XMLInputFactory.newInstance()
    // no DTD/external-entity resolution: KML never needs it and reading
    // third-party files must not trigger network or file fetches
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = fac.createXMLStreamReader(in)
    val out = mutable.ArrayBuffer.empty[Row]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Placemark") out += readPlacemark(r)
      }
    } finally r.close()
    out.toSeq
  }

  private def readPlacemark(r: XMLStreamReader): Row = {
    var name: String = null
    var description: String = null
    val props = mutable.LinkedHashMap.empty[String, String]
    var geom: Geometry = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "name" if depth == 1 => name = r.getElementText
            case "description" if depth == 1 => description = r.getElementText
            case "ExtendedData" => readExtendedData(r, props)
            case g @ ("Point" | "LineString" | "Polygon" | "MultiGeometry") =>
              geom = readGeometry(r, g)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
        case _ =>
      }
    }
    Row(name, description,
      if (props.isEmpty) null else props.toMap,
      if (geom == null) null else Wkb.write(geom))
  }

  private def readExtendedData(r: XMLStreamReader,
      props: mutable.Map[String, String]): Unit = {
    var depth = 1
    var dataName: String = null
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Data" =>
              dataName = r.getAttributeValue(null, "name")
              depth += 1
            case "value" if dataName != null =>
              props(dataName) = r.getElementText
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (depth == 1) dataName = null
        case _ =>
      }
    }
  }

  /** Parse one geometry element (cursor ON its START_ELEMENT); returns with
    * the cursor on its END_ELEMENT.
    */
  private def readGeometry(r: XMLStreamReader, kind: String): Geometry = kind match {
    case "Point" =>
      val xy = coordsIn(r, "Point")
      Point(xy(0), xy(1))
    case "LineString" =>
      LineString(coordsIn(r, "LineString"))
    case "Polygon" => readPolygon(r)
    case "MultiGeometry" =>
      val parts = mutable.ArrayBuffer.empty[Geometry]
      var depth = 1
      while (depth > 0 && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case g @ ("Point" | "LineString" | "Polygon" | "MultiGeometry") =>
                parts += readGeometry(r, g)
              case _ => depth += 1
            }
          case XMLStreamConstants.END_ELEMENT => depth -= 1
          case _ =>
        }
      }
      // homogeneous parts collapse to the Multi* type (KML MultiGeometry
      // is what OGR maps geopandas Multi* columns to)
      val arr = parts.toArray
      if (arr.nonEmpty && arr.forall(_.isInstanceOf[Point]))
        MultiPoint(arr.map(_.asInstanceOf[Point]))
      else if (arr.nonEmpty && arr.forall(_.isInstanceOf[LineString]))
        MultiLineString(arr.map(_.asInstanceOf[LineString]))
      else if (arr.nonEmpty && arr.forall(_.isInstanceOf[Polygon]))
        MultiPolygon(arr.map(_.asInstanceOf[Polygon]))
      else GeometryCollection(arr)
  }

  private def readPolygon(r: XMLStreamReader): Polygon = {
    val rings = mutable.ArrayBuffer.empty[Array[Double]]
    var outer: Array[Double] = null
    var inOuter = false
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "outerBoundaryIs" => inOuter = true; depth += 1
            case "innerBoundaryIs" => inOuter = false; depth += 1
            case "coordinates" =>
              val xy = parseCoords(r.getElementText)
              if (inOuter) outer = xy else rings += xy
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    require(outer != null, "kml: Polygon without outerBoundaryIs")
    Polygon(Array(outer) ++ rings)
  }

  /** Text of the single `coordinates` child of the current element; cursor
    * ends on the parent's END_ELEMENT.
    */
  private def coordsIn(r: XMLStreamReader, parent: String): Array[Double] = {
    var xy: Array[Double] = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getLocalName == "coordinates") xy = parseCoords(r.getElementText)
          else depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    require(xy != null, s"kml: $parent without coordinates")
    xy
  }

  /** "lon,lat[,alt] lon,lat[,alt] ..." -> flat xy (altitude dropped; the
    * 2D engine contract, same as the shapefile reader).
    */
  private def parseCoords(text: String): Array[Double] = {
    val tuples = text.trim.split("\\s+").filter(_.nonEmpty)
    val xy = new Array[Double](2 * tuples.length)
    var i = 0
    while (i < tuples.length) {
      val parts = tuples(i).split(",")
      require(parts.length >= 2, s"kml: bad coordinate tuple '${tuples(i)}'")
      // locale-independent: Java's Double.parseDouble never uses the
      // default locale (the dBASE writer bug class, ShapefileIO.scala:478)
      xy(2 * i) = java.lang.Double.parseDouble(parts(0))
      xy(2 * i + 1) = java.lang.Double.parseDouble(parts(1))
      i += 1
    }
    xy
  }

  // ----------------------------------------------------------------- write

  /** One `part-NNNNN.kml` per partition, written task-side. Non-geometry
    * attribute columns become `ExtendedData/Data` string values (KML's
    * schemaless attribute model); null attributes are omitted per row.
    */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    val geomIdx = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    attrs.foreach { case (f, _) =>
      require(Set[DataType](StringType, LongType, IntegerType, DoubleType,
        FloatType, BooleanType, ShortType, ByteType).contains(f.dataType),
        s"kml write: unsupported column type ${f.dataType} for '${f.name}'")
    }
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
        val p = new Path(f"$pathStr%s/part-$pid%05d.kml")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p) { os =>
          val w = new java.io.OutputStreamWriter(
            new java.io.BufferedOutputStream(os, 1 << 20), "UTF-8")
          w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
          w.write("\n<kml xmlns=\"http://www.opengis.net/kml/2.2\">\n<Document>\n")
          it.foreach { row =>
            w.write("<Placemark>\n")
            val data = attrMeta.flatMap { case (n, i) =>
              Option(row.get(i)).map(v => (n, v.toString))
            }
            if (data.nonEmpty) {
              w.write("<ExtendedData>")
              data.foreach { case (n, v) =>
                w.write(s"""<Data name="${esc(n)}"><value>${esc(v)}</value></Data>""")
              }
              w.write("</ExtendedData>\n")
            }
            val wkb = row.get(geomIdx).asInstanceOf[Array[Byte]]
            if (wkb != null) writeGeometry(w, Wkb.read(wkb))
            w.write("</Placemark>\n")
          }
          w.write("</Document>\n</kml>\n")
          w.flush()
        }
      }
    }
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(xy: Array[Double]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < xy.length / 2) {
      if (i > 0) sb.append(' ')
      // Double.toString is locale-independent and shortest-roundtrip
      sb.append(xy(2 * i)).append(',').append(xy(2 * i + 1))
      i += 1
    }
    sb.toString
  }

  private def writeGeometry(w: java.io.Writer, g: Geometry): Unit = g match {
    case p: Point =>
      w.write(s"<Point><coordinates>${p.x},${p.y}</coordinates></Point>\n")
    case l: LineString =>
      w.write(s"<LineString><coordinates>${fmt(l.xy)}</coordinates></LineString>\n")
    case pg: Polygon =>
      w.write("<Polygon><outerBoundaryIs><LinearRing><coordinates>")
      w.write(fmt(pg.rings(0)))
      w.write("</coordinates></LinearRing></outerBoundaryIs>")
      var i = 1
      while (i < pg.rings.length) {
        w.write("<innerBoundaryIs><LinearRing><coordinates>")
        w.write(fmt(pg.rings(i)))
        w.write("</coordinates></LinearRing></innerBoundaryIs>")
        i += 1
      }
      w.write("</Polygon>\n")
    case mp: MultiPoint =>
      w.write("<MultiGeometry>\n")
      mp.pts.foreach(writeGeometry(w, _))
      w.write("</MultiGeometry>\n")
    case ml: MultiLineString =>
      w.write("<MultiGeometry>\n")
      ml.lines.foreach(writeGeometry(w, _))
      w.write("</MultiGeometry>\n")
    case mpg: MultiPolygon =>
      w.write("<MultiGeometry>\n")
      mpg.polys.foreach(writeGeometry(w, _))
      w.write("</MultiGeometry>\n")
    case gc: GeometryCollection =>
      w.write("<MultiGeometry>\n")
      gc.geoms.foreach(writeGeometry(w, _))
      w.write("</MultiGeometry>\n")
  }
}
