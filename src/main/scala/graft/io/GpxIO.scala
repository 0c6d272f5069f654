package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, LineString, MultiLineString, Point, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** GPX 1.1 read/write — pure JVM via the JDK's StAX, no XML dependency
  * (reference `read_file` reaches GPX through pyogrio's GPX driver,
  * `io/file.py:32-46`; the format is the public GPX 1.1 schema,
  * www.topografix.com/GPX/1/1).
  *
  * Feature mapping follows the OGR driver's layer model collapsed into one
  * table with a `layer` discriminator:
  *   - `wpt`  → layer "waypoints", Point, `ele` populated when present
  *   - `rte`  → layer "routes",    LineString over `rtept`s
  *   - `trk`  → layer "tracks",    MultiLineString (one part per `trkseg`)
  * GPX coordinates are WGS84 lat/lon BY SPEC (attribute order lat,lon;
  * emitted as x=lon, y=lat), so reads attach EPSG:4326.
  *
  * Like the other single-document XML formats here (KML, GML), one file is
  * one XML tree — non-splittable; scale comes from file parallelism
  * (`write` emits one part per Spark partition task-side, `read` schedules
  * one task per file).
  */
object GpxIO {

  val schema: StructType = StructType(Seq(
    StructField("layer", StringType),
    StructField("name", StringType),
    StructField("desc", StringType),
    StructField("ele", DoubleType),
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
          .filter(_.getName.toLowerCase.endsWith(".gpx")).map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .gpx files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        try parseGpx(in) finally in.close()
      }
    val out = schema.fields.map {
      case f if f.name == "geometry" => f.copy(name = geometryColumn)
      case f => f
    }
    GeoDataFrame(
      spark.createDataFrame(rows, StructType(out.toIndexedSeq)), geometryColumn)
      .setCrs("EPSG:4326")
  }

  private def parseGpx(in: java.io.InputStream): Seq[Row] = {
    val fac = XMLInputFactory.newInstance()
    // no DTD/external entities: reading third-party files must not fetch
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val r = fac.createXMLStreamReader(in)
    val out = mutable.ArrayBuffer.empty[Row]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "wpt" => out += readWpt(r)
          case "rte" => out += readRte(r)
          case "trk" => out += readTrk(r)
          case _     =>
        }
      }
    } finally r.close()
    out.toSeq
  }

  private def latLon(r: XMLStreamReader): (Double, Double) = {
    val lat = java.lang.Double.parseDouble(r.getAttributeValue(null, "lat"))
    val lon = java.lang.Double.parseDouble(r.getAttributeValue(null, "lon"))
    (lat, lon)
  }

  /** Cursor ON `wpt`'s START_ELEMENT; returns with cursor on END_ELEMENT. */
  private def readWpt(r: XMLStreamReader): Row = {
    val (lat, lon) = latLon(r)
    var name: String = null; var desc: String = null
    var ele: java.lang.Double = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "name" if depth == 1 => name = r.getElementText
            case "desc" if depth == 1 => desc = r.getElementText
            case "ele" if depth == 1 =>
              ele = java.lang.Double.parseDouble(r.getElementText)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    Row("waypoints", name, desc, ele, Wkb.write(Point(lon, lat)))
  }

  private def readRte(r: XMLStreamReader): Row = {
    var name: String = null; var desc: String = null
    val xy = mutable.ArrayBuffer.empty[Double]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "name" if depth == 1 => name = r.getElementText
            case "desc" if depth == 1 => desc = r.getElementText
            case "rtept" =>
              val (lat, lon) = latLon(r); xy += lon; xy += lat
              depth += 1
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    require(xy.size >= 4, "gpx: rte with fewer than 2 rtept")
    Row("routes", name, desc, null, Wkb.write(LineString(xy.toArray)))
  }

  private def readTrk(r: XMLStreamReader): Row = {
    var name: String = null; var desc: String = null
    val segs = mutable.ArrayBuffer.empty[LineString]
    var cur: mutable.ArrayBuffer[Double] = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "name" if depth == 1 => name = r.getElementText
            case "desc" if depth == 1 => desc = r.getElementText
            case "trkseg" =>
              cur = mutable.ArrayBuffer.empty[Double]; depth += 1
            case "trkpt" if cur != null =>
              val (lat, lon) = latLon(r); cur += lon; cur += lat
              depth += 1
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          // closing a trkseg (back to trk depth): seal the segment
          if (depth == 1 && cur != null) {
            if (cur.size >= 4) segs += LineString(cur.toArray)
            cur = null
          }
        case _ =>
      }
    }
    require(segs.nonEmpty, "gpx: trk with no non-degenerate trkseg")
    Row("tracks", name, desc, null, Wkb.write(MultiLineString(segs.toArray)))
  }

  // ----------------------------------------------------------------- write

  /** One `part-NNNNN.gpx` per partition, written task-side. Geometry kind
    * selects the GPX feature: Point → wpt (with `ele` when the column is
    * present), LineString → rte, MultiLineString → trk (one trkseg per
    * part). Other geometry types are rejected — GPX has no polygon model.
    */
  def write(gdf: GeoDataFrame, path: String): Unit = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    val schema0 = df.schema
    val geomIdx = schema0.fieldIndex(geomCol)
    val nameIdx = schema0.fieldNames.indexOf("name")
    val descIdx = schema0.fieldNames.indexOf("desc")
    val eleIdx = schema0.fieldNames.indexOf("ele")
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
      val file = new Path(pathStr, f"part-$pid%05d.gpx")
      val tfs = file.getFileSystem(taskConf)
      def esc(s: String): String = s
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      def fmt(v: Double): String = {
        // shortest exact decimal: Double.toString never uses the locale
        val s = java.lang.Double.toString(v)
        if (s.endsWith(".0")) s.dropRight(2) else s
      }
      def nameDesc(row: Row): String = {
        val sb = new StringBuilder
        if (nameIdx >= 0 && !row.isNullAt(nameIdx))
          sb ++= s"<name>${esc(row.get(nameIdx).toString)}</name>"
        if (descIdx >= 0 && !row.isNullAt(descIdx))
          sb ++= s"<desc>${esc(row.get(descIdx).toString)}</desc>"
        sb.result()
      }
      AtomicTaskFile.withOutput(tfs, file) { os =>
        val w = new java.io.OutputStreamWriter(
          new java.io.BufferedOutputStream(os), "UTF-8")
        w.write("""<?xml version="1.0" encoding="UTF-8"?>""" + "\n")
        w.write("""<gpx version="1.1" creator="graft" xmlns="http://www.topografix.com/GPX/1/1">""" + "\n")
        it.foreach { row =>
          if (!row.isNullAt(geomIdx)) {
            val g = Wkb.read(row.getAs[Array[Byte]](geomIdx))
            g match {
              case Point(x, y, _) =>
                w.write(s"""<wpt lat="${fmt(y)}" lon="${fmt(x)}">""")
                if (eleIdx >= 0 && !row.isNullAt(eleIdx))
                  w.write(s"<ele>${fmt(row.getDouble(eleIdx))}</ele>")
                w.write(nameDesc(row))
                w.write("</wpt>\n")
              case l: LineString =>
                w.write("<rte>")
                w.write(nameDesc(row))
                var i = 0
                while (i + 1 < l.xy.length) {
                  w.write(s"""<rtept lat="${fmt(l.xy(i + 1))}" lon="${fmt(l.xy(i))}"/>""")
                  i += 2
                }
                w.write("</rte>\n")
              case m: MultiLineString =>
                w.write("<trk>")
                w.write(nameDesc(row))
                m.lines.foreach { l =>
                  w.write("<trkseg>")
                  var i = 0
                  while (i + 1 < l.xy.length) {
                    w.write(s"""<trkpt lat="${fmt(l.xy(i + 1))}" lon="${fmt(l.xy(i))}"/>""")
                    i += 2
                  }
                  w.write("</trkseg>")
                }
                w.write("</trk>\n")
              case other => throw new IllegalArgumentException(
                s"GPX cannot represent ${other.getClass.getSimpleName} " +
                  "(points/linestrings/multilinestrings only — no polygon model)")
            }
          }
        }
        w.write("</gpx>\n")
        w.flush()
      }
      Iterator.single(file.toString)
    }.collect()
    ()
  }
}
