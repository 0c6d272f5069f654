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
  *
  * Application schemas (r13, closing the last `read_file` surface gap vs
  * OGR's GML driver, ref `io/file.py:49-149`):
  *   - nested complex properties flatten to dotted keys
  *     (`<address><city>X</city></address>` → `props["address.city"]="X"`),
  *     matching OGR's flattened-field behavior;
  *   - documents WITHOUT `featureMember` wrappers (features as direct
  *     children of the root, the WFS-less app-schema layout) fall back to a
  *     second parse that treats every root child carrying a geometry
  *     descendant or simple property as one feature;
  *   - `srsName` axis order: urn-form EPSG geographic CRS
  *     (`urn:ogc:def:crs:EPSG::4326` and the 4xxx geodetic range) store
  *     lat/lon per the GML 3 spec — coordinates are swapped back to x=lon
  *     on read, per geometry element, overridable with `swapAxes=`.
  *     Legacy `EPSG:4326` srsNames keep x,y order like OGR.
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
      geometryColumn: String = "geometry",
      swapAxes: Option[Boolean] = None): GeoDataFrame = {
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
    val forced = swapAxes
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        val viaWrappers = try parseFeatures(in, forced) finally in.close()
        if (viaWrappers.nonEmpty) viaWrappers
        else {
          // app-schema fallback: no featureMember/member wrappers anywhere —
          // re-parse treating root children as features (one extra pass over
          // this task's file only)
          val in2 = tfs.open(p)
          try parseAppSchema(in2, forced) finally in2.close()
        }
      }
    val out = schema.fields.map {
      case f if f.name == "geometry" => f.copy(name = geometryColumn)
      case f => f
    }
    GeoDataFrame(
      spark.createDataFrame(rows, StructType(out.toIndexedSeq)), geometryColumn)
  }

  private def newReader(in: java.io.InputStream): XMLStreamReader = {
    val fac = XMLInputFactory.newInstance()
    // no DTD/external-entity resolution (untrusted third-party files)
    fac.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    fac.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    fac.createXMLStreamReader(in)
  }

  private def parseFeatures(in: java.io.InputStream,
      forced: Option[Boolean]): Seq[Row] = {
    val r = newReader(in)
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
              case XMLStreamConstants.START_ELEMENT => out += readFeature(r, forced)
              case XMLStreamConstants.END_ELEMENT => depth -= 1
              case _ =>
            }
          }
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** App-schema documents carry features as DIRECT children of the root
    * (no featureMember wrappers). Every root child with a geometry
    * descendant or at least one simple property becomes one feature;
    * metadata elements (`boundedBy`, `metaDataProperty`, bare
    * `name`/`description` headers) are skipped like OGR does.
    */
  private def parseAppSchema(in: java.io.InputStream,
      forced: Option[Boolean]): Seq[Row] = {
    val skipAtRoot = Set("boundedBy", "metaDataProperty", "name", "description")
    val r = newReader(in)
    val out = mutable.ArrayBuffer.empty[Row]
    try {
      var rootSeen = false
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) {
          if (!rootSeen) rootSeen = true // the document root itself
          else if (skipAtRoot(r.getLocalName)) skipElement(r)
          else {
            val row = readFeature(r, forced)
            // keep only real features: something parsed out of the subtree
            if (row.get(0) != null || row.get(1) != null) out += row
          }
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Cursor ON the feature's START_ELEMENT; returns with the cursor on its
    * END_ELEMENT.
    */
  private def readFeature(r: XMLStreamReader, forced: Option[Boolean]): Row = {
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
              if (geom == null) geom = readGeometry(r, g, forced) else skipElement(r)
            case name =>
              // property wrapper: simple text, a wrapper holding a geometry
              // element (e.g. ogr:geometryProperty), or an app-schema
              // complex property whose leaves flatten to dotted keys
              val inner = readProperty(r, forced)
              if (inner.geom != null && geom == null) geom = inner.geom
              if (inner.text != null) props(name) = inner.text
              inner.nested.foreach { case (k, v) => props(name + "." + k) = v }
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
        case _ =>
      }
    }
    Row(if (props.isEmpty) null else props.toMap,
      if (geom == null) null else Wkb.write(geom))
  }

  /** A parsed property subtree: simple text at this level, the first
    * geometry found at any depth, and nested simple leaves as dotted
    * relative keys.
    */
  private final case class PropContent(text: String, geom: Geometry,
    nested: Seq[(String, String)])

  /** Cursor ON a non-geometry child element. Captures its text content, the
    * geometry nested anywhere inside it, and nested complex-property leaves.
    * Returns with the cursor on its END_ELEMENT. Recursion is capped at 128
    * levels — app schemas nest a handful deep; a pathological document must
    * not be able to overflow the task stack.
    *
    * Mixed content (`<note>text<sub>x</sub></note>`) keeps only the nested
    * leaves and DROPS the element's own text — matching OGR's flattened
    * GML field model, where a complex property contributes its leaf fields
    * and any loose text between them is not a field.
    */
  private def readProperty(r: XMLStreamReader, forced: Option[Boolean],
      level: Int = 0): PropContent = {
    require(level < 128, "gml: property nesting deeper than 128 levels")
    val text = new StringBuilder
    var geom: Geometry = null
    val nested = mutable.ArrayBuffer.empty[(String, String)]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case g if GeomNames(g) && geom == null => geom = readGeometry(r, g, forced)
            case child =>
              val inner = readProperty(r, forced, level + 1)
              if (inner.geom != null && geom == null) geom = inner.geom
              if (inner.text != null) nested += child -> inner.text
              inner.nested.foreach { case (k, v) => nested += s"$child.$k" -> v }
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case _ =>
      }
    }
    PropContent(
      text.toString.trim match { case "" => null; case t => if (nested.isEmpty) t else null },
      geom, nested.toSeq)
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

  private val UrnEpsg =
    "(?i)urn:(?:x-)?ogc:def:crs:EPSG:[^:]*:(\\d+)".r

  /** Non-geographic EPSG codes inside the 4xxx block, which is otherwise
    * EPSG's geodetic (lat/lon-ordered) range; their axes must NOT be
    * swapped: 4087/4088 are projected (World Equidistant Cylindrical,
    * ellipsoid/sphere), 4328 is the deprecated WGS 84 geocentric,
    * 4890–4899 and 4920–4988 allocate geodetic CRS in (geocentric,
    * 3D-geographic) pairs on (even, odd) codes — 4890/4891 WGS 66,
    * 4896/4897 ITRF2005, 4936/4937 ETRS89, 4938/4939 GDA94, 4954/4955
    * NAD83(CSRS), 4978/4979 WGS 84, 4984/4985 WGS 72 — so even codes
    * there are geocentric (no swap) and odd codes are 3D geographic
    * (swap); 4910–4919 are the ITRF88–ITRF2000 geocentric frames (even
    * AND odd). The pairing rule must NOT cover 4900–4909: that band
    * holds the classic ancient-datum geographic-2D CRS on even codes
    * too (4902 NDG Paris, 4904 Lisbon 1890), which keep the lat/lon
    * swap.
    */
  private def nonGeographic4xxx(code: Int): Boolean =
    code == 4087 || code == 4088 || code == 4328 ||
      (code >= 4890 && code <= 4899 && code % 2 == 0) ||
      (code >= 4910 && code <= 4919) ||
      (code >= 4920 && code <= 4988 && code % 2 == 0)

  /** GML 3 urn-form EPSG geographic CRS declare lat/lon axis order; the
    * 4xxx range is EPSG's geodetic block, minus the projected/geocentric
    * codes ([[nonGeographic4xxx]]). Legacy `EPSG:4326` srsNames keep x,y
    * order (OGR's behavior). `forced` (from `read(swapAxes=)`) overrides
    * per-document.
    */
  private def axisSwap(srsName: String, inherited: Boolean,
      forced: Option[Boolean]): Boolean = forced.getOrElse {
    if (srsName == null) inherited
    else UrnEpsg.findFirstMatchIn(srsName) match {
      case Some(m) =>
        val code = m.group(1).toInt
        code >= 4000 && code < 5000 && !nonGeographic4xxx(code)
      case None => false
    }
  }

  /** Parse one geometry element (cursor ON its START_ELEMENT); returns with
    * the cursor on its END_ELEMENT. `inheritSwap` carries the container's
    * axis order into Multi* members without their own srsName.
    */
  private def readGeometry(r: XMLStreamReader, kind: String,
      forced: Option[Boolean], inheritSwap: Boolean = false): Geometry = {
    val swap = axisSwap(r.getAttributeValue(null, "srsName"), inheritSwap, forced)
    kind match {
      case "Point" =>
        val xy = coordsIn(r, swap)
        if (xy.isEmpty) Point.empty else Point(xy(0), xy(1))
      case "LineString" | "Curve" => LineString(coordsIn(r, swap))
      case "Polygon" => readPolygon(r, swap)
      case "MultiPoint" =>
        MultiPoint(readMembers(r, forced, swap).map(_.asInstanceOf[Point]).toArray)
      case "MultiCurve" | "MultiLineString" =>
        MultiLineString(readMembers(r, forced, swap).map(_.asInstanceOf[LineString]).toArray)
      case "MultiSurface" | "MultiPolygon" =>
        MultiPolygon(readMembers(r, forced, swap).map(_.asInstanceOf[Polygon]).toArray)
      case "MultiGeometry" =>
        val parts = readMembers(r, forced, swap).toArray
        if (parts.nonEmpty && parts.forall(_.isInstanceOf[Point]))
          MultiPoint(parts.map(_.asInstanceOf[Point]))
        else if (parts.nonEmpty && parts.forall(_.isInstanceOf[LineString]))
          MultiLineString(parts.map(_.asInstanceOf[LineString]))
        else if (parts.nonEmpty && parts.forall(_.isInstanceOf[Polygon]))
          MultiPolygon(parts.map(_.asInstanceOf[Polygon]))
        else GeometryCollection(parts)
    }
  }

  /** Child geometries of a Multi* container (pointMember, curveMember,
    * surfaceMember, geometryMember, and the plural *Members forms).
    */
  private def readMembers(r: XMLStreamReader, forced: Option[Boolean],
      inheritSwap: Boolean): Seq[Geometry] = {
    val parts = mutable.ArrayBuffer.empty[Geometry]
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case g if GeomNames(g) => parts += readGeometry(r, g, forced, inheritSwap)
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ =>
      }
    }
    parts.toSeq
  }

  private def readPolygon(r: XMLStreamReader, swap: Boolean): Polygon = {
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
              val xy = parseCoords(r.getElementText,
                r.getLocalName == "coordinates", swap)
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
  private def coordsIn(r: XMLStreamReader, swap: Boolean): Array[Double] = {
    var xy: Array[Double] = null
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "pos" | "posList" if xy == null =>
              xy = parseCoords(r.getElementText, gml2 = false, swap)
            case "coordinates" if xy == null =>
              xy = parseCoords(r.getElementText, gml2 = true, swap)
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
  private def parseCoords(text: String, gml2: Boolean,
      swap: Boolean = false): Array[Double] = {
    val t = text.trim
    if (t.isEmpty) return Array.empty
    val xy = if (gml2) {
      val tuples = t.split("\\s+").filter(_.nonEmpty)
      val a = new Array[Double](2 * tuples.length)
      var i = 0
      while (i < tuples.length) {
        val parts = tuples(i).split(",")
        require(parts.length >= 2, s"gml: bad coordinate tuple '${tuples(i)}'")
        a(2 * i) = java.lang.Double.parseDouble(parts(0))
        a(2 * i + 1) = java.lang.Double.parseDouble(parts(1))
        i += 1
      }
      a
    } else {
      val scalars = t.split("\\s+").filter(_.nonEmpty)
      require(scalars.length % 2 == 0,
        s"gml: odd scalar count ${scalars.length} in posList (3D not supported)")
      val a = new Array[Double](scalars.length)
      var i = 0
      while (i < scalars.length) {
        a(i) = java.lang.Double.parseDouble(scalars(i))
        i += 1
      }
      a
    }
    if (swap) {
      var i = 0
      while (i < xy.length) {
        val tmp = xy(i); xy(i) = xy(i + 1); xy(i + 1) = tmp
        i += 2
      }
    }
    xy
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

  /** App-schema flavored write: features are DIRECT children of a custom
    * root (no featureMember wrappers), column names containing '.' become
    * nested complex-property groups (`addr.city` →
    * `<addr><city>…</city></addr>`), and `srsUrn=Some(4326)` stamps
    * urn-form srsName on each geometry and stores coordinates in the
    * spec's lat/lon axis order. The read side reverses all three — this
    * is the roundtrip the g111 oracle locks.
    */
  def writeAppSchema(gdf: GeoDataFrame, path: String,
      featureName: String = "feature", srsUrn: Option[Int] = None): Unit = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    val geomIdx = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    attrs.foreach { case (f, _) =>
      require(Set[DataType](StringType, LongType, IntegerType, DoubleType,
        FloatType, BooleanType, ShortType, ByteType).contains(f.dataType),
        s"gml write: unsupported column type ${f.dataType} for '${f.name}'")
      f.name.split("\\.").foreach(escName)
    }
    require(featureName.matches("[A-Za-z_][A-Za-z0-9_.-]*"),
      s"gml write: '$featureName' is not a valid XML element name")
    val swap = srsUrn.exists(c => c >= 4000 && c < 5000)
    val srsAttr = srsUrn.map(c => s""" srsName="urn:ogc:def:crs:EPSG::$c"""").getOrElse("")
    val conf = new GeoParquetIO.SerializableConf(df.sparkSession.sessionState.newHadoopConf())
    val root = new Path(path)
    val fs = root.getFileSystem(conf.value)
    fs.delete(root, true)
    fs.mkdirs(root)
    val pathStr = path
    // group dotted columns: ordered (groupOrNull, leafName, idx) triples
    val attrMeta: Array[(String, String, Int)] = attrs.map { case (f, i) =>
      val dot = f.name.indexOf('.')
      if (dot < 0) (null, f.name, i)
      else (f.name.substring(0, dot), f.name.substring(dot + 1), i)
    }
    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(f"$pathStr%s/part-$pid%05d.gml")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p) { os =>
          val w = new java.io.OutputStreamWriter(
            new java.io.BufferedOutputStream(os, 1 << 20), "UTF-8")
          w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
          w.write("\n<app:Dataset xmlns:app=\"http://graft.example.org/app\" " +
            "xmlns:gml=\"http://www.opengis.net/gml/3.2\">\n")
          var n = 0L
          it.foreach { row =>
            w.write(s"""<app:$featureName gml:id="F$pid-$n">""")
            var k = 0
            while (k < attrMeta.length) {
              val (grp, leaf, i) = attrMeta(k)
              val v = row.get(i)
              if (v != null) {
                if (grp == null) w.write(s"<app:$leaf>${esc(v.toString)}</app:$leaf>")
                else {
                  // contiguous columns of one group share one wrapper element
                  w.write(s"<app:$grp>")
                  var j = k
                  while (j < attrMeta.length && attrMeta(j)._1 == grp) {
                    val vj = row.get(attrMeta(j)._3)
                    if (vj != null)
                      w.write(s"<app:${attrMeta(j)._2}>${esc(vj.toString)}</app:${attrMeta(j)._2}>")
                    j += 1
                  }
                  w.write(s"</app:$grp>")
                  k = j - 1
                }
              }
              k += 1
            }
            val wkb = row.get(geomIdx).asInstanceOf[Array[Byte]]
            if (wkb != null) {
              w.write("<app:geom>")
              val g = Wkb.read(wkb)
              writeGeometry(w, if (swap) swapXY(g) else g, srsAttr)
              w.write("</app:geom>")
            }
            w.write(s"</app:$featureName>\n")
            n += 1
          }
          w.write("</app:Dataset>\n")
          w.flush()
        }
      }
    }
  }

  private def swapXY(g: Geometry): Geometry = g match {
    case p: Point => Point(p.y, p.x)
    case l: LineString => LineString(swapXY(l.xy))
    case pg: Polygon => Polygon(pg.rings.map(swapXY))
    case mp: MultiPoint => MultiPoint(mp.pts.map(p => Point(p.y, p.x)))
    case ml: MultiLineString =>
      MultiLineString(ml.lines.map(l => LineString(swapXY(l.xy))))
    case mpg: MultiPolygon =>
      MultiPolygon(mpg.polys.map(p => Polygon(p.rings.map(swapXY))))
    case gc: GeometryCollection => GeometryCollection(gc.geoms.map(swapXY))
  }

  private def swapXY(xy: Array[Double]): Array[Double] = {
    val out = new Array[Double](xy.length)
    var i = 0
    while (i < xy.length) {
      out(i) = xy(i + 1); out(i + 1) = xy(i)
      i += 2
    }
    out
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

  private def writeGeometry(w: java.io.Writer, g: Geometry,
      srs: String = ""): Unit = g match {
    case p: Point =>
      w.write(s"<gml:Point$srs><gml:pos>${p.x} ${p.y}</gml:pos></gml:Point>")
    case l: LineString =>
      w.write(s"<gml:LineString$srs><gml:posList>${posList(l.xy)}</gml:posList></gml:LineString>")
    case pg: Polygon =>
      w.write(s"<gml:Polygon$srs><gml:exterior><gml:LinearRing><gml:posList>")
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
      w.write(s"<gml:MultiPoint$srs>")
      mp.pts.foreach { p =>
        w.write("<gml:pointMember>"); writeGeometry(w, p); w.write("</gml:pointMember>")
      }
      w.write("</gml:MultiPoint>")
    case ml: MultiLineString =>
      w.write(s"<gml:MultiCurve$srs>")
      ml.lines.foreach { l =>
        w.write("<gml:curveMember>"); writeGeometry(w, l); w.write("</gml:curveMember>")
      }
      w.write("</gml:MultiCurve>")
    case mpg: MultiPolygon =>
      w.write(s"<gml:MultiSurface$srs>")
      mpg.polys.foreach { p =>
        w.write("<gml:surfaceMember>"); writeGeometry(w, p); w.write("</gml:surfaceMember>")
      }
      w.write("</gml:MultiSurface>")
    case gc: GeometryCollection =>
      w.write(s"<gml:MultiGeometry$srs>")
      gc.geoms.foreach { p =>
        w.write("<gml:geometryMember>"); writeGeometry(w, p); w.write("</gml:geometryMember>")
      }
      w.write("</gml:MultiGeometry>")
  }
}
