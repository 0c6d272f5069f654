package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, GeometryCollection, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.JsonNode
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** TopoJSON read — the topology-preserving GeoJSON extension (public spec,
  * github.com/topojson/topojson-specification; the reference reaches it
  * through pyogrio's TopoJSON driver, `io/file.py:32-46`).
  *
  * A Topology stores each shared boundary ONCE in a global `arcs` table —
  * optionally quantized (delta-encoded integers under a
  * `transform.scale/translate`) — and geometries reference arcs by index,
  * with ones'-complement negative indices meaning "reversed". The reader
  * decodes the arc table per file, stitches rings/lines (consecutive arcs
  * share their junction vertex, which is emitted once), and flattens every
  * named object (layer) into rows: (layer, id, props JSON, geometry WKB).
  *
  * Like the other single-document formats, one file is one topology —
  * non-splittable; reads schedule one task per file.
  */
object TopoJsonIO {

  def schemaFor(geometryColumn: String): StructType = StructType(Seq(
    StructField("layer", StringType),
    StructField("id", StringType),
    StructField("props", StringType),
    StructField(geometryColumn, BinaryType)))

  def read(spark: SparkSession, path: String,
      geometryColumn: String = "geometry"): GeoDataFrame = {
    graft.sql.functions.install(spark)
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".topojson"))
          .map(_.toString).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .topojson files under $path")
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val p = new Path(f)
        val tfs = p.getFileSystem(sconf.value)
        val in = tfs.open(p)
        try parseTopology(in) finally in.close()
      }
    GeoDataFrame(spark.createDataFrame(rows, schemaFor(geometryColumn)),
      geometryColumn).setCrs("OGC:CRS84")
  }

  private[io] def parseTopology(in: java.io.InputStream): Seq[Row] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.readTree(in)
    require(doc != null && doc.path("type").asText() == "Topology",
      "topojson: document type must be 'Topology'")

    // transform (quantized topologies): position = delta-sum * scale + translate
    val (sx, sy, tx, ty, quantized) = Option(doc.get("transform")) match {
      case Some(t) =>
        val sc = t.get("scale"); val tr = t.get("translate")
        (sc.get(0).asDouble, sc.get(1).asDouble,
          tr.get(0).asDouble, tr.get(1).asDouble, true)
      case None => (1.0, 1.0, 0.0, 0.0, false)
    }

    // decode the global arc table once
    val arcsNode = doc.get("arcs")
    require(arcsNode != null && arcsNode.isArray, "topojson: missing arcs")
    val arcs: Array[Array[Double]] = arcsNode.elements().asScala.map { arc =>
      val pts = arc.elements().asScala.toArray
      val out = new Array[Double](2 * pts.length)
      var accX = 0.0; var accY = 0.0
      var i = 0
      while (i < pts.length) {
        val p = pts(i)
        if (quantized) {
          accX += p.get(0).asDouble; accY += p.get(1).asDouble
          out(2 * i) = accX * sx + tx
          out(2 * i + 1) = accY * sy + ty
        } else {
          out(2 * i) = p.get(0).asDouble
          out(2 * i + 1) = p.get(1).asDouble
        }
        i += 1
      }
      out
    }.toArray

    def point(c: JsonNode): (Double, Double) =
      if (quantized) (c.get(0).asDouble * sx + tx, c.get(1).asDouble * sy + ty)
      else (c.get(0).asDouble, c.get(1).asDouble)

    // stitch one arc-index list into a coordinate string; consecutive arcs
    // share their junction vertex (emitted once, per spec)
    def stitch(idxs: JsonNode): Array[Double] = {
      val buf = mutable.ArrayBuffer.empty[Double]
      val it = idxs.elements()
      while (it.hasNext) {
        val raw = it.next().asInt()
        val (arc, rev) = if (raw >= 0) (arcs(raw), false) else (arcs(~raw), true)
        val n = arc.length / 2
        var i = 0
        while (i < n) {
          val j = if (rev) n - 1 - i else i
          val x = arc(2 * j); val y = arc(2 * j + 1)
          // skip the duplicated junction vertex between consecutive arcs
          if (buf.isEmpty || buf(buf.size - 2) != x || buf(buf.size - 1) != y) {
            buf += x; buf += y
          }
          i += 1
        }
      }
      buf.toArray
    }

    def ring(idxs: JsonNode): Array[Double] = {
      val xy = stitch(idxs)
      // a ring's last arc ends on the first arc's start; re-close if the
      // dedup above dropped the closing vertex
      if (xy.length >= 4 &&
        (xy(0) != xy(xy.length - 2) || xy(1) != xy(xy.length - 1)))
        xy ++ Array(xy(0), xy(1))
      else xy
    }

    def geometryOf(g: JsonNode): Geometry = g.path("type").asText() match {
      case "Point" =>
        val (x, y) = point(g.get("coordinates")); Point(x, y)
      case "MultiPoint" =>
        MultiPoint(g.get("coordinates").elements().asScala.map { c =>
          val (x, y) = point(c); Point(x, y)
        }.toArray)
      case "LineString" => LineString(stitch(g.get("arcs")))
      case "MultiLineString" =>
        MultiLineString(g.get("arcs").elements().asScala
          .map(l => LineString(stitch(l))).toArray)
      case "Polygon" =>
        Polygon(g.get("arcs").elements().asScala.map(ring).toArray)
      case "MultiPolygon" =>
        MultiPolygon(g.get("arcs").elements().asScala.map(poly =>
          Polygon(poly.elements().asScala.map(ring).toArray)).toArray)
      case "GeometryCollection" =>
        GeometryCollection(g.get("geometries").elements().asScala
          .map(geometryOf).toArray)
      case other => throw new IllegalArgumentException(
        s"topojson: unsupported geometry type '$other'")
    }

    val objects = doc.get("objects")
    require(objects != null && objects.isObject, "topojson: missing objects")
    val out = mutable.ArrayBuffer.empty[Row]
    val names = objects.fieldNames()
    while (names.hasNext) {
      val layer = names.next()
      val obj = objects.get(layer)
      // a named object is usually a GeometryCollection (one feature per
      // member); a bare geometry object is a single-feature layer
      val members: Iterator[JsonNode] =
        if (obj.path("type").asText() == "GeometryCollection")
          obj.get("geometries").elements().asScala
        else Iterator.single(obj)
      members.foreach { m =>
        val id = Option(m.get("id")).map(n =>
          if (n.isTextual) n.asText() else n.toString).orNull
        val props = Option(m.get("properties")).filterNot(_.isNull)
          .map(mapper.writeValueAsString).orNull
        out += Row(layer, id, props, Wkb.write(geometryOf(m)))
      }
    }
    out.toSeq
  }
}
