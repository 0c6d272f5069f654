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

  // ------------------------------------------------------------------ write

  /** Serialize one partition's rows as a Topology document. Each ring /
    * line becomes its own arc (no shared-boundary detection — a topology
    * without arc sharing is valid per spec §2.1.3; sharing is an encoder
    * optimization, not a conformance requirement), quantized to `quantum`
    * grid steps over the partition's bbox with delta-encoded arcs, points
    * as quantized positions. The layer name groups rows into named
    * objects; `id`/`props` (a JSON object string) ride on each member.
    */
  private[io] def topologyDoc(
      rows: Seq[(String, Option[String], Option[String], Geometry)],
      quantum: Int): String = {
    require(quantum >= 2, s"quantum must be >= 2: $quantum")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // partition bbox for the transform
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    def visit(g: Geometry): Unit = g match {
      case Point(x, y, _) =>
        minX = math.min(minX, x); maxX = math.max(maxX, x)
        minY = math.min(minY, y); maxY = math.max(maxY, y)
      case LineString(xy, _) =>
        var i = 0
        while (i < xy.length) {
          minX = math.min(minX, xy(i)); maxX = math.max(maxX, xy(i))
          minY = math.min(minY, xy(i + 1)); maxY = math.max(maxY, xy(i + 1))
          i += 2
        }
      case Polygon(rings) => rings.foreach(r => visit(LineString(r)))
      case c: graft.geom.GeometryCollectionLike => c.children.foreach(visit)
      case _ => ()
    }
    rows.foreach(r => visit(r._4))
    if (minX > maxX) { minX = 0; minY = 0; maxX = 0; maxY = 0 }
    val sx = if (maxX > minX) (maxX - minX) / (quantum - 1) else 1.0
    val sy = if (maxY > minY) (maxY - minY) / (quantum - 1) else 1.0
    def qx(x: Double): Long = math.round((x - minX) / sx)
    def qy(y: Double): Long = math.round((y - minY) / sy)

    // quantize a line/ring, collapsing consecutive duplicate grid points
    // (quantization can merge close vertices); interleaved (qx, qy) longs
    def quant(xy: Array[Double]): Array[Long] = {
      val out = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < xy.length) {
        val cx = qx(xy(i)); val cy = qy(xy(i + 1))
        if (out.isEmpty || out(out.size - 2) != cx || out.last != cy) {
          out += cx; out += cy
        }
        i += 2
      }
      out.toArray
    }

    // ---- junction detection (the topojson cut): a grid point is a
    // junction when it is an open-line endpoint, or when two traversals
    // see it with different unordered neighbor pairs. Shared-edge
    // interiors see identical neighbors from both sides and stay
    // junction-free, so whole shared boundaries dedup into one arc.
    val neighborOf = mutable.HashMap.empty[Long, (Long, Long)]
    val junctions = mutable.HashSet.empty[Long]
    def keyAt(q: Array[Long], i: Int): Long = (q(2 * i) << 32) | q(2 * i + 1)
    def visitSeq(q: Array[Long], ring: Boolean): Unit = {
      val n = q.length / 2
      if (n < 2) return
      val m = if (ring) n - 1 else n // ring arrays are closed (last==first)
      var i = 0
      while (i < m) {
        val p = keyAt(q, i)
        val isEnd = !ring && (i == 0 || i == n - 1)
        if (isEnd) junctions += p
        else {
          val prev = keyAt(q, if (i == 0) m - 1 else i - 1)
          val next = keyAt(q, if (i == m - 1 && ring) 0
                              else if (i == n - 1) i else i + 1)
          val nb = if (prev <= next) (prev, next) else (next, prev)
          neighborOf.get(p) match {
            case None => neighborOf(p) = nb
            case Some(x) => if (x != nb) junctions += p
          }
        }
        i += 1
      }
    }
    def collectSeqs(g: Geometry): Unit = g match {
      case LineString(xy, _) => visitSeq(quant(xy), ring = false)
      case Polygon(rings) => rings.foreach(r => visitSeq(quant(r), ring = true))
      case c: graft.geom.GeometryCollectionLike => c.children.foreach(collectSeqs)
      case _ => ()
    }
    rows.foreach(r => collectSeqs(r._4))

    // ---- arc table with forward/reversed dedup
    val arcs = mutable.ArrayBuffer.empty[String]
    val arcIndex = mutable.HashMap.empty[String, Int]
    def emitArc(seq: Array[Long]): Int = {
      val sb = new StringBuilder("[")
      var px = 0L; var py = 0L
      val n = math.max(1, seq.length / 2)
      var i = 0
      while (i < n) {
        // a fully-collapsed sequence still needs two positions per spec
        val cx = seq(math.min(2 * i, seq.length - 2))
        val cy = seq(math.min(2 * i + 1, seq.length - 1))
        if (i > 0) sb += ','
        sb ++= s"[${cx - px},${cy - py}]"
        px = cx; py = cy
        i += 1
      }
      if (n == 1) sb ++= ",[0,0]"
      arcs += sb.append(']').result()
      arcs.length - 1
    }
    def arcRef(seq: Array[Long]): Int = {
      val fk = seq.mkString(",")
      arcIndex.get(fk) match {
        case Some(i) => i
        case None =>
          val n = seq.length / 2
          val rev = new Array[Long](seq.length)
          var i = 0
          while (i < n) {
            rev(2 * i) = seq(2 * (n - 1 - i)); rev(2 * i + 1) = seq(2 * (n - 1 - i) + 1)
            i += 1
          }
          arcIndex.get(rev.mkString(",")) match {
            case Some(j) => ~j
            case None =>
              val idx = emitArc(seq)
              arcIndex(fk) = idx
              idx
          }
      }
    }
    // split one quantized line/ring at junctions into deduped arc refs
    def splitRefs(q: Array[Long], ring: Boolean): Seq[Int] = {
      val n = q.length / 2
      if (n < 2) return Seq(arcRef(q))
      if (!ring) {
        val cuts = (0 until n).filter(i =>
          i == 0 || i == n - 1 || junctions.contains(keyAt(q, i)))
        cuts.sliding(2).map { w =>
          arcRef(q.slice(2 * w(0), 2 * w(1) + 2))
        }.toSeq
      } else {
        val m = n - 1 // closed
        val js = (0 until m).filter(i => junctions.contains(keyAt(q, i)))
        if (js.isEmpty) Seq(arcRef(q)) // junction-free ring: one closed arc
        else {
          // rotate to start at a junction, then cut at every junction
          val rot = js.head
          def cyc(k: Int): Int = (rot + k) % m
          val cuts = (0 to m).filter(k =>
            k == 0 || k == m || junctions.contains(keyAt(q, cyc(k))))
          cuts.sliding(2).map { w =>
            val seq = new Array[Long](2 * (w(1) - w(0) + 1))
            var k = w(0)
            while (k <= w(1)) {
              val src = cyc(k)
              seq(2 * (k - w(0))) = q(2 * src)
              seq(2 * (k - w(0)) + 1) = q(2 * src + 1)
              k += 1
            }
            arcRef(seq)
          }.toSeq
        }
      }
    }

    def pos(x: Double, y: Double): String = s"[${qx(x)},${qy(y)}]"
    def lineRefs(xy: Array[Double]): String =
      splitRefs(quant(xy), ring = false).mkString(",")
    def ringRefs(r: Array[Double]): String =
      splitRefs(quant(r), ring = true).mkString(",")
    def geomJson(g: Geometry): String = g match {
      case Point(x, y, _) =>
        s"""{"type":"Point","coordinates":${pos(x, y)}}"""
      case MultiPoint(pts) =>
        s"""{"type":"MultiPoint","coordinates":[${pts.map(p => pos(p.x, p.y)).mkString(",")}]}"""
      case LineString(xy, _) =>
        s"""{"type":"LineString","arcs":[${lineRefs(xy)}]}"""
      case MultiLineString(ls) =>
        s"""{"type":"MultiLineString","arcs":[${ls.map(l => s"[${lineRefs(l.xy)}]").mkString(",")}]}"""
      case Polygon(rings) =>
        s"""{"type":"Polygon","arcs":[${rings.map(r => s"[${ringRefs(r)}]").mkString(",")}]}"""
      case MultiPolygon(ps) =>
        s"""{"type":"MultiPolygon","arcs":[${ps.map(p =>
          s"[${p.rings.map(r => s"[${ringRefs(r)}]").mkString(",")}]").mkString(",")}]}"""
      case GeometryCollection(cs) =>
        s"""{"type":"GeometryCollection","geometries":[${cs.map(geomJson).mkString(",")}]}"""
      case other => throw new IllegalArgumentException(
        s"topojson write: unsupported geometry ${other.getClass.getSimpleName}")
    }

    val byLayer = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val objects = byLayer.map { case (layer, members) =>
      val ms = members.map { case (_, id, props, g) =>
        val base = geomJson(g)
        val withId = id.map(v =>
          base.patch(1, s""""id":${mapper.writeValueAsString(v)},""", 0))
          .getOrElse(base)
        props.map { p =>
          // parse + reserialize so an invalid props string fails loudly
          // here instead of corrupting the document
          val node = mapper.readTree(p)
          withId.patch(1, s""""properties":${mapper.writeValueAsString(node)},""", 0)
        }.getOrElse(withId)
      }
      s"${mapper.writeValueAsString(layer)}:{"+
        s""""type":"GeometryCollection","geometries":[${ms.mkString(",")}]}"""
    }
    s"""{"type":"Topology","transform":{"scale":[$sx,$sy],""" +
      s""""translate":[$minX,$minY]},"objects":{${objects.mkString(",")}},""" +
      s""""arcs":[${arcs.mkString(",")}]}"""
  }

  /** One `part-NNNNN.topojson` per partition, task-side (the bulk path —
    * each part is its own Topology with its own transform).
    */
  def writeDir(df: org.apache.spark.sql.DataFrame, dir: String,
      geometryColumn: String = "geometry",
      layerColumn: Option[String] = None,
      idColumn: Option[String] = None,
      propsColumn: Option[String] = None,
      quantum: Int = 100000): Unit = {
    val spark = df.sparkSession
    val conf = new GeoParquetIO.SerializableConf(spark.sessionState.newHadoopConf())
    val gi = df.schema.fieldIndex(geometryColumn)
    val li = layerColumn.map(df.schema.fieldIndex)
    val ii = idColumn.map(df.schema.fieldIndex)
    val pi = propsColumn.map(df.schema.fieldIndex)
    val out = new Path(dir)
    out.getFileSystem(conf.value).mkdirs(out)
    df.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val rows = it.flatMap { r =>
        if (r.isNullAt(gi)) None
        else Some((
          li.map(r.getString).getOrElse("features"),
          ii.filterNot(r.isNullAt).map(i => String.valueOf(r.get(i))),
          pi.filterNot(r.isNullAt).map(r.getString),
          Wkb.read(r.getAs[Array[Byte]](gi))))
      }.toSeq
      if (rows.nonEmpty) {
        val doc = topologyDoc(rows, quantum)
        val p = new Path(dir, f"part-$pid%05d.topojson")
        val tfs = p.getFileSystem(conf.value)
        AtomicTaskFile.withOutput(tfs, p)(
          _.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }
  }

  /** Single-file write (driver-assembled by format necessity — one
    * Topology needs one global transform; `writeDir` is the bulk path).
    */
  def write(df: org.apache.spark.sql.DataFrame, path: String,
      geometryColumn: String = "geometry",
      layerColumn: Option[String] = None,
      idColumn: Option[String] = None,
      propsColumn: Option[String] = None,
      quantum: Int = 100000): Unit = {
    val gi = df.schema.fieldIndex(geometryColumn)
    val li = layerColumn.map(df.schema.fieldIndex)
    val ii = idColumn.map(df.schema.fieldIndex)
    val pi = propsColumn.map(df.schema.fieldIndex)
    val rows = df.rdd.map { r =>
      if (r.isNullAt(gi)) None
      else Some((
        li.map(r.getString).getOrElse("features"),
        ii.filterNot(r.isNullAt).map(i => String.valueOf(r.get(i))),
        pi.filterNot(r.isNullAt).map(r.getString),
        Wkb.read(r.getAs[Array[Byte]](gi))))
    }.collect().flatten.toSeq
    val doc = topologyDoc(rows, quantum)
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val os = fs.create(p, true)
    try os.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }
}
