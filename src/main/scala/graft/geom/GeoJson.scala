package graft.geom

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** RFC 7946 GeoJSON geometry codec (the interchange format the reference
  * reaches through OGR's GeoJSON/GeoJSONSeq drivers, `io/file.py:49-149`).
  * All seven geometry types; Z read from third positions and written when
  * present; empty geometries read/write as empty coordinate arrays.
  * Coordinates are CRS84 by the RFC — IO attaches that CRS.
  */
object GeoJson {

  private val mapper = new ObjectMapper()

  def read(s: String): Geometry = fromNode(mapper.readTree(s))

  /** Parse a geometry from an already-parsed Jackson node (the
    * FeatureCollection reader holds the document tree and must not
    * re-serialize each geometry subtree just to re-parse it).
    */
  def readNode(n: JsonNode): Geometry = fromNode(n)

  private def fromNode(n: JsonNode): Geometry = {
    require(n != null && n.has("type"), "not a GeoJSON geometry")
    n.get("type").asText() match {
      case "Point" =>
        val c = n.get("coordinates")
        if (c == null || !c.isArray || c.size() == 0) Point.empty else point(c)
      case "LineString" =>
        val (xy, zs) = positions(n.get("coordinates"))
        LineString(xy, zs)
      case "Polygon" => Polygon(ringArrays(n.get("coordinates")))
      case "MultiPoint" =>
        MultiPoint(elements(n.get("coordinates")).map(point).toArray)
      case "MultiLineString" =>
        MultiLineString(elements(n.get("coordinates")).map { c =>
          val (xy, zs) = positions(c); LineString(xy, zs)
        }.toArray)
      case "MultiPolygon" =>
        MultiPolygon(elements(n.get("coordinates")).map(c => Polygon(ringArrays(c))).toArray)
      case "GeometryCollection" =>
        GeometryCollection(elements(n.get("geometries")).map(fromNode).toArray)
      case other => throw new IllegalArgumentException(s"unsupported GeoJSON type $other")
    }
  }

  private def elements(n: JsonNode): Seq[JsonNode] = {
    if (n == null || !n.isArray) return Nil
    val b = Seq.newBuilder[JsonNode]
    val it = n.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def point(c: JsonNode): Point =
    if (c.size() >= 3) Point(c.get(0).asDouble(), c.get(1).asDouble(), c.get(2).asDouble())
    else Point(c.get(0).asDouble(), c.get(1).asDouble())

  /** Packed xy + optional zs from an array of positions. */
  private def positions(n: JsonNode): (Array[Double], Array[Double]) = {
    val es = elements(n)
    val xy = new Array[Double](2 * es.length)
    var zs: Array[Double] = null
    var i = 0
    es.foreach { p =>
      xy(2 * i) = p.get(0).asDouble(); xy(2 * i + 1) = p.get(1).asDouble()
      if (p.size() >= 3) {
        if (zs == null) {
          // NaN-fill earlier 2-D positions: a zero-filled array would
          // fabricate elevation 0.0 for vertices that never had one
          zs = Array.fill(es.length)(Double.NaN)
        }
        zs(i) = p.get(2).asDouble()
      }
      i += 1
    }
    (xy, zs)
  }

  private def ringArrays(n: JsonNode): Array[Array[Double]] =
    elements(n).map(r => positions(r)._1).toArray

  // ---------------------------------------------------------------- write
  def write(g: Geometry): String = mapper.writeValueAsString(toNode(g))

  private def toNode(g: Geometry): ObjectNode = {
    val o = mapper.createObjectNode()
    g match {
      case p: Point =>
        o.put("type", "Point")
        val c = o.putArray("coordinates")
        if (!p.isEmpty) { c.add(p.x); c.add(p.y); if (p.hasZ) c.add(p.z) }
      case l: LineString =>
        o.put("type", "LineString")
        lineCoords(o.putArray("coordinates"), l)
      case p: Polygon =>
        o.put("type", "Polygon")
        polyCoords(o.putArray("coordinates"), p)
      case m: MultiPoint =>
        o.put("type", "MultiPoint")
        val c = o.putArray("coordinates")
        m.children.foreach { p =>
          val pc = c.addArray()
          if (!p.isEmpty) { pc.add(p.x); pc.add(p.y); if (p.hasZ) pc.add(p.z) }
        }
      case m: MultiLineString =>
        o.put("type", "MultiLineString")
        val c = o.putArray("coordinates")
        m.children.foreach(l => lineCoords(c.addArray(), l))
      case m: MultiPolygon =>
        o.put("type", "MultiPolygon")
        val c = o.putArray("coordinates")
        m.children.foreach(p => polyCoords(c.addArray(), p))
      case gc: GeometryCollection =>
        o.put("type", "GeometryCollection")
        val arr = o.putArray("geometries")
        gc.children.foreach(ch => arr.add(toNode(ch)))
    }
    o
  }

  private def lineCoords(arr: ArrayNode, l: LineString): Unit = {
    var i = 0
    while (i < l.size) {
      val p = arr.addArray()
      p.add(l.x(i)); p.add(l.y(i))
      if (l.hasZ) p.add(l.zs(i))
      i += 1
    }
  }

  private def polyCoords(arr: ArrayNode, p: Polygon): Unit =
    p.rings.foreach { ring =>
      val r = arr.addArray()
      var i = 0
      while (i < ring.length) {
        val pos = r.addArray()
        pos.add(ring(i)); pos.add(ring(i + 1))
        i += 2
      }
    }
}
