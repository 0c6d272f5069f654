package graft.geom

import scala.collection.mutable.ArrayBuffer

/** WKT reader/writer (reference surface: `dask_geopandas/expr.py:897-919`
  * from_wkt, `expr.py:546-549` to_wkt). Number formatting uses the shortest
  * round-trippable Java representation with integral values printed without
  * the trailing ".0" (matching the common WKT style `POINT (1 2)`).
  */
object Wkt {

  // ---------------------------------------------------------------- writer
  def write(g: Geometry): String = {
    val sb = new StringBuilder
    writeTo(g, sb)
    sb.toString
  }

  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def writeTo(g: Geometry, sb: StringBuilder): Unit = {
    val tag = g.geometryType.toUpperCase
    val zTag = if (g.hasZ) " Z" else ""
    if (g.isEmpty) { sb.append(tag).append(zTag).append(" EMPTY"); return }
    sb.append(tag).append(zTag).append(" ")
    g match {
      case p: Point =>
        sb.append("(").append(num(p.x)).append(" ").append(num(p.y))
        if (p.hasZ) sb.append(" ").append(num(p.z))
        sb.append(")")
      case l: LineString => writeSeq(l, sb)
      case p: Polygon =>
        sb.append("(")
        var r = 0
        while (r < p.rings.length) {
          if (r > 0) sb.append(", ")
          writeRing(p.rings(r), sb)
          r += 1
        }
        sb.append(")")
      case mp: MultiPoint =>
        sb.append("(")
        var i = 0
        while (i < mp.pts.length) {
          if (i > 0) sb.append(", ")
          val p = mp.pts(i)
          sb.append("(").append(num(p.x)).append(" ").append(num(p.y))
          if (p.hasZ) sb.append(" ").append(num(p.z))
          sb.append(")")
          i += 1
        }
        sb.append(")")
      case ml: MultiLineString =>
        sb.append("(")
        var i = 0
        while (i < ml.lines.length) {
          if (i > 0) sb.append(", ")
          writeSeq(ml.lines(i), sb)
          i += 1
        }
        sb.append(")")
      case mp: MultiPolygon =>
        sb.append("(")
        var i = 0
        while (i < mp.polys.length) {
          if (i > 0) sb.append(", ")
          val p = mp.polys(i)
          sb.append("(")
          var r = 0
          while (r < p.rings.length) {
            if (r > 0) sb.append(", ")
            writeRing(p.rings(r), sb)
            r += 1
          }
          sb.append(")")
          i += 1
        }
        sb.append(")")
      case gc: GeometryCollection =>
        sb.append("(")
        var i = 0
        while (i < gc.geoms.length) {
          if (i > 0) sb.append(", ")
          writeTo(gc.geoms(i), sb)
          i += 1
        }
        sb.append(")")
    }
  }

  private def writeSeq(l: LineString, sb: StringBuilder): Unit = {
    sb.append("(")
    var i = 0
    while (i < l.size) {
      if (i > 0) sb.append(", ")
      sb.append(num(l.x(i))).append(" ").append(num(l.y(i)))
      if (l.hasZ) sb.append(" ").append(num(l.zs(i)))
      i += 1
    }
    sb.append(")")
  }

  private def writeRing(ring: Array[Double], sb: StringBuilder): Unit = {
    sb.append("(")
    var i = 0
    while (i < ring.length) {
      if (i > 0) sb.append(", ")
      sb.append(num(ring(i))).append(" ").append(num(ring(i + 1)))
      i += 2
    }
    sb.append(")")
  }

  // ---------------------------------------------------------------- parser
  def read(s: String): Geometry = new Parser(s).parse()

  private final class Parser(s: String) {
    private var pos = 0

    def parse(): Geometry = {
      val g = geometry()
      skipWs()
      require(pos >= s.length, s"trailing content in WKT at $pos: '$s'")
      g
    }

    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def word(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetter)) pos += 1
      s.substring(start, pos).toUpperCase
    }

    private def peekWord(): String = { val p = pos; val w = word(); pos = p; w }

    private def expect(c: Char): Unit = {
      skipWs()
      require(pos < s.length && s.charAt(pos) == c, s"expected '$c' at $pos in '$s'")
      pos += 1
    }

    private def tryChar(c: Char): Boolean = {
      skipWs()
      if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }

    private def number(): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && "+-0123456789.eEnNaAiIfty".indexOf(s.charAt(pos)) >= 0) pos += 1
      java.lang.Double.parseDouble(s.substring(start, pos))
    }

    /** Returns (hasZ, isEmpty). Consumes optional Z/M/ZM tag and EMPTY. */
    // (hasZ, measureOnly, empty): an explicit M tag means the third number
    // is a measure, NOT elevation — it must be discarded, never kept as Z
    private def dims(): (Boolean, Boolean, Boolean) = {
      val w = peekWord()
      var hasZ = false
      var mOnly = false
      if (w == "Z" || w == "M" || w == "ZM") {
        word(); hasZ = w.contains("Z"); mOnly = w == "M"
      }
      val w2 = peekWord()
      if (w2 == "EMPTY") { word(); (hasZ, mOnly, true) } else (hasZ, mOnly, false)
    }

    private def coords(hasZ: Boolean): (Array[Double], Array[Double]) = {
      expect('(')
      val xy = new ArrayBuffer[Double]
      val zs = if (hasZ) new ArrayBuffer[Double] else null
      var done = false
      while (!done) {
        xy += number(); xy += number()
        if (hasZ) {
          skipWs()
          // tolerate 2-D coords inside a Z-tagged geometry — but keep the
          // z array index-aligned with the points (NaN marks the missing
          // elevation); a short array would crash every later write
          if (pos < s.length && s.charAt(pos) != ',' && s.charAt(pos) != ')') zs += number()
          else zs += Double.NaN
        } else {
          skipWs()
          if (pos < s.length && s.charAt(pos) != ',' && s.charAt(pos) != ')') number() // discard z/m
        }
        if (!tryChar(',')) { expect(')'); done = true }
      }
      (xy.toArray, if (zs != null && zs.exists(!_.isNaN)) zs.toArray else null)
    }

    private def geometry(): Geometry = {
      val tag = word()
      val (hasZ, mOnly, empty) = dims()
      tag match {
        case "POINT" =>
          if (empty) Point.empty
          else {
            expect('(')
            val x = number(); val y = number()
            skipWs()
            val z = if (pos < s.length && s.charAt(pos) != ')') number() else Double.NaN
            expect(')')
            Point(x, y, if (hasZ || (!mOnly && !z.isNaN)) z else Double.NaN)
          }
        case "LINESTRING" =>
          if (empty) LineString(Array.empty)
          else { val (xy, zs) = coords(hasZ); LineString(xy, zs) }
        case "POLYGON" =>
          if (empty) Polygon(Array.empty[Array[Double]])
          else {
            expect('(')
            val rings = new ArrayBuffer[Array[Double]]
            var done = false
            while (!done) {
              rings += coords(hasZ)._1
              if (!tryChar(',')) { expect(')'); done = true }
            }
            Polygon(rings.toArray)
          }
        case "MULTIPOINT" =>
          if (empty) MultiPoint(Array.empty)
          else {
            expect('(')
            val pts = new ArrayBuffer[Point]
            var done = false
            while (!done) {
              skipWs()
              if (s.charAt(pos) == '(') {
                expect('(')
                val x = number(); val y = number()
                skipWs()
                val z = if (s.charAt(pos) != ')') number() else Double.NaN
                expect(')')
                pts += Point(x, y, z)
              } else {
                val x = number(); val y = number()
                skipWs()
                val z = if (s.charAt(pos) != ',' && s.charAt(pos) != ')') number() else Double.NaN
                pts += Point(x, y, z)
              }
              if (!tryChar(',')) { expect(')'); done = true }
            }
            MultiPoint(pts.toArray)
          }
        case "MULTILINESTRING" =>
          if (empty) MultiLineString(Array.empty)
          else {
            expect('(')
            val ls = new ArrayBuffer[LineString]
            var done = false
            while (!done) {
              val (xy, zs) = coords(hasZ)
              ls += LineString(xy, zs)
              if (!tryChar(',')) { expect(')'); done = true }
            }
            MultiLineString(ls.toArray)
          }
        case "MULTIPOLYGON" =>
          if (empty) MultiPolygon(Array.empty)
          else {
            expect('(')
            val ps = new ArrayBuffer[Polygon]
            var done = false
            while (!done) {
              expect('(')
              val rings = new ArrayBuffer[Array[Double]]
              var rdone = false
              while (!rdone) {
                rings += coords(hasZ)._1
                if (!tryChar(',')) { expect(')'); rdone = true }
              }
              ps += Polygon(rings.toArray)
              if (!tryChar(',')) { expect(')'); done = true }
            }
            MultiPolygon(ps.toArray)
          }
        case "GEOMETRYCOLLECTION" =>
          if (empty) GeometryCollection(Array.empty)
          else {
            expect('(')
            val gs = new ArrayBuffer[Geometry]
            var done = false
            while (!done) {
              gs += geometry()
              if (!tryChar(',')) { expect(')'); done = true }
            }
            GeometryCollection(gs.toArray)
          }
        case other => throw new IllegalArgumentException(s"unknown WKT tag '$other' in '$s'")
      }
    }
  }
}
