package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** ISO/OGC WKB codec (reads EWKB dialect too).
  *
  * Matches the interchange encoding the reference uses for geometry columns
  * (reference `dask_geopandas/expr.py:922-944` from_wkb / to_wkb and the
  * Arrow interchange at `backends.py:71-78`, which encode shapely ISO WKB).
  * Writes little-endian ISO WKB (Z types = base + 1000); reads either byte
  * order, ISO Z/M/ZM codes and the EWKB Z/SRID flag bits.
  */
object Wkb {
  private final val Z_FLAG = 0x80000000
  private final val M_FLAG = 0x40000000
  private final val SRID_FLAG = 0x20000000

  def read(bytes: Array[Byte]): Geometry = read(ByteBuffer.wrap(bytes))

  private def read(buf: ByteBuffer): Geometry = {
    val order = buf.get()
    buf.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var t = buf.getInt()
    var hasZ = false
    var hasM = false
    if ((t & SRID_FLAG) != 0) { buf.getInt(); t &= ~SRID_FLAG } // skip SRID
    if ((t & Z_FLAG) != 0) { hasZ = true; t &= ~Z_FLAG }
    if ((t & M_FLAG) != 0) { hasM = true; t &= ~M_FLAG }
    val dimCode = (t & 0xffff) / 1000
    if (dimCode == 1 || dimCode == 3) hasZ = true
    if (dimCode == 2 || dimCode == 3) hasM = true
    val base = (t & 0xffff) % 1000

    base match {
      case 1 =>
        val x = buf.getDouble(); val y = buf.getDouble()
        val z = if (hasZ) buf.getDouble() else Double.NaN
        if (hasM) buf.getDouble()
        Point(x, y, z)
      case 2 =>
        val (xy, zs) = readCoords(buf, hasZ, hasM)
        LineString(xy, zs)
      case 3 =>
        val nRings = buf.getInt()
        val rings = new Array[Array[Double]](nRings)
        var i = 0
        while (i < nRings) { rings(i) = readCoords(buf, hasZ, hasM)._1; i += 1 }
        Polygon(rings)
      case 4 =>
        MultiPoint(Array.fill(buf.getInt())(read(buf).asInstanceOf[Point]))
      case 5 =>
        MultiLineString(Array.fill(buf.getInt())(read(buf).asInstanceOf[LineString]))
      case 6 =>
        MultiPolygon(Array.fill(buf.getInt())(read(buf).asInstanceOf[Polygon]))
      case 7 =>
        GeometryCollection(Array.fill(buf.getInt())(read(buf)))
      case other =>
        throw new IllegalArgumentException(s"unsupported WKB geometry type $other")
    }
  }

  private def readCoords(buf: ByteBuffer, hasZ: Boolean, hasM: Boolean): (Array[Double], Array[Double]) = {
    val n = buf.getInt()
    val xy = new Array[Double](2 * n)
    val zs = if (hasZ) new Array[Double](n) else null
    var i = 0
    while (i < n) {
      xy(2 * i) = buf.getDouble(); xy(2 * i + 1) = buf.getDouble()
      if (hasZ) zs(i) = buf.getDouble()
      if (hasM) buf.getDouble()
      i += 1
    }
    (xy, zs)
  }

  def write(g: Geometry): Array[Byte] = {
    val buf = ByteBuffer.allocate(sizeOf(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeTo(g, buf)
    buf.array()
  }

  private def typeCode(g: Geometry): Int = {
    val base = g match {
      case _: Point              => 1
      case _: LineString         => 2
      case _: Polygon            => 3
      case _: MultiPoint         => 4
      case _: MultiLineString    => 5
      case _: MultiPolygon       => 6
      case _: GeometryCollection => 7
    }
    if (g.hasZ) base + 1000 else base
  }

  private def sizeOf(g: Geometry): Int = g match {
    case p: Point => 5 + (if (p.hasZ) 24 else 16)
    case l: LineString =>
      5 + 4 + l.size * (if (l.hasZ) 24 else 16)
    case p: Polygon =>
      5 + 4 + p.rings.map(r => 4 + r.length * 8).sum
    case c: GeometryCollectionLike =>
      5 + 4 + c.children.map(ch => sizeOf(ch)).sum
  }

  private def writeTo(g: Geometry, buf: ByteBuffer): Unit = {
    buf.put(1.toByte)
    buf.putInt(typeCode(g))
    g match {
      case p: Point =>
        if (p.isEmpty) { buf.putDouble(Double.NaN); buf.putDouble(Double.NaN) }
        else { buf.putDouble(p.x); buf.putDouble(p.y) }
        if (p.hasZ) buf.putDouble(p.z)
      case l: LineString =>
        buf.putInt(l.size)
        var i = 0
        while (i < l.size) {
          buf.putDouble(l.x(i)); buf.putDouble(l.y(i))
          if (l.hasZ) buf.putDouble(l.zs(i))
          i += 1
        }
      case p: Polygon =>
        buf.putInt(p.rings.length)
        p.rings.foreach { r =>
          buf.putInt(r.length / 2)
          var i = 0
          while (i < r.length) { buf.putDouble(r(i)); i += 1 }
        }
      case c: GeometryCollectionLike =>
        buf.putInt(c.children.length)
        c.children.foreach(ch => writeTo(ch, buf))
    }
  }
}
