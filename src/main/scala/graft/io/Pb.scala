package graft.io

import java.io.ByteArrayOutputStream

/** Shared protobuf wire-format primitives for the pure-JVM binary codecs
  * (OSM PBF, Mapbox Vector Tile, PMTiles directories): ONE implementation
  * of varint / zigzag / tag framing, so a wire-level fix can never
  * silently miss one of the formats (each previously carried its own
  * near-identical copy).
  */
private[io] final class PbOut {
  val bytes = new ByteArrayOutputStream()
  def varint(v0: Long): Unit = Pb.varint(bytes, v0)
  def svarint(v: Long): Unit = varint(Pb.zigzag(v))
  def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
  def lenDelim(field: Int, payload: Array[Byte]): Unit = {
    tag(field, 2); varint(payload.length); bytes.write(payload)
  }
  def str(field: Int, s: String): Unit = lenDelim(field, s.getBytes("UTF-8"))
  def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
  def packed(field: Int, vs: Iterable[Long], signed: Boolean): Unit = {
    val p = new PbOut
    vs.foreach(v => if (signed) p.svarint(v) else p.varint(v))
    lenDelim(field, p.toBytes)
  }
  def toBytes: Array[Byte] = bytes.toByteArray
}

private[io] final class PbIn(val b: Array[Byte], var pos: Int, val end: Int) {
  def hasMore: Boolean = pos < end
  def varint(): Long = {
    var shift = 0; var v = 0L
    while (true) {
      val x = b(pos); pos += 1
      v |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) return v
      shift += 7
    }
    v
  }
  def svarint(): Long = Pb.unzigzag(varint())
  def sub(): PbIn = {
    val len = varint().toInt
    val r = new PbIn(b, pos, pos + len); pos += len; r
  }
  def bytesField(): Array[Byte] = {
    val len = varint().toInt
    val out = java.util.Arrays.copyOfRange(b, pos, pos + len); pos += len; out
  }
  def packedLongs(signed: Boolean): Array[Long] = {
    val s = sub()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (s.hasMore) out += (if (signed) s.svarint() else s.varint())
    out.toArray
  }
  def skip(wire: Int): Unit = wire match {
    case 0 => varint()
    case 1 => pos += 8
    case 2 => pos += varint().toInt
    case 5 => pos += 4
  }
  /** Consume the rest of this sub-message without parsing (kind gating). */
  def skipAll(): Unit = pos = end
}

private[io] object Pb {
  @inline def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  @inline def unzigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)
  /** Streaming-writer form (PMTiles directories append to one stream). */
  def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt & 0x7f)
  }
}
