package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.geom.Sfc

/** PMTiles v3 archive writer/reader — the single-file, range-request-
  * servable tile pyramid (public spec: github.com/protomaps/PMTiles
  * /blob/main/spec/v3). Implements the 127-byte little-endian header,
  * Hilbert-ordered tile ids, varint run-length directories (gzip
  * internal compression), and gzip JSON metadata.
  *
  * [[fromPyramid]] packages a `{z}/{x}/{y}.pbf` tree (as written by
  * [[MvtIO.writeTiles]]/[[MvtIO.writePyramid]]) into one archive: tile
  * DATA is concatenated in tile-id order (`clustered=1`), identical
  * blobs are deduplicated by content hash (the spec's tile_contents <
  * tile_entries case), and the directory stays root-only up to ~16k
  * entries (plenty for the zooms a single archive serves; the leaf split
  * is a documented TODO the reader would also need). Assembly is
  * driver-side like the GeoPackage single-file writer — the DISTRIBUTED
  * bulk artifact is the tile tree itself; PMTiles is its serving wrapper.
  */
object PmTilesIO {

  private val Magic = "PMTiles".getBytes("UTF-8")

  /** Cumulative tile id: offset of zoom z plus Hilbert d of (x, y). */
  def tileId(z: Int, x: Int, y: Int): Long = {
    var acc = 0L
    var k = 0
    while (k < z) { acc += 1L << (2 * k); k += 1 }
    acc + Sfc.hilbertXY2D(z, x.toLong, y.toLong)
  }

  /** Inverse of [[tileId]]. */
  def tileZXY(id: Long): (Int, Int, Int) = {
    var z = 0
    var acc = 0L
    while (acc + (1L << (2 * z)) <= id) { acc += 1L << (2 * z); z += 1 }
    val d = id - acc
    // invert the hilbert walk at level z
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << z)) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (z, x.toInt, y.toInt)
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  final case class Entry(tileId: Long, offset: Long, length: Int, runLength: Int)

  /** Spec §4 directory serialization: count, id deltas, run lengths,
    * lengths, offsets (offset 0 = "previous offset + previous length").
    */
  private def encodeDirectory(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    Pb.varint(out, entries.size)
    var last = 0L
    entries.foreach { e => Pb.varint(out, e.tileId - last); last = e.tileId }
    entries.foreach(e => Pb.varint(out, e.runLength))
    entries.foreach(e => Pb.varint(out, e.length))
    var prevOff = -1L; var prevLen = 0L
    entries.foreach { e =>
      if (prevOff >= 0 && e.offset == prevOff + prevLen) Pb.varint(out, 0)
      else Pb.varint(out, e.offset + 1)
      prevOff = e.offset; prevLen = e.length
    }
    out.toByteArray
  }

  private def decodeDirectory(b: Array[Byte]): Seq[Entry] = {
    val in = new PbIn(b, 0, b.length)
    def rd(): Long = in.varint()
    val n = rd().toInt
    val ids = new Array[Long](n)
    var acc = 0L
    for (i <- 0 until n) { acc += rd(); ids(i) = acc }
    val runs = Array.fill(n)(rd().toInt)
    val lens = Array.fill(n)(rd().toInt)
    val offs = new Array[Long](n)
    var prevOff = -1L; var prevLen = 0L
    for (i <- 0 until n) {
      val v = rd()
      offs(i) = if (v == 0) prevOff + prevLen else v - 1
      prevOff = offs(i); prevLen = lens(i)
    }
    (0 until n).map(i => Entry(ids(i), offs(i), lens(i), runs(i)))
  }

  /** Package a `{z}/{x}/{y}.pbf` tree into one `.pmtiles` archive.
    * Directories follow the spec's two-level scheme: up to `leafSize`
    * entries stay in the root; larger pyramids split into gzip'd leaf
    * directories, with root entries (`run_length = 0`) pointing at leaf
    * (offset, length) ranges — a planet-scale pyramid (millions of
    * tiles) keeps the root a few KB, which is what makes the format
    * range-request servable.
    */
  def fromPyramid(spark: SparkSession, pyramidDir: String, outFile: String,
      metadataJson: String = """{"name":"graft"}""",
      leafSize: Int = 4096): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(pyramidDir)
    val fs = root.getFileSystem(conf)
    val tiles = scala.collection.mutable.ArrayBuffer.empty[(Long, Path)]
    for (zs <- fs.listStatus(root) if zs.isDirectory;
         z = zs.getPath.getName.toIntOption if z.isDefined;
         xs <- fs.listStatus(zs.getPath) if xs.isDirectory;
         x = xs.getPath.getName.toIntOption if x.isDefined;
         f <- fs.listStatus(xs.getPath)
           if f.getPath.getName.endsWith(".pbf")) {
      val y = f.getPath.getName.stripSuffix(".pbf").toIntOption
      y.foreach(yy => tiles += ((tileId(z.get, x.get, yy), f.getPath)))
    }
    require(tiles.nonEmpty, s"no z/x/y.pbf tiles under $pyramidDir")
    require(leafSize >= 2, "leafSize must be >= 2")
    val sorted = tiles.sortBy(_._1)
    val zooms = sorted.map(t => tileZXY(t._1)._1)

    // tile data section: id order (clustered), content-hash dedup
    val data = new ByteArrayOutputStream()
    val seen = scala.collection.mutable.HashMap.empty[Seq[Byte], (Long, Int)]
    val entries = sorted.map { case (id, p) =>
      val bytes = {
        val len = fs.getFileStatus(p).getLen.toInt
        val b = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, b) finally in.close()
        b
      }
      val key = bytes.toSeq
      val (off, len) = seen.getOrElseUpdate(key, {
        val o = data.size().toLong
        data.write(bytes)
        (o, bytes.length)
      })
      Entry(id, off, len, 1)
    }.toSeq

    // two-level directories when the entry set outgrows the root
    val (rootEntries, leafBytes) =
      if (entries.size <= leafSize) (entries, Array.empty[Byte])
      else {
        val leafSection = new ByteArrayOutputStream()
        val roots = entries.grouped(leafSize).map { chunk =>
          val leaf = gzip(encodeDirectory(chunk))
          val off = leafSection.size().toLong
          leafSection.write(leaf)
          Entry(chunk.head.tileId, off, leaf.length, 0) // run 0 = leaf ptr
        }.toSeq
        (roots, leafSection.toByteArray)
      }

    val dirBytes = gzip(encodeDirectory(rootEntries))
    val metaBytes = gzip(metadataJson.getBytes("UTF-8"))
    val headerLen = 127L
    val rootDirOffset = headerLen
    val metaOffset = rootDirOffset + dirBytes.length
    val leafOffset = metaOffset + metaBytes.length
    val dataOffset = leafOffset + leafBytes.length

    val header = ByteBuffer.allocate(127).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Magic).put(3.toByte)
    header.putLong(rootDirOffset).putLong(dirBytes.length.toLong)
    header.putLong(metaOffset).putLong(metaBytes.length.toLong)
    header.putLong(leafOffset).putLong(leafBytes.length.toLong)
    header.putLong(dataOffset).putLong(data.size().toLong)
    header.putLong(entries.size.toLong)            // addressed tiles
    header.putLong(entries.size.toLong)            // tile entries
    header.putLong(seen.size.toLong)               // tile contents (deduped)
    header.put(1.toByte)                           // clustered
    header.put(2.toByte)                           // internal: gzip
    header.put(1.toByte)                           // tile compression: none
    header.put(1.toByte)                           // tile type: MVT
    header.put(zooms.min.toByte).put(zooms.max.toByte)
    header.putInt(-1800000000).putInt(-850000000)  // bounds e7 (world)
    header.putInt(1800000000).putInt(850000000)
    header.put(zooms.min.toByte).putInt(0).putInt(0) // center
    require(header.position() == 127, s"header is ${header.position()} bytes")

    val out = fs.create(new Path(outFile), true)
    try {
      out.write(header.array())
      out.write(dirBytes)
      out.write(metaBytes)
      out.write(leafBytes)
      data.writeTo(out)
    } finally out.close()
    entries.size.toLong
  }

  final case class PmHeader(rootDirOffset: Long, rootDirLength: Long,
      metaOffset: Long, metaLength: Long, leafOffset: Long, leafLength: Long,
      dataOffset: Long, dataLength: Long,
      addressedTiles: Long, tileEntries: Long, tileContents: Long,
      clustered: Boolean, minZoom: Int, maxZoom: Int)

  def readHeader(spark: SparkSession, file: String): PmHeader = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val b = new Array[Byte](127)
    val in = fs.open(p)
    try in.readFully(0, b) finally in.close()
    require(b.startsWith(Magic) && b(7) == 3, "not a PMTiles v3 archive")
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    val rdo = buf.getLong; val rdl = buf.getLong
    val mo = buf.getLong; val ml = buf.getLong
    val lo = buf.getLong; val ll = buf.getLong
    val dto = buf.getLong; val dtl = buf.getLong
    val at = buf.getLong; val te = buf.getLong; val tc = buf.getLong
    val clustered = buf.get() == 1
    buf.get(); buf.get(); buf.get() // compressions + type
    val minZ = buf.get() & 0xff; val maxZ = buf.get() & 0xff
    PmHeader(rdo, rdl, mo, ml, lo, ll, dto, dtl, at, te, tc, clustered, minZ, maxZ)
  }

  private def readRange(spark: SparkSession, file: String,
      offset: Long, length: Int): Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val b = new Array[Byte](length)
    val in = fs.open(p)
    try in.readFully(offset, b) finally in.close()
    b
  }

  /** Root directory entries. `runLength == 0` rows are leaf pointers. */
  def rootEntries(spark: SparkSession, file: String): Seq[Entry] = {
    val h = readHeader(spark, file)
    decodeDirectory(gunzip(
      readRange(spark, file, h.rootDirOffset, h.rootDirLength.toInt)))
  }

  /** All TILE entries, leaf directories expanded. */
  def entries(spark: SparkSession, file: String): Seq[Entry] = {
    val h = readHeader(spark, file)
    rootEntries(spark, file).flatMap { e =>
      if (e.runLength > 0) Seq(e)
      else decodeDirectory(gunzip(
        readRange(spark, file, h.leafOffset + e.offset, e.length)))
    }
  }

  def metadata(spark: SparkSession, file: String): String = {
    val h = readHeader(spark, file)
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val b = new Array[Byte](h.metaLength.toInt)
    val in = fs.open(p)
    try in.readFully(h.metaOffset, b) finally in.close()
    new String(gunzip(b), "UTF-8")
  }

  /** Fetch one tile's bytes (null if absent) — the range-request read a
    * PMTiles server performs.
    */
  def readTile(spark: SparkSession, file: String, z: Int, x: Int, y: Int): Array[Byte] = {
    val id = tileId(z, x, y)
    val h = readHeader(spark, file)
    // range-request walk: root (binary search), follow one leaf if pointed
    def find(dir: Seq[Entry]): Option[Entry] = {
      // last entry with tileId <= id (directories are sorted)
      val idx = {
        var lo = 0; var hi = dir.size - 1; var best = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (dir(mid).tileId <= id) { best = mid; lo = mid + 1 } else hi = mid - 1
        }
        best
      }
      if (idx < 0) None else Some(dir(idx))
    }
    find(rootEntries(spark, file)).flatMap { e =>
      if (e.runLength > 0) {
        if (id < e.tileId + e.runLength) Some(e) else None
      } else {
        val leaf = decodeDirectory(gunzip(
          readRange(spark, file, h.leafOffset + e.offset, e.length)))
        find(leaf).filter(le => id < le.tileId + le.runLength)
      }
    } match {
      case None => null
      case Some(e) => readRange(spark, file, h.dataOffset + e.offset, e.length)
    }
  }
}
