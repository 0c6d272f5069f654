package graft.io

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.geom._
import graft.sql.functions.{st_tileCover => stTileCover}

/** Mapbox Vector Tile (MVT 2.1) writer/reader — pure-JVM protobuf codec
  * for the `{z}/{x}/{y}.pbf` tile pyramid, the standard sink of a
  * 100 TB -> web-map pipeline. Implements the public specification
  * (github.com/mapbox/vector-tile-spec 2.1): zigzag-delta command
  * streams (MoveTo/LineTo/ClosePath), per-layer key/value tables,
  * spec-mandated ring winding (exterior positive area in y-down screen
  * coords), extent-grid quantization.
  *
  * Distributed plan ([[writeTiles]]): `explode(st_tilecover(geom, z))`
  * fans each geometry to the tiles it touches (narrow), ONE shuffle
  * repartitions by tile key, and every task encodes its tiles
  * independently — features are clipped to a buffered tile envelope with
  * the overlay kernel task-side, so no driver collection, no global
  * sort, and per-task memory is one tile's features (the format's
  * inherent unit). Task files land via attempt-private temp + rename
  * ([[AtomicTaskFile]]) — speculative-execution safe.
  */
object MvtIO {

  // protobuf wire primitives shared across codecs: graft.io.Pb
  import Pb.{zigzag, unzigzag}

  // ------------------------------------------------------------- geometry
  /** Project lon/lat into this tile's integer grid (y grows DOWN). */
  private final class TileGrid(z: Int, x: Int, y: Int, extent: Int) {
    private val n = (1L << z).toDouble
    def px(lon: Double): Long =
      math.round(((lon + 180.0) / 360.0 * n - x) * extent)
    def py(lat: Double): Long = {
      val c = math.max(-Sfc.TileLatMax, math.min(Sfc.TileLatMax, lat))
      val r = math.toRadians(c)
      val wy = (1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0
      math.round((wy * n - y) * extent)
    }
  }

  /** Quantize a ring/line to grid coords, dropping consecutive duplicate
    * integer points (zero-length segments are illegal command params).
    */
  private def quantize(xy: Array[Double], grid: TileGrid): Array[Long] = {
    val out = new Array[Long](xy.length)
    var m = 0
    var i = 0
    while (i + 1 < xy.length) {
      val qx = grid.px(xy(i)); val qy = grid.py(xy(i + 1))
      if (m == 0 || out(m - 2) != qx || out(m - 1) != qy) {
        out(m) = qx; out(m + 1) = qy; m += 2
      }
      i += 2
    }
    java.util.Arrays.copyOf(out, m)
  }

  /** Signed area * 2 in y-down integer coords (surveyor's formula). The
    * MVT spec keys winding on its sign: exterior > 0, interior < 0.
    */
  private def signedArea2(pts: Array[Long]): Long = {
    var s = 0L
    val k = pts.length / 2
    var i = 0
    while (i < k) {
      val j = (i + 1) % k
      s += pts(2 * i) * pts(2 * j + 1) - pts(2 * j) * pts(2 * i + 1)
      i += 1
    }
    s
  }

  private def reverse(pts: Array[Long]): Array[Long] = {
    val k = pts.length / 2
    val out = new Array[Long](pts.length)
    var i = 0
    while (i < k) {
      out(2 * i) = pts(2 * (k - 1 - i)); out(2 * i + 1) = pts(2 * (k - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Encode one feature's command stream; cursor persists across parts. */
  private final class CmdStream {
    private val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
    private var cx = 0L
    private var cy = 0L
    def moveTo(pts: Array[Long], from: Int, count: Int): Unit = {
      cmds += ((count.toLong << 3) | 1L)
      var i = from
      while (i < from + count) {
        cmds += zigzag(pts(2 * i) - cx); cmds += zigzag(pts(2 * i + 1) - cy)
        cx = pts(2 * i); cy = pts(2 * i + 1)
        i += 1
      }
    }
    def lineTo(pts: Array[Long], from: Int, count: Int): Unit = {
      cmds += ((count.toLong << 3) | 2L)
      var i = from
      while (i < from + count) {
        cmds += zigzag(pts(2 * i) - cx); cmds += zigzag(pts(2 * i + 1) - cy)
        cx = pts(2 * i); cy = pts(2 * i + 1)
        i += 1
      }
    }
    def closePath(): Unit = cmds += ((1L << 3) | 7L)
    def result: Array[Long] = cmds.toArray
    def nonEmpty: Boolean = cmds.nonEmpty
  }

  /** Geometry -> (mvtType, commands). Returns None when quantization
    * collapses the geometry below its type's minimum (degenerate at this
    * zoom — correctly dropped, as every MVT encoder does).
    */
  private def encodeGeom(g: Geometry, grid: TileGrid): Option[(Int, Array[Long])] = {
    val cs = new CmdStream
    def addLine(xy: Array[Double]): Unit = {
      val q = quantize(xy, grid)
      if (q.length >= 4) { cs.moveTo(q, 0, 1); cs.lineTo(q, 1, q.length / 2 - 1) }
    }
    def addRing(ring: Array[Double], exterior: Boolean): Unit = {
      var q = quantize(ring, grid)
      // drop the closing duplicate the WKB ring carries
      if (q.length >= 4 && q(0) == q(q.length - 2) && q(1) == q(q.length - 1))
        q = java.util.Arrays.copyOf(q, q.length - 2)
      if (q.length < 6) return // degenerate after quantization
      val a2 = signedArea2(q)
      if (a2 == 0) return
      if ((a2 > 0) != exterior) q = reverse(q)
      cs.moveTo(q, 0, 1); cs.lineTo(q, 1, q.length / 2 - 1); cs.closePath()
    }
    g match {
      case p: Point =>
        val q = Array(grid.px(p.x), grid.py(p.y))
        cs.moveTo(q, 0, 1)
        Some((1, cs.result))
      case mp: MultiPoint =>
        val q = new Array[Long](mp.pts.length * 2)
        var i = 0
        while (i < mp.pts.length) {
          q(2 * i) = grid.px(mp.pts(i).x); q(2 * i + 1) = grid.py(mp.pts(i).y)
          i += 1
        }
        cs.moveTo(q, 0, mp.pts.length)
        Some((1, cs.result))
      case l: LineString =>
        addLine(l.xy)
        if (cs.nonEmpty) Some((2, cs.result)) else None
      case ml: MultiLineString =>
        ml.lines.foreach(l => addLine(l.xy))
        if (cs.nonEmpty) Some((2, cs.result)) else None
      case p: Polygon =>
        p.rings.zipWithIndex.foreach { case (r, i) => addRing(r, i == 0) }
        if (cs.nonEmpty) Some((3, cs.result)) else None
      case mp: MultiPolygon =>
        mp.polys.foreach(p =>
          p.rings.zipWithIndex.foreach { case (r, i) => addRing(r, i == 0) })
        if (cs.nonEmpty) Some((3, cs.result)) else None
      case gc: GeometryCollection =>
        // MVT has no heterogeneous feature type; encode the first
        // non-empty homogeneous member set (callers should explode first)
        gc.geoms.iterator.flatMap(encodeGeom(_, grid)).nextOption()
      case _ => None
    }
  }

  // ------------------------------------------------------------- values
  private def encodeValue(v: Any): Array[Byte] = {
    val o = new PbOut
    v match {
      case s: String => o.str(1, s)
      case d: Double =>
        o.tag(3, 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 0
        while (i < 8) { o.bytes.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
      case f: Float => encodeValue(f.toDouble).foreach(o.bytes.write(_)); return o.toBytes
      case b: Boolean => o.tag(7, 0); o.varint(if (b) 1 else 0)
      case i: Int => o.tag(6, 0); o.varint(zigzag(i.toLong))
      case l: Long => o.tag(6, 0); o.varint(zigzag(l))
      case other => o.str(1, String.valueOf(other))
    }
    o.toBytes
  }

  // ------------------------------------------------------------- tile
  private def encodeTile(layerName: String, extent: Int,
      features: Seq[(Option[Long], Int, Array[Long], Seq[(String, Any)])]): Array[Byte] = {
    val keys = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val values = scala.collection.mutable.LinkedHashMap.empty[Seq[Byte], Int]
    val featBytes = features.map { case (id, gtype, cmds, props) =>
      val f = new PbOut
      id.foreach { i => f.tag(1, 0); f.varint(i) }
      if (props.nonEmpty) {
        val tags = new PbOut
        props.foreach { case (k, v) =>
          if (v != null) {
            val ki = keys.getOrElseUpdate(k, keys.size)
            val vb = encodeValue(v).toSeq
            val vi = values.getOrElseUpdate(vb, values.size)
            tags.varint(ki); tags.varint(vi)
          }
        }
        f.lenDelim(2, tags.toBytes)
      }
      f.tag(3, 0); f.varint(gtype)
      val geomPacked = new PbOut
      cmds.foreach(geomPacked.varint)
      f.lenDelim(4, geomPacked.toBytes)
      f.toBytes
    }
    val layer = new PbOut
    layer.tag(15, 0); layer.varint(2) // version
    layer.str(1, layerName)
    featBytes.foreach(layer.lenDelim(2, _))
    keys.keysIterator.foreach(layer.str(3, _))
    values.keysIterator.foreach(v => layer.lenDelim(4, v.toArray))
    layer.tag(5, 0); layer.varint(extent)
    val tile = new PbOut
    tile.lenDelim(3, layer.toBytes)
    tile.toBytes
  }

  // ------------------------------------------------------------- writer
  /** Write the zoom-`z` tile pyramid level for `df` under
    * `outDir/z/x/y.pbf`. `propCols` become feature properties; `idCol`
    * (integral) becomes the feature id. Geometries are clipped task-side
    * to each tile's envelope padded by `bufferPx` grid units (the
    * standard render-continuity margin; points are never duplicated —
    * their cover is the single containing tile). Returns tiles written.
    */
  def writeTiles(df: DataFrame, geomCol: String, outDir: String, zoom: Int,
      layerName: String = "layer", extent: Int = 4096, bufferPx: Int = 8,
      propCols: Seq[String] = Nil, idCol: Option[String] = None,
      // false = leave tiles this df doesn't touch in place (incremental /
      // streaming refresh); true = replace the whole zoom level
      replaceLevel: Boolean = true): Long = {
    require(zoom >= 0 && zoom <= 22, s"zoom $zoom out of range")
    require(extent > 0 && bufferPx >= 0, "bad extent/buffer")
    graft.sql.functions.install(df.sparkSession)

    val keep = (geomCol +: (propCols ++ idCol)).distinct
    val fanned = df
      .select(keep.map(col).toIndexedSeq: _*)
      .withColumn("_tile", explode(stTileCover(col(geomCol), lit(zoom))))
      .repartition(col("_tile"))
      .sortWithinPartitions(col("_tile"))

    val conf = new GeoParquetIO.SerializableConf(
      df.sparkSession.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val fsRoot = rawLocal(root.getFileSystem(conf.value))
    // replace only THIS zoom level, so pyramid writes compose per zoom
    if (replaceLevel) fsRoot.delete(new Path(root, zoom.toString), true)
    fsRoot.mkdirs(root)

    val schema = fanned.schema
    val gi = schema.fieldIndex(geomCol)
    val ti = schema.fieldIndex("_tile")
    val pis = propCols.map(c => c -> schema.fieldIndex(c))
    val ii = idCol.map(schema.fieldIndex)
    val dirStr = outDir
    val z = zoom

    val written = df.sparkSession.sparkContext
      .longAccumulator("mvtTilesWritten")
    fanned.rdd.foreachPartition { it =>
      val fs = rawLocal(new Path(dirStr).getFileSystem(conf.value))
      val madeDirs = scala.collection.mutable.HashSet.empty[String]
      var curTile = Long.MinValue
      var buf = scala.collection.mutable.ArrayBuffer
        .empty[(Option[Long], Int, Array[Long], Seq[(String, Any)])]
      def flush(): Unit = if (buf.nonEmpty) {
        val x = (curTile >> 32).toInt
        val y = (curTile & 0xffffffffL).toInt
        val p = new Path(f"$dirStr%s/$z%d/$x%d/$y%d.pbf")
        // one mkdirs per distinct parent, not per tile (r19)
        if (madeDirs.add(p.getParent.toString)) fs.mkdirs(p.getParent)
        val bytes = encodeTile(layerName, extent, buf.toSeq)
        AtomicTaskFile.withOutput(fs, p)(_.write(bytes))
        written.add(1)
        buf = scala.collection.mutable.ArrayBuffer.empty
      }
      it.foreach { row: Row =>
        val tile = row.getLong(ti)
        if (tile != curTile) { flush(); curTile = tile }
        val x = (tile >> 32).toInt
        val y = (tile & 0xffffffffL).toInt
        val (lonMin, latMin, lonMax, latMax) = Sfc.tileEnvelope(z, x, y)
        val padLon = (lonMax - lonMin) * bufferPx / extent
        val padLat = (latMax - latMin) * bufferPx / extent
        val g = Wkb.read(row.get(gi).asInstanceOf[Array[Byte]])
        val clipped = g match {
          case p: Point => p // a point's cover IS its tile
          case other => Overlay.intersection(other,
            Polygon.box(lonMin - padLon, latMin - padLat,
              lonMax + padLon, latMax + padLat))
        }
        if (!clipped.isEmpty) {
          val grid = new TileGrid(z, x, y, extent)
          encodeGeom(clipped, grid).foreach { case (gtype, cmds) =>
            val props = pis.map { case (name, idx) => name -> row.get(idx) }
            // tolerate any integral id type (IntegerType is Spark's
            // default for small ints; a bare getLong would ClassCast)
            val fid = ii.map(i => row.get(i).asInstanceOf[Number].longValue())
            buf += ((fid, gtype, cmds, props))
          }
        }
      }
      flush()
    }
    written.value
  }

  /** STREAMING tile refresh: each micro-batch re-renders exactly the
    * tiles its rows touch (replaceLevel=false — tiles untouched by the
    * batch stay in place; a touched tile is rewritten from the batch's
    * rows for it, last-write-wins via the atomic rename). The live-map
    * pattern: a stream of updated features keeps a served tile layer
    * current without ever re-rendering the world. Start with
    * `.outputMode("update")` semantics in mind: feed each batch the FULL
    * current feature set of the tiles you want re-rendered (e.g. join
    * the changed keys back to a snapshot) — the sink renders what it is
    * given.
    */
  def streamTiles(stream: DataFrame, geomCol: String, outDir: String,
      zoom: Int, layerName: String = "layer", extent: Int = 4096,
      bufferPx: Int = 8, propCols: Seq[String] = Nil,
      idCol: Option[String] = None): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(stream.isStreaming, "streamTiles expects a streaming DataFrame")
    stream.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        writeTiles(batch, geomCol, outDir, zoom, layerName, extent,
          bufferPx, propCols, idCol, replaceLevel = false)
        ()
    }
  }

  /** Write zoom levels `minZoom..maxZoom`, simplifying per zoom with a
    * tolerance of `simplifyPx` grid units (tolerance in degrees =
    * tile-span/extent · px — the standard overzoom-free pyramid: coarse
    * zooms carry coarse geometry, so their tiles stay small). Each zoom
    * is an independent distributed job under `outDir/z/`. Returns total
    * tiles written.
    */
  def writePyramid(df: DataFrame, geomCol: String, outDir: String,
      minZoom: Int, maxZoom: Int, layerName: String = "layer",
      extent: Int = 4096, bufferPx: Int = 8, simplifyPx: Double = 1.0,
      propCols: Seq[String] = Nil, idCol: Option[String] = None): Long = {
    require(minZoom <= maxZoom, "minZoom must be <= maxZoom")
    graft.sql.functions.install(df.sparkSession)
    var total = 0L
    for (z <- maxZoom to minZoom by -1) {
      val tol = 360.0 / (1L << z) / extent * simplifyPx
      val simplified =
        if (simplifyPx <= 0) df
        else df.withColumn(geomCol,
          graft.sql.functions.st_simplify(col(geomCol), lit(tol)))
      total += writeTiles(simplified, geomCol, outDir, z, layerName, extent,
        bufferPx, propCols, idCol)
    }
    total
  }

  // ------------------------------------------------------------- reader
  final case class MvtFeature(id: Option[Long], geomType: Int,
      coords: Array[Array[Long]], props: Map[String, Any])
  final case class MvtLayer(name: String, extent: Int, features: Seq[MvtFeature])

  /** Decode one tile file (roundtrip verification + interchange). Command
    * streams are decoded back to absolute grid coordinates, one
    * `Array[Long](x0,y0,x1,y1,...)` per MoveTo-opened part (rings include
    * the re-closed first point).
    */
  /** Local paths skip Hadoop's checksummed LocalFileSystem (r19): tile
    * files are single-writer artifacts renamed into place; the CRC
    * sidecar doubles the file operations per tile (create + write +
    * rename of a .crc beside every .pbf) and buys nothing here. Non-local
    * schemes pass through unchanged.
    */
  private def rawLocal(fs: FileSystem): FileSystem = fs match {
    case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
    case other => other
  }

  def readTileFile(path: String, hadoopConf: org.apache.hadoop.conf.Configuration =
      new org.apache.hadoop.conf.Configuration()): Seq[MvtLayer] = {
    val p = new Path(path)
    val fs = rawLocal(p.getFileSystem(hadoopConf))
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val tile = new PbIn(bytes, 0, bytes.length)
    val layers = scala.collection.mutable.ArrayBuffer.empty[MvtLayer]
    while (tile.hasMore) {
      val t = tile.varint()
      if ((t >> 3) == 3 && (t & 7) == 2) layers += decodeLayer(tile.sub())
      else tile.skip((t & 7).toInt)
    }
    layers.toSeq
  }

  private def decodeLayer(l: PbIn): MvtLayer = {
    var name = ""
    var extent = 4096
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val values = scala.collection.mutable.ArrayBuffer.empty[Any]
    val rawFeatures = scala.collection.mutable.ArrayBuffer.empty[PbIn]
    while (l.hasMore) {
      val t = l.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) =>
          val s = l.sub(); name = new String(s.b, s.pos, s.end - s.pos, "UTF-8")
        case (2, 2) => rawFeatures += l.sub()
        case (3, 2) =>
          val s = l.sub(); keys += new String(s.b, s.pos, s.end - s.pos, "UTF-8")
        case (4, 2) => values += decodeValue(l.sub())
        case (5, 0) => extent = l.varint().toInt
        case (_, w) => l.skip(w)
      }
    }
    val feats = rawFeatures.map { f =>
      var id: Option[Long] = None
      var gtype = 0
      var tags = Array.empty[Long]
      var cmds = Array.empty[Long]
      while (f.hasMore) {
        val t = f.varint()
        ((t >> 3).toInt, (t & 7).toInt) match {
          case (1, 0) => id = Some(f.varint())
          case (2, 2) =>
            val s = f.sub()
            val b = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (s.hasMore) b += s.varint()
            tags = b.toArray
          case (3, 0) => gtype = f.varint().toInt
          case (4, 2) =>
            val s = f.sub()
            val b = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (s.hasMore) b += s.varint()
            cmds = b.toArray
          case (_, w) => f.skip(w)
        }
      }
      val props = tags.grouped(2).collect {
        case Array(ki, vi) => keys(ki.toInt) -> values(vi.toInt)
      }.toMap
      MvtFeature(id, gtype, decodeCommands(cmds, gtype), props)
    }
    MvtLayer(name, extent, feats.toSeq)
  }

  private def decodeValue(v: PbIn): Any = {
    var out: Any = null
    while (v.hasMore) {
      val t = v.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) =>
          val s = v.sub(); out = new String(s.b, s.pos, s.end - s.pos, "UTF-8")
        case (3, 1) =>
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= (v.b(v.pos + i) & 0xffL) << (8 * i); i += 1 }
          v.pos += 8
          out = java.lang.Double.longBitsToDouble(bits)
        case (6, 0) => out = unzigzag(v.varint())
        case (7, 0) => out = v.varint() != 0
        case (_, w) => v.skip(w)
      }
    }
    out
  }

  private def decodeCommands(cmds: Array[Long], gtype: Int): Array[Array[Long]] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cx = 0L; var cy = 0L
    var i = 0
    while (i < cmds.length) {
      val cmd = cmds(i); i += 1
      val id = (cmd & 7).toInt
      val count = (cmd >> 3).toInt
      id match {
        case 1 => // MoveTo opens a new part (except point multi-moves)
          var c = 0
          while (c < count) {
            cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
            if (gtype == 1) parts += Array(cx, cy)
            else {
              if (cur.nonEmpty) { parts += cur.toArray; cur = scala.collection.mutable.ArrayBuffer.empty }
              cur += cx; cur += cy
            }
            c += 1
          }
        case 2 =>
          var c = 0
          while (c < count) {
            cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
            cur += cx; cur += cy
            c += 1
          }
        case 7 => // re-close the ring
          if (cur.nonEmpty) { cur += cur(0); cur += cur(1) }
      }
    }
    if (cur.nonEmpty) parts += cur.toArray
    parts.toArray
  }
}
