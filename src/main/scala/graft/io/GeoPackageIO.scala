package graft.io

import org.apache.hadoop.fs.{FSDataInputStream, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM read-only GeoPackage (OGC GPKG = SQLite + geometry blobs)
  * reader — the second half of the reference's `read_file` surface
  * (`dask_geopandas/io/file.py:49-149`; pyogrio's GPKG driver). Both
  * formats are public: the SQLite database file format
  * (sqlite.org/fileformat2: page b-trees, record serial types, overflow
  * chains) and the OGC GeoPackage spec (gpkg_geometry_columns + "GP"
  * geometry blobs wrapping standard WKB).
  *
  * Distributed read: the driver reads only the 100-byte header, the
  * sqlite_master table, and the feature table's ROOT page — each child
  * subtree of the root becomes one Spark task (a fanout-of-hundreds
  * partitioning for big tables; a leaf root reads as one task). Tasks walk
  * their subtree with positioned page reads — never the whole file.
  *
  * Geometry columns (from gpkg_geometry_columns) surface as WKB binary —
  * the GP blob header (flags/srs/envelope) is stripped task-side. An
  * `INTEGER PRIMARY KEY` column is SQLite's rowid alias: its record value
  * is NULL in the file and the b-tree key supplies the value.
  */
object GeoPackageIO {

  // ------------------------------------------------------------- low level
  private[io] final class PageSource(in: FSDataInputStream, val pageSize: Int,
      val usable: Int) {
    def page(n: Long): Array[Byte] = {
      val buf = new Array[Byte](pageSize)
      in.readFully((n - 1) * pageSize, buf)
      buf
    }
    def close(): Unit = in.close()
  }

  private[io] def openSource(conf: org.apache.hadoop.conf.Configuration,
      path: String): PageSource = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val head = new Array[Byte](100)
    try in.readFully(0, head)
    catch {
      case e: java.io.EOFException =>
        in.close()
        throw new IllegalArgumentException(
          s"$path is truncated (no 100-byte SQLite header)", e)
    }
    if (new String(head, 0, 15, "US-ASCII") != "SQLite format 3") {
      in.close() // don't leak the handle on a wrong-format probe
      throw new IllegalArgumentException(s"$path is not a SQLite database")
    }
    val ps0 = ((head(16) & 0xff) << 8) | (head(17) & 0xff)
    val pageSize = if (ps0 == 1) 65536 else ps0
    val reserved = head(20) & 0xff
    // format-version 2 = WAL journaling: recent rows may live only in the
    // -wal sidecar, so a silent main-file walk would return stale data —
    // fail loud instead (checkpoint the database first)
    if (head(18) == 2 || head(19) == 2) {
      in.close()
      throw new IllegalArgumentException(
        s"$path uses WAL journaling (uncheckpointed -wal may hold newer rows); " +
          "checkpoint it to rollback-journal mode before reading")
    }
    new PageSource(in, pageSize, pageSize - reserved)
  }

  /** SQLite varint: 1-9 bytes, 7 bits each big-endian (9th byte = 8 bits).
    * Returns (value, bytesConsumed).
    */
  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      if ((x & 0x80) == 0) return (v << 7 | x, i + 1)
      v = v << 7 | (x & 0x7f)
      i += 1
    }
    (v << 8 | (b(off + 8) & 0xff), 9)
  }

  /** Decode one record (header of serial types + values). */
  private[io] def decodeRecord(payload: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(payload, 0)
    val types = ArrayBuffer.empty[Long]
    var off = n0
    while (off < hdrLen) {
      val (t, n) = varint(payload, off)
      types += t
      off += n
    }
    var v = hdrLen.toInt
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      val t = types(i)
      t match {
        case 0 => out(i) = null
        case st if st >= 1 && st <= 6 =>
          val len = st match { case 5 => 6; case 6 => 8; case s => s.toInt }
          var acc = if ((payload(v) & 0x80) != 0) -1L else 0L
          var j = 0
          while (j < len) { acc = (acc << 8) | (payload(v + j) & 0xffL); j += 1 }
          out(i) = acc; v += len
        case 7 =>
          out(i) = java.lang.Double.longBitsToDouble(
            ByteBuffer.wrap(payload, v, 8).getLong); v += 8
        case 8 => out(i) = 0L
        case 9 => out(i) = 1L
        case st if st >= 12 && st % 2 == 0 =>
          val len = ((st - 12) / 2).toInt
          out(i) = java.util.Arrays.copyOfRange(payload, v, v + len); v += len
        case st if st >= 13 =>
          val len = ((st - 13) / 2).toInt
          out(i) = new String(payload, v, len, "UTF-8"); v += len
        case st => throw new IllegalArgumentException(
          s"reserved/unsupported SQLite serial type $st in record")
      }
      i += 1
    }
    out
  }

  /** Full payload of a leaf-table cell, following the overflow chain when
    * the record spills (sqlite.org/fileformat2 §B-tree Pages: K/M/X split).
    */
  private def cellPayload(src: PageSource, page: Array[Byte], cellOff: Int): (Long, Array[Byte]) = {
    val (payloadLen, n1) = varint(page, cellOff)
    val (rowid, n2) = varint(page, cellOff + n1)
    val u = src.usable
    val x = u - 35
    val p = payloadLen.toInt
    if (p <= x) {
      (rowid, java.util.Arrays.copyOfRange(page, cellOff + n1 + n2, cellOff + n1 + n2 + p))
    } else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + (p - m) % (u - 4)
      val inline = if (k <= x) k else m
      val out = new Array[Byte](p)
      System.arraycopy(page, cellOff + n1 + n2, out, 0, inline)
      var next = ByteBuffer.wrap(page, cellOff + n1 + n2 + inline, 4).getInt.toLong
      var got = inline
      while (next != 0 && got < p) {
        val op = src.page(next)
        next = ByteBuffer.wrap(op, 0, 4).getInt.toLong
        val take = math.min(p - got, u - 4)
        System.arraycopy(op, 4, out, got, take)
        got += take
      }
      (rowid, out)
    }
  }

  /** Walk a table b-tree subtree, invoking f per (rowid, record payload). */
  private[io] def walk(src: PageSource, pageNo: Long, headerSkip: Int)(
      f: (Long, Array[Byte]) => Unit): Unit = {
    val page = src.page(pageNo)
    val base = headerSkip // 100 on page 1, else 0
    val ptype = page(base) & 0xff
    val nCells = ((page(base + 3) & 0xff) << 8) | (page(base + 4) & 0xff)
    ptype match {
      case 0x0d => // leaf table
        var i = 0
        while (i < nCells) {
          val cp = base + 8 + i * 2
          val cellOff = ((page(cp) & 0xff) << 8) | (page(cp + 1) & 0xff)
          val (rowid, payload) = cellPayload(src, page, cellOff)
          f(rowid, payload)
          i += 1
        }
      case 0x05 => // interior table
        var i = 0
        while (i < nCells) {
          val cp = base + 12 + i * 2
          val cellOff = ((page(cp) & 0xff) << 8) | (page(cp + 1) & 0xff)
          walk(src, ByteBuffer.wrap(page, cellOff, 4).getInt.toLong, 0)(f)
          i += 1
        }
        walk(src, ByteBuffer.wrap(page, base + 8, 4).getInt.toLong, 0)(f)
      case other => throw new IllegalStateException(
        s"unexpected page type 0x${other.toHexString} at page $pageNo")
    }
  }

  /** Child subtree roots of a table b-tree (the distributed-read units).
    * Expands interior levels breadth-first until at least `target` subtrees
    * exist (or everything is a leaf): a DEEP tree — a big table at a large
    * page fanout, or a bottom-up-built file whose root has few children —
    * must not collapse the read to root-child-count parallelism. Driver
    * cost is one page read per expanded interior node, subtree order
    * preserves rowid order.
    */
  private[io] def subtreeRoots(src: PageSource, rootPage: Long, headerSkip: Int,
      target: Int = 1): Seq[Long] = {
    def children(pn: Long, base: Int): Option[Seq[Long]] = {
      val page = src.page(pn)
      if ((page(base) & 0xff) == 0x0d) return None
      val nCells = ((page(base + 3) & 0xff) << 8) | (page(base + 4) & 0xff)
      val out = ArrayBuffer.empty[Long]
      var i = 0
      while (i < nCells) {
        val cp = base + 12 + i * 2
        val cellOff = ((page(cp) & 0xff) << 8) | (page(cp + 1) & 0xff)
        out += ByteBuffer.wrap(page, cellOff, 4).getInt.toLong
        i += 1
      }
      out += ByteBuffer.wrap(page, base + 8, 4).getInt.toLong
      Some(out.toSeq)
    }
    var frontier: Vector[(Long, Int)] = Vector((rootPage, headerSkip))
    var anyInterior = true
    while (anyInterior && frontier.size < target) {
      anyInterior = false
      frontier = frontier.flatMap { case (pn, base) =>
        children(pn, base) match {
          case Some(ch) => anyInterior = true; ch.map((_, 0))
          case None => Vector((pn, base))
        }
      }
    }
    // always at least one level below a non-leaf root (historic behavior)
    if (frontier == Vector((rootPage, headerSkip)))
      children(rootPage, headerSkip).map(_.toVector).getOrElse(Vector(rootPage))
    else frontier.map(_._1)
  }

  /** [[subtreeRoots]] grouped into at most ~`target` read units. Level
    * expansion is all-or-nothing, so one level past the target multiplies
    * the subtree count by the page fanout (~100): an sf1-scale file
    * planned 11k ~54-row tasks and the full scan drowned in task overhead
    * (r13 pushdown soak). Grouping CONSECUTIVE same-level subtrees keeps
    * every task a set of sequential rowid-ordered walks and caps task
    * count without skewing sizes (the partial-expansion alternative mixes
    * subtree depths — one unexpanded interior node carries fanout× the
    * rows of its expanded siblings).
    */
  private[io] def groupedSubtreeRoots(src: PageSource, rootPage: Long,
      headerSkip: Int, target: Int): Seq[Seq[Long]] = {
    val roots = subtreeRoots(src, rootPage, headerSkip, target)
    val per = math.max(1, (roots.size + math.max(1, target) - 1) / math.max(1, target))
    roots.grouped(per).map(_.toSeq).toSeq
  }

  /** Point lookup of one rowid in a table b-tree — root to leaf, O(depth)
    * page reads. Interior cells are [4-byte child][varint key] where key is
    * the LARGEST rowid in the child's subtree; the pointer at base+8
    * covers keys beyond the last cell.
    */
  private[io] def btreeLookup(src: PageSource, rootPage: Long, rowid: Long): Option[Array[Byte]] = {
    var pageNo = rootPage
    while (true) {
      val base = if (pageNo == 1) 100 else 0
      val page = src.page(pageNo)
      val ptype = page(base) & 0xff
      val nCells = ((page(base + 3) & 0xff) << 8) | (page(base + 4) & 0xff)
      if (ptype == 0x0d) {
        var i = 0
        while (i < nCells) {
          val cp = base + 8 + i * 2
          val cellOff = ((page(cp) & 0xff) << 8) | (page(cp + 1) & 0xff)
          val (rid, payload) = cellPayload(src, page, cellOff)
          if (rid == rowid) return Some(payload)
          i += 1
        }
        return None
      } else {
        var child = ByteBuffer.wrap(page, base + 8, 4).getInt.toLong // rightmost
        var i = 0
        var found = false
        while (i < nCells && !found) {
          val cp = base + 12 + i * 2
          val cellOff = ((page(cp) & 0xff) << 8) | (page(cp + 1) & 0xff)
          if (rowid <= varint(page, cellOff + 4)._1) {
            child = ByteBuffer.wrap(page, cellOff, 4).getInt.toLong
            found = true
          }
          i += 1
        }
        pageNo = child
      }
    }
    None // unreachable
  }

  /** Candidate rowids whose box intersects the query, from the SQLite
    * R*-tree shadow table `rtree_<table>_<geom>_node` (public node format,
    * sqlite rtree.c: big-endian [depth:i16][nCell:i16] header then 24-byte
    * cells of [i64 child-nodeno | rowid][f32 minX][f32 maxX][f32 minY]
    * [f32 maxY]; depth is meaningful in the root, leaves are depth 0).
    * float32 boxes are stored conservatively rounded, so the result is a
    * SUPERSET — callers apply the exact envelope residual.
    */
  private[io] def rtreeCandidates(src: PageSource, nodeRoot: Long,
      qx0: Double, qy0: Double, qx1: Double, qy1: Double): Array[Long] = {
    val out = ArrayBuffer.empty[Long]
    // the shadow table row is an ordinary SQLite record (nodeno INTEGER
    // PRIMARY KEY, data BLOB) — the node bytes are its blob column
    def nodeBlob(no: Long): Array[Byte] =
      btreeLookup(src, nodeRoot, no).map(decodeRecord)
        .flatMap(_.collectFirst { case b: Array[Byte] => b })
        .getOrElse(throw new IllegalStateException(s"gpkg rtree: missing node $no"))
    val root = nodeBlob(1)
    val rootDepth = ((root(0) & 0xff) << 8) | (root(1) & 0xff)
    def visit(blob: Array[Byte], depth: Int): Unit = {
      val bb = ByteBuffer.wrap(blob)
      val n = bb.getShort(2) & 0xffff
      var i = 0
      while (i < n) {
        val off = 4 + i * 24
        val id = bb.getLong(off)
        val mnx = bb.getFloat(off + 8); val mxx = bb.getFloat(off + 12)
        val mny = bb.getFloat(off + 16); val mxy = bb.getFloat(off + 20)
        if (mnx <= qx1 && mxx >= qx0 && mny <= qy1 && mxy >= qy0) {
          if (depth == 0) out += id
          else visit(nodeBlob(id), depth - 1)
        }
        i += 1
      }
    }
    visit(root, rootDepth)
    out.toArray
  }

  private[io] final case class Master(name: String, rootPage: Long, sql: String)

  /** Case-insensitive identifier resolution, exact match preferred —
    * SQLite identifiers are case-insensitive and GDAL lowercases
    * f_table_name. ONE definition so the next resolution fix (Unicode
    * case rules, ambiguity reporting) lands everywhere at once.
    */
  private[io] def resolveCI[V](m: Map[String, V], key: String): Option[(String, V)] =
    m.get(key).map(key -> _)
      .orElse(m.collectFirst { case (t, v) if t.equalsIgnoreCase(key) => (t, v) })

  private[io] def findMaster(master: Seq[Master], name: String): Option[Master] =
    master.find(_.name == name).orElse(master.find(_.name.equalsIgnoreCase(name)))

  private[io] def readMaster(src: PageSource): Seq[Master] = {
    val out = ArrayBuffer.empty[Master]
    walk(src, 1L, 100) { (_, payload) =>
      val r = decodeRecord(payload)
      if (r.length >= 5 && r(0) == "table")
        out += Master(r(1).asInstanceOf[String], r(3).asInstanceOf[Long],
          Option(r(4)).map(_.asInstanceOf[String]).getOrElse(""))
    }
    out.toSeq
  }

  private[io] final case class Col(name: String, sparkType: DataType, rowidAlias: Boolean)

  /** The resolved geometry column always materializes WKB bytes, whatever
    * SQL type name the DDL declared for it (SpatiaLite's AddGeometryColumn
    * writes POINT/LINESTRING/GEOMETRY, which parse as TEXT affinity) —
    * force BinaryType in the derived schema. Name match is
    * case-insensitive like every SQLite identifier lookup.
    */
  private[io] def forceGeomBinary(cols: Seq[Col], geomCol: Option[String]): Seq[Col] =
    geomCol match {
      case Some(g) => cols.map(c =>
        if (c.name.equalsIgnoreCase(g)) c.copy(sparkType = BinaryType) else c)
      case None => cols
    }

  /** Fixture-grade DDL parse: top-level comma split of the column list;
    * first token = name (optionally quoted), rest = type + constraints.
    * Table-level constraints (PRIMARY KEY(...), UNIQUE(...), CHECK...,
    * FOREIGN KEY...) are skipped.
    */
  private[io] def parseColumns(sql: String): Seq[Col] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    val parts = ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty).flatMap { colDef =>
      val upper = colDef.toUpperCase
      if (upper.startsWith("PRIMARY KEY") || upper.startsWith("UNIQUE") ||
        upper.startsWith("CHECK") || upper.startsWith("FOREIGN KEY") ||
        upper.startsWith("CONSTRAINT")) None
      else {
        val (name, rest) =
          if (colDef.startsWith("\"")) {
            val e = colDef.indexOf('"', 1)
            (colDef.substring(1, e), colDef.substring(e + 1))
          } else if (colDef.startsWith("`") || colDef.startsWith("[")) {
            val close = if (colDef.startsWith("[")) ']' else '`'
            val e = colDef.indexOf(close, 1)
            (colDef.substring(1, e), colDef.substring(e + 1))
          } else {
            val e = colDef.indexWhere(_.isWhitespace)
            if (e < 0) (colDef, "") else (colDef.substring(0, e), colDef.substring(e))
          }
        val restU = rest.trim.toUpperCase
        val t =
          if (restU.startsWith("INTEGER") || restU.startsWith("INT") ||
            restU.startsWith("TINYINT") || restU.startsWith("BIGINT") ||
            restU.startsWith("BOOLEAN")) LongType
          else if (restU.startsWith("DOUBLE") || restU.startsWith("REAL") ||
            restU.startsWith("FLOAT")) DoubleType
          else if (restU.startsWith("BLOB")) BinaryType
          // TEXT / VARCHAR / untyped / DATETIME (SQLite has no datetime
          // storage class — gpkg stores ISO-8601 text)
          else StringType
        val rowid = restU.startsWith("INTEGER") && restU.contains("PRIMARY KEY")
        Some(Col(name, if (rowid) LongType else t, rowid))
      }
    }
  }

  /** Strip the GeoPackage "GP" blob header, returning the inner WKB. */
  private[io] def gpbToWkb(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 8 && blob(0) == 'G'.toByte && blob(1) == 'P'.toByte,
      "not a GeoPackage geometry blob")
    val flags = blob(3) & 0xff
    require((flags & 0x20) == 0, "extended GPKG geometry encodings not supported")
    val envIndicator = (flags >> 1) & 0x07
    val envDoubles = envIndicator match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case other => throw new IllegalArgumentException(s"bad envelope indicator $other")
    }
    val bodyOff = 8 + envDoubles * 8
    if ((flags & 0x10) != 0)
      // empty-geometry flag: the spec still carries the WKB body of the
      // typed EMPTY geometry after the header — preserve it (EMPTY is
      // not NULL); a body-less blob (some writers) degrades to null
      return if (blob.length > bodyOff)
        java.util.Arrays.copyOfRange(blob, bodyOff, blob.length) else null
    java.util.Arrays.copyOfRange(blob, bodyOff, blob.length)
  }

  /** (geometry column, resolved CRS) per feature table, in ONE file open
    * and one pass over sqlite_master + gpkg_geometry_columns +
    * gpkg_spatial_ref_sys. Per the GPKG spec srs_id is a JOIN KEY into the
    * registry (not necessarily an EPSG code): the CRS resolves to
    * "EPSG:<organization_coordsys_id>" only when the registry row's
    * organization is EPSG; reserved ids (0 = undefined geographic, -1 =
    * undefined) and custom organizations yield None.
    */
  def featureMeta(spark: SparkSession, path: String): Map[String, (String, Option[String])] = {
    val src = openSource(spark.sessionState.newHadoopConf(), path)
    try featureMetaFrom(src, readMaster(src)) finally src.close()
  }

  private[io] def featureMetaFrom(src: PageSource,
      master: Seq[Master]): Map[String, (String, Option[String])] = {
    val registry: Map[Long, (String, Long)] =
      master.find(_.name == "gpkg_spatial_ref_sys") match {
        case None => Map.empty
        case Some(m) =>
          val out = ArrayBuffer.empty[(Long, (String, Long))]
          walk(src, m.rootPage, 0) { (rowid, payload) =>
            val r = decodeRecord(payload)
            // srs_id is INTEGER PRIMARY KEY -> NULL in the record, value
            // carried by the b-tree rowid
            val srsId = Option(r(1)).map(_.asInstanceOf[Long]).getOrElse(rowid)
            out += ((srsId, (r(2).asInstanceOf[String], r(3).asInstanceOf[Long])))
          }
          out.toMap
      }
    master.find(_.name == "gpkg_geometry_columns") match {
      case None => Map.empty
      case Some(m) =>
        val out = ArrayBuffer.empty[(String, (String, Option[String]))]
        walk(src, m.rootPage, 0) { (_, payload) =>
          val r = decodeRecord(payload)
          val srsId = r(3).asInstanceOf[Long]
          val crs = registry.get(srsId).collect {
            case (org, cid) if srsId > 0 && org.equalsIgnoreCase("EPSG") => s"EPSG:$cid"
          }
          out += ((r(0).asInstanceOf[String], (r(1).asInstanceOf[String], crs)))
        }
        out.toMap
    }
  }

  /** Tables declared in gpkg_geometry_columns: table -> geometry column. */
  def geometryColumns(spark: SparkSession, path: String): Map[String, String] =
    featureMeta(spark, path).map { case (t, (c, _)) => (t, c) }

  // ------------------------------------------------------------- write side
  //
  // A GeoPackage WRITER (the to_file half of the reference's pyogrio
  // surface, `io/file.py`): emits a complete single-file SQLite database
  // with gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns and
  // one feature table of GP geometry blobs, readable by `read` above (and
  // by any SQLite/OGR tool — the formats are public specs).
  //
  // Distribution choice (documented): per-row RECORD ENCODING — SQLite
  // serial-type records plus GP blob wrapping, the per-row CPU cost — runs
  // in parallel Spark tasks; PAGE ASSEMBLY is driver-side and sequential.
  // A SQLite file is one mutable b-tree: it has no valid multi-writer or
  // multi-file layout, so every writer (GDAL/pyogrio included) serializes
  // the file bytes single-threaded. The driver streams encoded records
  // partition-at-a-time (toLocalIterator — never a whole-table collect),
  // packs leaf pages, and builds interior nodes bottom-up: O(file bytes)
  // sequential work with O(page) memory. At 100 TB you shard across FILES
  // (one write call per shard), which is also how GDAL datasets scale.

  private[io] def varintEncode(v: Long): Array[Byte] = {
    if ((v >>> 56) != 0) {
      // 9-byte form: bytes 0-7 carry bits 63..8 (7 bits each, MSB set),
      // byte 8 carries the low 8 bits
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      val buf = ArrayBuffer[Byte]((v & 0x7f).toByte)
      var x = v >>> 7
      while (x != 0) { buf.prepend(((x & 0x7f) | 0x80).toByte); x >>>= 7 }
      buf.toArray
    }
  }

  private def intLen(l: Long): Int =
    if (l >= -128 && l < 128) 1
    else if (l >= -32768 && l < 32768) 2
    else if (l >= -(1L << 23) && l < (1L << 23)) 3
    else if (l >= -(1L << 31) && l < (1L << 31)) 4
    else if (l >= -(1L << 47) && l < (1L << 47)) 6
    else 8

  /** (serial type, value bytes) for one record value. */
  private def encodeValue(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case l: Long =>
      val len = intLen(l)
      val out = new Array[Byte](len)
      var i = 0
      while (i < len) { out(i) = (l >> (8 * (len - 1 - i))).toByte; i += 1 }
      (len match { case 1 => 1L; case 2 => 2L; case 3 => 3L
                   case 4 => 4L; case 6 => 5L; case _ => 6L }, out)
    case d: Double =>
      val out = new Array[Byte](8); ByteBuffer.wrap(out).putDouble(d); (7L, out)
    case s: String =>
      val b = s.getBytes("UTF-8"); (13L + 2L * b.length, b)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case other => throw new IllegalArgumentException(
      s"gpkg write: unencodable value class ${other.getClass.getName}")
  }

  /** SQLite record: varint(header len) + serial-type varints + values. */
  private[io] def encodeRecord(vals: Seq[Any]): Array[Byte] = {
    val tv = vals.map(encodeValue)
    val typesLen = tv.map(t => varintEncode(t._1).length).sum
    // header length includes its own varint — fixpoint (stable in <=2 steps)
    var hdrLen = typesLen + 1
    while (hdrLen != typesLen + varintEncode(hdrLen.toLong).length)
      hdrLen = typesLen + varintEncode(hdrLen.toLong).length
    val out = new java.io.ByteArrayOutputStream(hdrLen + tv.map(_._2.length).sum)
    out.write(varintEncode(hdrLen.toLong))
    tv.foreach(t => out.write(varintEncode(t._1)))
    tv.foreach(t => out.write(t._2))
    out.toByteArray
  }

  /** Wrap WKB in a GP blob (LE, envelope indicator 1 =
    * [minx,maxx,miny,maxy]); EMPTY geometries get the spec's empty bit
    * with envelope indicator 0 — never a +/-Infinity envelope.
    */
  private[io] def wkbToGpb(wkb: Array[Byte], srsId: Int): Array[Byte] = {
    val env = graft.geom.Wkb.envelopeOf(wkb)
    if (env.isEmpty) {
      val out = new Array[Byte](8 + wkb.length)
      out(0) = 'G'; out(1) = 'P'; out(2) = 0; out(3) = 0x11 // empty | LE
      ByteBuffer.wrap(out, 4, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(srsId)
      System.arraycopy(wkb, 0, out, 8, wkb.length)
      return out
    }
    val out = new Array[Byte](40 + wkb.length)
    out(0) = 'G'; out(1) = 'P'; out(2) = 0; out(3) = 0x03
    val bb = ByteBuffer.wrap(out, 4, 36).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(srsId)
    bb.putDouble(env.minX).putDouble(env.maxX).putDouble(env.minY).putDouble(env.maxY)
    System.arraycopy(wkb, 0, out, 40, wkb.length)
    out
  }

  /** Driver-side page store: pages are appended (1-based numbering) and
    * serialized in order at the end.
    */
  private[io] final class FileBuilder(val pageSize: Int) {
    val pages = ArrayBuffer.empty[Array[Byte]]
    def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length }
    def usable: Int = pageSize
  }

  /** One b-tree page image. `base` is 100 on page 1, else 0. Page types:
    * 0x0d leaf table, 0x05 interior table, 0x0a leaf index.
    */
  private[io] def writeBtreePage(pg: Array[Byte], base: Int, pageType: Int,
      cells: Seq[Array[Byte]], rightmost: Int, usable: Int): Unit = {
    val leaf = pageType != 0x05
    pg(base) = pageType.toByte
    pg(base + 3) = (cells.size >> 8).toByte; pg(base + 4) = cells.size.toByte
    val total = cells.iterator.map(_.length).sum
    var off = usable - total
    pg(base + 5) = (off >> 8).toByte; pg(base + 6) = off.toByte
    if (!leaf) ByteBuffer.wrap(pg, base + 8, 4).putInt(rightmost)
    val ptrBase = base + (if (leaf) 8 else 12)
    var i = 0
    cells.foreach { c =>
      System.arraycopy(c, 0, pg, off, c.length)
      pg(ptrBase + 2 * i) = (off >> 8).toByte; pg(ptrBase + 2 * i + 1) = off.toByte
      off += c.length; i += 1
    }
  }

  /** Single-leaf-page INDEX b-tree (for the tiny sqlite_autoindex trees a
    * PRIMARY KEY / UNIQUE constraint on a spec table demands — SQLite deems
    * the schema corrupt when a declared constraint has no index). Index
    * leaf cells are varint(len) + record(key columns..., rowid).
    */
  /** Build the SQLite R*-tree shadow b-trees for `entries` (rowid,
    * [minx,miny,maxx,maxy]) — the `rtree_<t>_<c>_node/_rowid/_parent`
    * trio OGR-written gpkgs carry, so files written here prune bbox
    * reads on re-read like any other gpkg. Node blobs use the public
    * rtree format (2-byte depth in the root, 2-byte cell count, cells of
    * int64 id + 4 big-endian float32 coords in minx/maxx/miny/maxy
    * order, fixed-size zero-padded blobs — SQLite derives the node size
    * from the root blob's length on open); float boxes round OUTWARD so
    * the float32 node box always contains the true envelope. Returns
    * (nodeRoot, rowidRoot, parentRoot) page numbers.
    */
  private[io] def buildRtree(entries0: IndexedSeq[(Long, Array[Double])],
      fb: FileBuilder): (Int, Int, Int) = {
    val MaxCells = 40
    val NodeSize = 4 + MaxCells * 24
    @inline def fDown(v: Double): Float = {
      val f = v.toFloat; if (f > v) Math.nextDown(f) else f
    }
    @inline def fUp(v: Double): Float = {
      val f = v.toFloat; if (f < v) Math.nextUp(f) else f
    }
    // hilbert-sort the entries by envelope midpoint so each packed leaf
    // covers a tight region: rowid-order packing gives every leaf a box
    // approximating the full layer on spatially shuffled data, making
    // the index worse than a scan (the FlatGeobuf writer sorts the same
    // way). The _rowid mapping below re-sorts by rowid for its b-tree.
    val (lx, ly, hx, hy) = entries0.foldLeft(
      (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)) {
      case ((a, b, c, d), (_, e)) =>
        (math.min(a, (e(0) + e(2)) / 2), math.min(b, (e(1) + e(3)) / 2),
          math.max(c, (e(0) + e(2)) / 2), math.max(d, (e(1) + e(3)) / 2))
    }
    val sx = if (hx > lx) ((1L << 16) - 1) / (hx - lx) else 0.0
    val sy = if (hy > ly) ((1L << 16) - 1) / (hy - ly) else 0.0
    val entries = entries0.sortBy { case (_, e) =>
      graft.geom.Sfc.hilbertXY2D(16,
        (((e(0) + e(2)) / 2 - lx) * sx).toLong,
        (((e(1) + e(3)) / 2 - ly) * sy).toLong)
    }
    // bottom-up packed build; children held ON the node (no structural-
    // equality bookkeeping — a mutable case-class groupBy key would merge
    // structurally equal parents)
    final class Node(val cells: IndexedSeq[(Long, Array[Double])],
        val children: IndexedSeq[Node], val depth: Int) {
      var no: Long = 0L
      val box: Array[Double] = {
        val b = Array(Double.MaxValue, Double.MaxValue,
          Double.MinValue, Double.MinValue)
        val boxes =
          if (children.nonEmpty) children.map(_.box) else cells.map(_._2)
        boxes.foreach { e =>
          b(0) = math.min(b(0), e(0)); b(1) = math.min(b(1), e(1))
          b(2) = math.max(b(2), e(2)); b(3) = math.max(b(3), e(3))
        }
        b
      }
    }
    var level: IndexedSeq[Node] = entries.grouped(MaxCells)
      .map(g => new Node(g, IndexedSeq.empty, 0)).toIndexedSeq
    val lower = ArrayBuffer.empty[Node]
    var depth = 0
    while (level.length > 1) {
      lower ++= level
      depth += 1
      level = level.grouped(MaxCells)
        .map(g => new Node(IndexedSeq.empty, g, depth)).toIndexedSeq
    }
    val root = level.headOption.getOrElse(
      new Node(IndexedSeq.empty, IndexedSeq.empty, 0))
    root.no = 1
    var next = 2L
    lower.foreach { n => n.no = next; next += 1 }
    def blobOf(n: Node, isRoot: Boolean): Array[Byte] = {
      val b = new Array[Byte](NodeSize)
      val bb = ByteBuffer.wrap(b)
      bb.putShort(0, if (isRoot) n.depth.toShort else 0)
      val cs: IndexedSeq[(Long, Array[Double])] =
        if (n.children.nonEmpty) n.children.map(c => (c.no, c.box)) else n.cells
      bb.putShort(2, cs.length.toShort)
      cs.zipWithIndex.foreach { case ((id, e), i) =>
        val off = 4 + i * 24
        bb.putLong(off, id)
        bb.putFloat(off + 8, fDown(e(0))); bb.putFloat(off + 12, fUp(e(2)))
        bb.putFloat(off + 16, fDown(e(1))); bb.putFloat(off + 20, fUp(e(3)))
      }
      b
    }
    val nodes = ((root, true) +: lower.map(n => (n, false))).sortBy(_._1.no)
    val nodeRoot = buildTableBtree(nodes.iterator.map { case (n, isRoot) =>
      (n.no, encodeRecord(Seq[Any](null, blobOf(n, isRoot))))
    }, fb)
    val leafOf = new java.util.HashMap[Long, Long]()
    (root +: lower).foreach { n =>
      if (n.children.isEmpty) n.cells.foreach { case (rid, _) => leafOf.put(rid, n.no) }
    }
    val rowidRoot = buildTableBtree(
      entries.map(_._1).sorted.iterator
        .map(rid => (rid, encodeRecord(Seq[Any](null, leafOf.get(rid))))), fb)
    val parentPairs = (root +: lower).flatMap(p => p.children.map(c => (c.no, p.no)))
    val parentRoot = buildTableBtree(parentPairs.sortBy(_._1).iterator
      .map { case (c, pn) => (c, encodeRecord(Seq[Any](null, pn))) }, fb)
    (nodeRoot, rowidRoot, parentRoot)
  }

  private[io] def buildSingleLeafIndex(keyRecords: Seq[Array[Byte]], fb: FileBuilder): Int = {
    val cells = keyRecords.map(r => varintEncode(r.length.toLong) ++ r)
    require(8 + 2 * cells.size + cells.map(_.length).sum <= fb.usable,
      "gpkg write: index rows overflow one page (unexpected for spec tables)")
    val pn = fb.alloc()
    writeBtreePage(fb.pages(pn - 1), 0, 0x0a, cells, 0, fb.usable)
    pn
  }

  /** Leaf-table cell for (rowid, record); spills to overflow pages per the
    * K/M/X rule (mirrors cellPayload on the read side).
    */
  private[io] def makeCell(rowid: Long, p: Array[Byte], fb: FileBuilder): Array[Byte] = {
    val u = fb.usable
    val x = u - 35
    val hdr = varintEncode(p.length.toLong) ++ varintEncode(rowid)
    if (p.length <= x) hdr ++ p
    else {
      val m = (u - 12) * 32 / 255 - 23
      val k = m + (p.length - m) % (u - 4)
      val inline = if (k <= x) k else m
      val chain = ArrayBuffer.empty[Int]
      var pos = inline
      while (pos < p.length) { chain += fb.alloc(); pos += u - 4 }
      pos = inline
      chain.zipWithIndex.foreach { case (pn, idx) =>
        val pg = fb.pages(pn - 1)
        ByteBuffer.wrap(pg, 0, 4).putInt(if (idx + 1 < chain.size) chain(idx + 1) else 0)
        val take = math.min(p.length - pos, u - 4)
        System.arraycopy(p, pos, pg, 4, take)
        pos += take
      }
      val head = new Array[Byte](4)
      ByteBuffer.wrap(head).putInt(chain.head)
      hdr ++ p.slice(0, inline) ++ head
    }
  }

  /** Build a table b-tree from rowid-ordered records; returns root page. */
  private[io] def buildTableBtree(records: Iterator[(Long, Array[Byte])],
      fb: FileBuilder): Int = {
    val u = fb.usable
    var level = ArrayBuffer.empty[(Int, Long)] // (pageNo, max rowid)
    var cells = ArrayBuffer.empty[Array[Byte]]
    var cellBytes = 0
    var maxRow = 0L
    var lastRow = Long.MinValue
    def flushLeaf(): Unit = if (cells.nonEmpty) {
      val pn = fb.alloc()
      writeBtreePage(fb.pages(pn - 1), 0, 0x0d, cells.toSeq, 0, u)
      level += ((pn, maxRow))
      cells = ArrayBuffer.empty; cellBytes = 0
    }
    records.foreach { case (rowid, rec) =>
      require(rowid > lastRow,
        s"gpkg write: rowids must be strictly increasing (got $rowid after $lastRow)")
      lastRow = rowid
      val cell = makeCell(rowid, rec, fb)
      if (cells.nonEmpty && 8 + 2 * (cells.size + 1) + cellBytes + cell.length > u)
        flushLeaf()
      cells += cell; cellBytes += cell.length; maxRow = rowid
    }
    flushLeaf()
    if (level.isEmpty) { // empty table still needs a root page
      val pn = fb.alloc()
      writeBtreePage(fb.pages(pn - 1), 0, 0x0d, Nil, 0, u)
      return pn
    }
    // interior levels bottom-up: cell = 4B child + varint(max rowid);
    // the level's last child is the page's rightmost pointer
    while (level.size > 1) {
      val next = ArrayBuffer.empty[(Int, Long)]
      var group = ArrayBuffer.empty[(Int, Long)]
      def groupCellBytes = group.iterator.map { case (_, r) => 4 + varintEncode(r).length }.sum
      def flushInterior(): Unit = if (group.nonEmpty) {
        val (rmPage, rmMax) = group.last
        val cs = group.dropRight(1).map { case (pn, mr) =>
          val c = new Array[Byte](4 + varintEncode(mr).length)
          ByteBuffer.wrap(c, 0, 4).putInt(pn)
          System.arraycopy(varintEncode(mr), 0, c, 4, c.length - 4)
          c
        }
        val pn = fb.alloc()
        writeBtreePage(fb.pages(pn - 1), 0, 0x05, cs.toSeq, rmPage, u)
        next += ((pn, rmMax))
        group = ArrayBuffer.empty
      }
      level.foreach { child =>
        // keep >= 2 children per interior page; capacity check on the cell area
        if (group.size >= 2 && 12 + 2 * group.size + groupCellBytes + 13 > u)
          flushInterior()
        group += child
      }
      flushInterior()
      level = next
    }
    level.head._1
  }

  private def fileHeader(pageSize: Int, nPages: Int,
      userVersion: Int, applicationId: Int): Array[Byte] = {
    val h = new Array[Byte](100)
    System.arraycopy("SQLite format 3".getBytes("US-ASCII"), 0, h, 0, 15)
    h(16) = (pageSize >> 8).toByte; h(17) = pageSize.toByte
    h(18) = 1; h(19) = 1 // rollback-journal read/write format versions
    h(21) = 64; h(22) = 32; h(23) = 32
    ByteBuffer.wrap(h, 24, 4).putInt(1) // file change counter
    ByteBuffer.wrap(h, 28, 4).putInt(nPages)
    ByteBuffer.wrap(h, 40, 4).putInt(1) // schema cookie
    ByteBuffer.wrap(h, 44, 4).putInt(4) // schema format (serial types 8/9 ok)
    ByteBuffer.wrap(h, 56, 4).putInt(1) // text encoding: UTF-8
    ByteBuffer.wrap(h, 60, 4).putInt(userVersion) // GPKG 1.3 = 10300
    ByteBuffer.wrap(h, 68, 4).putInt(applicationId) // "GPKG" = 0x47504B47
    ByteBuffer.wrap(h, 92, 4).putInt(1) // version-valid-for
    ByteBuffer.wrap(h, 96, 4).putInt(3045000)
    h
  }

  /** Write `gdf` as a complete single-file GeoPackage containing `table`.
    *
    * Layout contract (matches `read` back exactly): columns are
    * `fid INTEGER PRIMARY KEY` + every non-geometry attribute in DataFrame
    * order + the geometry column last as a GP blob. When the input already
    * has a LongType `fid` column its values become the rowids (they must
    * arrive strictly increasing — e.g. a GeoPackage read back, or an
    * orderBy upstream); otherwise fids are assigned 1..n in row order.
    * `lastChange` is the gpkg_contents timestamp — fixed by default so
    * output bytes are deterministic.
    */
  def write(gdf: graft.api.GeoDataFrame, path: String, table: String,
      pageSize: Int = 4096,
      lastChange: String = "2024-01-01T00:00:00.000Z",
      spatialIndex: Boolean = true): Unit =
    writeLayers(Seq(table -> gdf), path, pageSize, lastChange, spatialIndex)

  /** Multi-table write: one GeoPackage holding several feature tables
    * (OGR multi-layer parity — the reference writes any number of layers
    * into one gpkg via pyogrio), each with its own gpkg_contents /
    * gpkg_geometry_columns / gpkg_ogr_contents rows and its own R*-tree.
    * Same driver-side single-writer contract as `write` (single-file
    * format with a global catalog — interchange egress; shard across
    * .gpkg files to scale out).
    */
  def writeLayers(layers: Seq[(String, graft.api.GeoDataFrame)], path: String,
      pageSize: Int = 4096,
      lastChange: String = "2024-01-01T00:00:00.000Z",
      spatialIndex: Boolean = true): Unit = {
    require(pageSize >= 512 && pageSize <= 32768 &&
      Integer.bitCount(pageSize) == 1, s"pageSize must be a power of 2 in [512, 32768]")
    require(layers.nonEmpty, "gpkg write: at least one layer required")
    require(layers.map(_._1.toLowerCase).distinct.size == layers.size,
      s"gpkg write: duplicate layer names — SQLite identifiers are " +
        s"case-insensitive (${layers.map(_._1).mkString(", ")})")
    layers.foreach { case (t, _) =>
      val tl = t.toLowerCase
      require(t.nonEmpty && !tl.startsWith("gpkg_") && !tl.startsWith("sqlite_"),
        s"invalid feature table name '$t'")
    }

    val fb = new FileBuilder(pageSize)
    fb.alloc() // page 1 reserved for the sqlite_master root
    val enc = layers.map { case (t, g) =>
      encodeLayer(g, t, fb, "gpkg", wkbToGpb, geomDdlType = "BLOB")
    }

    // spec tables (driver-built, tiny). srs_id is an INTEGER PRIMARY KEY →
    // value NULL, rowid carries it; rows must feed in rowid order.
    val srsDdl = "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, " +
      "srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, " +
      "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, " +
      "description TEXT)"
    val wgs84Def = "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
      "SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0]," +
      "UNIT[\"degree\",0.0174532925199433]]"
    val srsRows: Seq[(Long, Seq[Any])] = {
      val std = Seq(
        (-1L, Seq[Any]("Undefined cartesian SRS", null, "NONE", -1L, "undefined", null)),
        (0L, Seq[Any]("Undefined geographic SRS", null, "NONE", 0L, "undefined", null)),
        (4326L, Seq[Any]("WGS 84 geodetic", null, "EPSG", 4326L, wgs84Def, null)))
      val extra = enc.map(_.srsId).filter(id => id > 0 && id != 4326).distinct
        .map(id => (id.toLong,
          Seq[Any](s"EPSG:$id", null, "EPSG", id.toLong, "undefined", null)))
      (std ++ extra).sortBy(_._1)
    }
    val srsRoot = buildTableBtree(
      srsRows.iterator.map { case (id, vals) => (id, encodeRecord(vals)) }, fb)

    val contentsDdl = "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, " +
      "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', " +
      "last_change DATETIME NOT NULL, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, " +
      "max_y DOUBLE, srs_id INTEGER)"
    val contentsRoot = buildTableBtree(enc.iterator.zipWithIndex.map { case (e, i) =>
      val b = e.bbox
      ((i + 1).toLong, encodeRecord(Seq[Any](
        e.table, "features", e.table, "", lastChange,
        if (b == null) null else b(0), if (b == null) null else b(1),
        if (b == null) null else b(2), if (b == null) null else b(3),
        e.srsId.toLong)))
    }, fb)

    // gpkg_contents declares a TEXT PRIMARY KEY + a UNIQUE column: SQLite
    // requires their sqlite_autoindex_* b-trees to EXIST (a declared
    // constraint with no index = corrupt schema to integrity_check).
    // Index records are (key columns..., table rowid), fed in KEY order
    // (BINARY collation = plain string order for these names).
    val contentsIdxRecords = enc.zipWithIndex.sortBy(_._1.table)
      .map { case (e, i) => encodeRecord(Seq[Any](e.table, (i + 1).toLong)) }
    val contentsPkIdx = buildSingleLeafIndex(contentsIdxRecords, fb)
    val contentsUqIdx = buildSingleLeafIndex(contentsIdxRecords, fb)

    val geomColsDdl = "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, " +
      "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, " +
      "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)"
    // geometry_type_name takes Table-27/Annex-G names ONLY — Z-ness is
    // carried by the z column (below), not a type-name suffix; strict
    // validators flag "GEOMETRYZ" even though GDAL tolerates it
    val geomColsRoot = buildTableBtree(enc.iterator.zipWithIndex.map { case (e, i) =>
      ((i + 1).toLong, encodeRecord(Seq[Any](
        e.table, e.geomCol, "GEOMETRY",
        e.srsId.toLong, if (e.hasZ) 1L else 0L, 0L)))
    }, fb)

    // OGR's feature-count convention (gpkg_ogr_contents): lets any OGR
    // reader — and this repo's DSv2 COUNT(*) pushdown — answer
    // GetFeatureCount from metadata instead of a table scan
    val ogrContentsDdl = "CREATE TABLE gpkg_ogr_contents (table_name TEXT NOT NULL " +
      "PRIMARY KEY, feature_count INTEGER DEFAULT NULL)"
    val ogrContentsRoot = buildTableBtree(enc.iterator.zipWithIndex.map { case (e, i) =>
      ((i + 1).toLong, encodeRecord(Seq[Any](e.table, e.featureCount)))
    }, fb)
    val ogrContentsPkIdx = buildSingleLeafIndex(
      enc.zipWithIndex.sortBy(_._1.table)
        .map { case (e, i) => encodeRecord(Seq[Any](e.table, (i + 1).toLong)) }, fb)

    // spatial index (the gpkg_rtree_index extension, exactly as OGR
    // registers it): per-layer R*-tree shadow trio + virtual-table master
    // entries + one gpkg_extensions row per indexed layer — written files
    // prune bbox reads on re-read like any OGR-written gpkg
    val extRows = ArrayBuffer.empty[Seq[Any]]
    val rtreeMasterRows: Seq[(String, String, String, Int, String)] =
      enc.flatMap { e =>
        if (!spatialIndex || e.rtreeEntries.isEmpty) Nil
        else {
          val (nodeRoot, rowidRoot, parentRoot) = buildRtree(e.rtreeEntries, fb)
          val rt = s"rtree_${e.table}_${e.geomCol}"
          extRows += Seq[Any](e.table, e.geomCol, "gpkg_rtree_index",
            "http://www.geopackage.org/spec120/#extension_rtree", "write-only")
          Seq(
            ("table", rt, rt, 0,
              s"""CREATE VIRTUAL TABLE "$rt" USING rtree("id", "minx", "maxx", "miny", "maxy")"""),
            ("table", s"${rt}_node", s"${rt}_node", nodeRoot,
              s"""CREATE TABLE "${rt}_node"(nodeno INTEGER PRIMARY KEY,data)"""),
            ("table", s"${rt}_rowid", s"${rt}_rowid", rowidRoot,
              s"""CREATE TABLE "${rt}_rowid"(rowid INTEGER PRIMARY KEY,nodeno)"""),
            ("table", s"${rt}_parent", s"${rt}_parent", parentRoot,
              s"""CREATE TABLE "${rt}_parent"(nodeno INTEGER PRIMARY KEY,parentnode)"""))
        }
      }
    val extMasterRows: Seq[(String, String, String, Int, String)] =
      if (extRows.isEmpty) Nil
      else {
        val extDdl = "CREATE TABLE gpkg_extensions (table_name TEXT, " +
          "column_name TEXT, extension_name TEXT NOT NULL, " +
          "definition TEXT NOT NULL, scope TEXT NOT NULL)"
        val extRoot = buildTableBtree(extRows.iterator.zipWithIndex.map {
          case (vals, i) => ((i + 1).toLong, encodeRecord(vals))
        }, fb)
        Seq(("table", "gpkg_extensions", "gpkg_extensions", extRoot, extDdl))
      }

    // sqlite_master on page 1 (base 100): (type, name, tbl_name, rootpage, sql)
    val masterRows = Seq(
      ("table", "gpkg_spatial_ref_sys", "gpkg_spatial_ref_sys", srsRoot, srsDdl),
      ("table", "gpkg_contents", "gpkg_contents", contentsRoot, contentsDdl),
      ("index", "sqlite_autoindex_gpkg_contents_1", "gpkg_contents", contentsPkIdx, null),
      ("index", "sqlite_autoindex_gpkg_contents_2", "gpkg_contents", contentsUqIdx, null),
      ("table", "gpkg_geometry_columns", "gpkg_geometry_columns", geomColsRoot, geomColsDdl),
      ("table", "gpkg_ogr_contents", "gpkg_ogr_contents", ogrContentsRoot, ogrContentsDdl),
      ("index", "sqlite_autoindex_gpkg_ogr_contents_1", "gpkg_ogr_contents", ogrContentsPkIdx, null)) ++
      rtreeMasterRows ++ extMasterRows ++
      enc.map(e => ("table", e.table, e.table, e.featureRoot, e.ddl))
    finishFile(fb, masterRows, path,
      layers.head._2.df.sparkSession.sessionState.newHadoopConf(),
      userVersion = 10300, applicationId = 0x47504B47)
  }

  /** One encoded feature table: schema derivation, task-side record +
    * envelope encoding, the driver-side ordered b-tree assembly. The
    * geometry blob framing (`geomEncode`) and the geometry column's DDL
    * type name are the dialect's (GeoPackage: GP blob / BLOB; SpatiaLite:
    * serialized geometry / the class name AddGeometryColumn declares).
    */
  private[io] final case class EncodedLayer(table: String, geomCol: String,
      srsId: Int, ddl: String, featureRoot: Int, bbox: Array[Double],
      featureCount: Long, rtreeEntries: IndexedSeq[(Long, Array[Double])],
      hasZ: Boolean)

  /** Cheap Z peek on a WKB header (ISO +1000/+3000 bands or the EWKB
    * flag) — no geometry parse; feeds the catalogs' dimension columns.
    */
  private[io] def wkbHasZ(wkb: Array[Byte]): Boolean =
    wkb != null && wkb.length >= 5 && {
      val bb = ByteBuffer.wrap(wkb, 1, 4)
        .order(if (wkb(0) == 1) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
      val t = bb.getInt()
      val f = t & 0x1fffffff
      (t & 0x80000000) != 0 || (f >= 1000 && f < 2000) || (f >= 3000 && f < 4000)
    }

  /** Reject identifiers that would corrupt spliced DDL: an embedded
    * double quote ends the quoted identifier early (the fixture-grade
    * parseColumns would silently misparse the schema on re-read), and
    * control characters have no business in a table/column name.
    * Rejection over quote-doubling: a loud error beats a file whose
    * round-trip schema silently differs.
    */
  private[io] def requireCleanIdent(name: String, what: String, tag: String): Unit =
    require(!name.contains("\"") && !name.exists(_ < ' '),
      s"""$tag write: $what name ${name.replace("\"", "\\\"")} contains a """ +
        "double quote or control character — it would corrupt the spliced " +
        "CREATE TABLE DDL; rename it")

  private[io] def encodeLayer(gdf: graft.api.GeoDataFrame, table: String,
      fb: FileBuilder, tag: String,
      geomEncode: (Array[Byte], Int) => Array[Byte],
      geomDdlType: String): EncodedLayer = {
    val df = gdf.df
    val geomCol = gdf.geometryColumn
    requireCleanIdent(table, "table", tag)
    df.schema.fields.foreach(f => requireCleanIdent(f.name, "column", tag))
    val srsId: Int = gdf.crs.flatMap { c =>
      if (c.toUpperCase.startsWith("EPSG:")) c.drop(5).toIntOption else None
    }.getOrElse(0)
    val fields = df.schema.fields
    val geomIdx = df.schema.fieldIndex(geomCol)
    // the rowid alias: a column named fid (case-insensitive — SQLite
    // identifiers are) of integral type supplies rowids; a fid of any
    // other type would silently duplicate into the DDL beside the
    // synthesized PK (a corrupt schema), so refuse it loudly
    val fidIdx = fields.indexWhere(f => f.name.equalsIgnoreCase("fid") &&
      (f.dataType == LongType || f.dataType == IntegerType))
    fields.find(f => f.name.equalsIgnoreCase("fid")).foreach { f =>
      require(f.dataType == LongType || f.dataType == IntegerType,
        s"$tag write: column '${f.name}' must be integral to serve as the " +
          s"fid rowid alias (got ${f.dataType}) — rename or cast it")
    }
    val attrs = fields.zipWithIndex.filter { case (f, i) => i != geomIdx && i != fidIdx }
    val sqlType: PartialFunction[DataType, String] = {
      case LongType | IntegerType => "INTEGER"
      case BooleanType => "BOOLEAN"
      case DoubleType | FloatType => "DOUBLE"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
    }
    attrs.foreach { case (f, _) =>
      require(sqlType.isDefinedAt(f.dataType),
        s"$tag write: unsupported column type ${f.dataType} for '${f.name}'")
    }
    val ddl = s"""CREATE TABLE "$table" (fid INTEGER PRIMARY KEY""" +
      attrs.map { case (f, _) => s""", "${f.name}" ${sqlType(f.dataType)}""" }.mkString +
      s""", "$geomCol" $geomDdlType)"""

    // -------- task-side: encode records (+ per-row envelope for the
    // contents bbox); rowids from fid or from a running row index
    val attrIdx = attrs.map(_._2)
    val geomI = geomIdx
    val fidI = fidIdx
    val srs = srsId
    val tagS = tag
    // without a fid column, zipWithIndex runs a count job over base
    // BEFORE toLocalIterator drains it — persist so the upstream plan
    // (possibly join/UDF-heavy) executes once, not twice
    var persisted: org.apache.spark.rdd.RDD[_] = null
    val encoded: org.apache.spark.rdd.RDD[(Long, Array[Byte], Array[Double], Boolean)] = {
      val base =
        if (fidIdx >= 0) df.rdd
        else {
          val b = df.rdd.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          persisted = b
          b
        }
      val withId =
        if (fidI >= 0) base.map { r =>
          (r.get(fidI) match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case null => throw new IllegalArgumentException(
              s"$tagS write: null fid (the rowid alias must be non-null)")
          }, r)
        }
        else base.zipWithIndex().map { case (r, i) => (i + 1, r) }
      withId.map { case (rowid, r) =>
        val vals = new Array[Any](attrIdx.length + 2)
        vals(0) = null // fid rides in the b-tree key (rowid alias)
        var c = 0
        while (c < attrIdx.length) {
          vals(c + 1) = r.get(attrIdx(c)) match {
            case null => null
            case i: java.lang.Integer => i.longValue()
            case b: java.lang.Boolean => if (b) 1L else 0L
            case f: java.lang.Float => f.doubleValue()
            case l: java.lang.Long => l.longValue()
            case d: java.lang.Double => d.doubleValue()
            case s: String => s
            case b: Array[Byte] => b
            case other => throw new IllegalArgumentException(
              s"$tagS write: unencodable value ${other.getClass.getName}")
          }
          c += 1
        }
        val wkb = r.get(geomI).asInstanceOf[Array[Byte]]
        val env: Array[Double] =
          if (wkb == null) null
          else {
            // EMPTY geometries have an inverted envelope: they carry no
            // env (an all-empty layer leaves the contents bbox null
            // instead of stamping +/-Infinity)
            val e = graft.geom.Wkb.envelopeOf(wkb)
            if (e.isEmpty) null else Array(e.minX, e.minY, e.maxX, e.maxY)
          }
        vals(attrIdx.length + 1) = if (wkb == null) null else geomEncode(wkb, srs)
        (rowid, encodeRecord(vals.toIndexedSeq), env, wkbHasZ(wkb))
      }
    }

    // -------- driver-side: stream partitions in order, assemble pages
    var bbox: Array[Double] = null
    var featureCount = 0L
    // (rowid, envelope) pairs feed the R*-tree build after the feature
    // b-tree: 40 bytes/row driver-side — the same order of memory the
    // page assembly already holds, bounded by the single-writer contract
    val rtreeEntries = ArrayBuffer.empty[(Long, Array[Double])]
    var anyZ = false
    val featureRoot = buildTableBtree(
      encoded.toLocalIterator.map { case (rowid, rec, env, z) =>
        if (z) anyZ = true
        if (env != null) {
          if (bbox == null) bbox = env.clone()
          else {
            bbox(0) = math.min(bbox(0), env(0)); bbox(1) = math.min(bbox(1), env(1))
            bbox(2) = math.max(bbox(2), env(2)); bbox(3) = math.max(bbox(3), env(3))
          }
          // empty geometries (e.g. a fillna GEOMETRYCOLLECTION EMPTY)
          // have an inverted +Inf/-Inf envelope: the gpkg rtree triggers
          // exclude them (NOT ST_IsEmpty) and SQLite requires min<=max
          if (env(0) <= env(2) && env(1) <= env(3)) rtreeEntries += ((rowid, env))
        }
        featureCount += 1
        (rowid, rec)
      }, fb)
    // the stream is fully drained (buildTableBtree returned) — the
    // cached upstream can go
    if (persisted != null) persisted.unpersist(blocking = false)
    EncodedLayer(table, geomCol, srsId, ddl, featureRoot, bbox,
      featureCount, rtreeEntries.toIndexedSeq, anyZ)
  }

  /** Assemble sqlite_master onto page 1 (spilling to leaf pages under
    * small page sizes), stamp the 100-byte header, and write all pages.
    */
  private[io] def finishFile(fb: FileBuilder,
      masterRows: Seq[(String, String, String, Int, String)],
      path: String, conf: org.apache.hadoop.conf.Configuration,
      userVersion: Int, applicationId: Int): Unit = {
    val masterCells = masterRows.zipWithIndex.map { case ((typ, name, tbl, root, sql), i) =>
      (i + 1L, makeCell(i + 1L, encodeRecord(Seq[Any](typ, name, tbl, root.toLong, sql)), fb))
    }
    val masterBytes = masterCells.map(_._2.length).sum
    if (100 + 8 + 2 * masterCells.size + masterBytes <= fb.usable) {
      // common case: all master cells fit the page-1 leaf directly
      writeBtreePage(fb.pages(0), 100, 0x0d, masterCells.map(_._2), 0, fb.usable)
    } else {
      // many layers or small page size: spill master cells to leaf pages,
      // with the (page 1) root as an interior node — its cells are 13
      // bytes each over a handful of leaves, so it fits beside the header
      val leaves = ArrayBuffer.empty[(Int, Long)]
      var cur = ArrayBuffer.empty[Array[Byte]]
      var curBytes = 0
      var maxRow = 0L
      def flush(): Unit = if (cur.nonEmpty) {
        val pn = fb.alloc()
        writeBtreePage(fb.pages(pn - 1), 0, 0x0d, cur.toSeq, 0, fb.usable)
        leaves += ((pn, maxRow)); cur = ArrayBuffer.empty; curBytes = 0
      }
      masterCells.foreach { case (rowid, cell) =>
        if (cur.nonEmpty && 8 + 2 * (cur.size + 1) + curBytes + cell.length > fb.usable)
          flush()
        cur += cell; curBytes += cell.length; maxRow = rowid
      }
      flush()
      val rootCells = leaves.dropRight(1).map { case (pn, mr) =>
        val vi = varintEncode(mr)
        val c = new Array[Byte](4 + vi.length)
        ByteBuffer.wrap(c, 0, 4).putInt(pn)
        System.arraycopy(vi, 0, c, 4, vi.length)
        c
      }
      require(100 + 12 + 2 * rootCells.size + rootCells.map(_.length).sum <= fb.usable,
        "sqlite write: sqlite_master interior root overflows page 1; raise pageSize")
      writeBtreePage(fb.pages(0), 100, 0x05, rootCells.toSeq, leaves.last._1, fb.usable)
    }
    System.arraycopy(
      fileHeader(fb.pageSize, fb.pages.length, userVersion, applicationId),
      0, fb.pages(0), 0, 100)

    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try fb.pages.foreach(out.write) finally out.close()
  }

  /** Distributed read of one feature (or plain) table. The driver touches
    * the header + sqlite_master + one root page; each root child subtree
    * becomes a task.
    */
  /** One (rowid, payload) record as an output Row — affinity coercions with
    * table/column/rowid context on parse failures.
    */
  private[io] def materializeRow(colArr: Array[Col], geomIdx: Int, table: String,
      rowid: Long, payload: Array[Byte],
      geomDecode: Array[Byte] => Array[Byte]): Row = {
    val rec = decodeRecord(payload)
    val vals = new Array[Any](colArr.length)
    var i = 0
    while (i < colArr.length) {
      val raw = if (i < rec.length) rec(i) else null
      vals(i) =
        if (colArr(i).rowidAlias && raw == null) rowid
        else if (i == geomIdx && raw != null) geomDecode(raw.asInstanceOf[Array[Byte]])
        else (raw, colArr(i).sparkType) match {
          // SQLite is dynamically typed: coerce stray representations
          // to the declared column affinity
          case (l: java.lang.Long, DoubleType) => l.toDouble
          case (d: java.lang.Double, LongType) => d.longValue()
          case (l: java.lang.Long, StringType) => l.toString
          case (d: java.lang.Double, StringType) => d.toString
          // TEXT stored in an INTEGER/REAL-affinity column is legal
          // under SQLite's dynamic typing but may not parse — fail
          // with table/column/rowid context so a malformed
          // third-party gpkg is diagnosable, not a bare
          // NumberFormatException mid-task
          case (s: String, LongType) =>
            try s.toLong catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"gpkg read: table '$table' column '${colArr(i).name}' " +
                  s"rowid $rowid: TEXT value '$s' does not parse as INTEGER")
            }
          case (s: String, DoubleType) =>
            try s.toDouble catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"gpkg read: table '$table' column '${colArr(i).name}' " +
                  s"rowid $rowid: TEXT value '$s' does not parse as REAL")
            }
          case (v, _) => v
        }
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  /** Distributed read. With `bbox` AND a SQLite R*-tree spatial index in
    * the file (the `rtree_<table>_<geom>_node` shadow table every
    * OGR-written gpkg carries), the driver traverses the R-tree for
    * candidate rowids (superset — float32 node boxes), tasks point-look
    * them up in the feature b-tree, and an exact envelope residual runs
    * task-side. Without an index, `bbox` degrades to a full scan + exact
    * residual (correct, unpruned).
    */
  def read(spark: SparkSession, path: String, table: String,
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame =
    readFeatureTable(spark, path, table, bbox,
      geomColFor = (src, master) =>
        resolveCI(featureMetaFrom(src, master), table).map(_._2._1),
      rtreeNodeName = (t, g) => s"rtree_${t}_${g}_node",
      geomDecode = gpbToWkb)

  /** Shared SQLite feature-table scan: one driver-side open (master +
    * geometry metadata + root page, + the R-tree candidate walk when
    * pruning), then either subtree-partitioned full walks or chunked
    * rowid point-lookups task-side. The metadata DIALECT is injected:
    * GeoPackage resolves the geometry column via gpkg_geometry_columns
    * and `rtree_<t>_<c>_node` shadow tables with GP blobs; SpatiaLite via
    * `geometry_columns` / `idx_<t>_<c>_node` with its own blob framing.
    */
  private[io] def readFeatureTable(spark: SparkSession, path: String,
      table: String, bbox: Option[(Double, Double, Double, Double)],
      geomColFor: (PageSource, Seq[Master]) => Option[String],
      rtreeNodeName: (String, String) => String,
      geomDecode: Array[Byte] => Array[Byte]): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val src = openSource(conf, path)
    val (cols, roots, geomCol, candidates, tableRoot) = try {
      val master = readMaster(src)
      val m = findMaster(master, table).getOrElse(
        throw new IllegalArgumentException(
          s"no table '$table' in $path (tables: ${master.map(_.name).mkString(", ")})"))
      require(m.rootPage > 0, s"table '$table' is virtual (rootpage 0, e.g. an " +
        "rtree spatial-index shadow table) — only ordinary tables are readable")
      // force the resolved geometry column to BinaryType: SpatiaLite DDL
      // (AddGeometryColumn) declares it with a SQL type name
      // (POINT/LINESTRING/GEOMETRY) that parseColumns maps to StringType,
      // while materializeRow always emits WKB bytes there
      val geomCol = geomColFor(src, master)
      val cols = forceGeomBinary(parseColumns(m.sql), geomCol)
      val cands: Option[Array[Long]] = (bbox, geomCol) match {
        case (Some((qx0, qy0, qx1, qy1)), Some(g)) =>
          findMaster(master, rtreeNodeName(m.name, g)).filter(_.rootPage > 0)
            .map(node => rtreeCandidates(src, node.rootPage, qx0, qy0, qx1, qy1).sorted)
        case _ => None
      }
      (cols, groupedSubtreeRoots(src, m.rootPage, 0,
        target = spark.sparkContext.defaultParallelism * 4), geomCol, cands, m.rootPage)
    } finally src.close()
    val schema = StructType(cols.map(c => StructField(c.name, c.sparkType)))
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val pathStr = path
    val colArr = cols.toArray
    val geomIdx = geomCol.map(g => cols.indexWhere(_.name.equalsIgnoreCase(g))).getOrElse(-1)
    val tname = table
    val residual: Row => Boolean = bbox match {
      case Some((qx0, qy0, qx1, qy1)) if geomIdx >= 0 => { r =>
        val wkb = r.get(geomIdx).asInstanceOf[Array[Byte]]
        wkb != null && {
          val e = graft.geom.Wkb.envelopeOf(wkb)
          e.minX <= qx1 && e.maxX >= qx0 && e.minY <= qy1 && e.maxY >= qy0
        }
      }
      case _ => _ => true
    }
    val rows = candidates match {
      case Some(rowids) if rowids.isEmpty => spark.sparkContext.emptyRDD[Row]
      case Some(rowids) =>
        // candidate point-lookups, chunked; each task walks root->leaf per
        // rowid (sorted, so the hot interior path stays in the OS cache)
        val chunkSize = math.max(256, rowids.length / math.max(1, spark.sparkContext.defaultParallelism))
        val chunks = rowids.grouped(chunkSize).toSeq
        spark.sparkContext.parallelize(chunks, chunks.size).flatMap { ids =>
          val tsrc = openSource(sconf.value, pathStr)
          val out = ArrayBuffer.empty[Row]
          try {
            ids.foreach { rid =>
              btreeLookup(tsrc, tableRoot, rid).foreach { payload =>
                val row = materializeRow(colArr, geomIdx, tname, rid, payload, geomDecode)
                if (residual(row)) out += row
              }
            }
          } finally tsrc.close()
          out.iterator
        }
      case None =>
        val slices = math.max(1, roots.size)
        spark.sparkContext.parallelize(roots, slices).flatMap { group =>
          val tsrc = openSource(sconf.value, pathStr)
          val out = ArrayBuffer.empty[Row]
          try {
            group.foreach { root =>
              walk(tsrc, root, 0) { (rowid, payload) =>
                val row = materializeRow(colArr, geomIdx, tname, rowid, payload, geomDecode)
                if (residual(row)) out += row
              }
            }
          } finally tsrc.close()
          out.iterator
        }
    }
    spark.createDataFrame(rows, schema)
  }

  /** True when the file carries a SQLite R*-tree spatial index for the
    * table's geometry column — the precondition for bbox-pruned reads.
    */
  def hasRtree(spark: SparkSession, path: String, table: String): Boolean = {
    val src = openSource(spark.sessionState.newHadoopConf(), path)
    try {
      val master = readMaster(src)
      resolveCI(featureMetaFrom(src, master), table).exists { case (t, (g, _)) =>
        findMaster(master, s"rtree_${t}_${g}_node").exists(_.rootPage > 0)
      }
    } finally src.close()
  }
}
