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
  private final class PageSource(in: FSDataInputStream, val pageSize: Int,
      val usable: Int) {
    def page(n: Long): Array[Byte] = {
      val buf = new Array[Byte](pageSize)
      in.readFully((n - 1) * pageSize, buf)
      buf
    }
    def close(): Unit = in.close()
  }

  private def openSource(conf: org.apache.hadoop.conf.Configuration,
      path: String): PageSource = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val head = new Array[Byte](100)
    in.readFully(0, head)
    require(new String(head, 0, 15, "US-ASCII") == "SQLite format 3",
      s"$path is not a SQLite database")
    val ps0 = ((head(16) & 0xff) << 8) | (head(17) & 0xff)
    val pageSize = if (ps0 == 1) 65536 else ps0
    val reserved = head(20) & 0xff
    // format-version 2 = WAL journaling: recent rows may live only in the
    // -wal sidecar, so a silent main-file walk would return stale data —
    // fail loud instead (checkpoint the database first)
    require(head(18) != 2 && head(19) != 2,
      s"$path uses WAL journaling (uncheckpointed -wal may hold newer rows); " +
        "checkpoint it to rollback-journal mode before reading")
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
  private def decodeRecord(payload: Array[Byte]): Array[Any] = {
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
  private def walk(src: PageSource, pageNo: Long, headerSkip: Int)(
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

  /** Child subtree roots of a table root page (the distributed-read units).
    * Leaf root -> itself.
    */
  private def subtreeRoots(src: PageSource, rootPage: Long, headerSkip: Int): Seq[Long] = {
    val page = src.page(rootPage)
    val base = headerSkip
    if ((page(base) & 0xff) == 0x0d) return Seq(rootPage)
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
    out.toSeq
  }

  private final case class Master(name: String, rootPage: Long, sql: String)

  private def readMaster(src: PageSource): Seq[Master] = {
    val out = ArrayBuffer.empty[Master]
    walk(src, 1L, 100) { (_, payload) =>
      val r = decodeRecord(payload)
      if (r.length >= 5 && r(0) == "table")
        out += Master(r(1).asInstanceOf[String], r(3).asInstanceOf[Long],
          Option(r(4)).map(_.asInstanceOf[String]).getOrElse(""))
    }
    out.toSeq
  }

  private final case class Col(name: String, sparkType: DataType, rowidAlias: Boolean)

  /** Fixture-grade DDL parse: top-level comma split of the column list;
    * first token = name (optionally quoted), rest = type + constraints.
    * Table-level constraints (PRIMARY KEY(...), UNIQUE(...), CHECK...,
    * FOREIGN KEY...) are skipped.
    */
  private def parseColumns(sql: String): Seq[Col] = {
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
  private def gpbToWkb(blob: Array[Byte]): Array[Byte] = {
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
    if ((flags & 0x10) != 0) return null // empty-geometry flag
    java.util.Arrays.copyOfRange(blob, 8 + envDoubles * 8, blob.length)
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

  private def featureMetaFrom(src: PageSource,
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

  /** Distributed read of one feature (or plain) table. The driver touches
    * the header + sqlite_master + one root page; each root child subtree
    * becomes a task.
    */
  def read(spark: SparkSession, path: String, table: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val src = openSource(conf, path)
    // one driver-side open: master + geometry metadata + the root page
    val (cols, roots, geomCol) = try {
      val master = readMaster(src)
      val m = master.find(_.name == table).getOrElse(
        throw new IllegalArgumentException(
          s"no table '$table' in $path (tables: ${master.map(_.name).mkString(", ")})"))
      require(m.rootPage > 0, s"table '$table' is virtual (rootpage 0, e.g. an " +
        "rtree spatial-index shadow table) — only ordinary tables are readable")
      val cols = parseColumns(m.sql)
      // reuse the already-decoded master — no second sqlite_master walk
      val geomCol = featureMetaFrom(src, master).get(table).map(_._1)
      (cols, subtreeRoots(src, m.rootPage, 0), geomCol)
    } finally src.close()
    val schema = StructType(cols.map(c => StructField(c.name, c.sparkType)))
    val sconf = new GeoParquetIO.SerializableConf(conf)
    val pathStr = path
    val colArr = cols.toArray
    val geomIdx = geomCol.map(g => cols.indexWhere(_.name == g)).getOrElse(-1)
    val slices = math.max(1, roots.size)
    val rows = spark.sparkContext.parallelize(roots, slices).flatMap { root =>
      val tsrc = openSource(sconf.value, pathStr)
      val out = ArrayBuffer.empty[Row]
      try {
        walk(tsrc, root, 0) { (rowid, payload) =>
          val rec = decodeRecord(payload)
          val vals = new Array[Any](colArr.length)
          var i = 0
          while (i < colArr.length) {
            val raw = if (i < rec.length) rec(i) else null
            vals(i) =
              if (colArr(i).rowidAlias && raw == null) rowid
              else if (i == geomIdx && raw != null) gpbToWkb(raw.asInstanceOf[Array[Byte]])
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
          out += Row.fromSeq(vals.toIndexedSeq)
        }
      } finally tsrc.close()
      out.iterator
    }
    spark.createDataFrame(rows, schema)
  }
}
