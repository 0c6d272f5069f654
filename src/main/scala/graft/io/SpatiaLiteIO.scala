package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, GeometryCollection, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** SpatiaLite read/write — the other SQLite geometry dialect the reference's
  * `read_file` opens through pyogrio (OGR SQLite driver,
  * `dask_geopandas/io/file.py:49-149`). The SQLite kernel (pages,
  * b-trees, overflow chains, record serial types, R*-tree shadow nodes)
  * is shared with [[GeoPackageIO]] — only the metadata dialect and the
  * geometry-blob framing differ:
  *
  *  - discovery: the `geometry_columns` table (f_table_name,
  *    f_geometry_column, type, coord_dimension, srid,
  *    spatial_index_enabled) instead of gpkg_geometry_columns, with CRS
  *    resolution through `spatial_ref_sys` (auth_name/auth_srid).
  *    Both the v4+ layout (geometry_type INTEGER) and the legacy v2/3
  *    layout (type TEXT) are accepted — only columns 0/1 and srid are
  *    consumed.
  *  - spatial index: `idx_<table>_<geom>` R*-tree virtual table, whose
  *    `idx_<table>_<geom>_node` shadow b-tree this reader consumes for
  *    bbox pruning (same float32 node-box walk as the GPKG path).
  *  - geometry blobs (SpatiaLite serialized geometry, a public format):
  *    0x00 start byte, endianness byte (0x01 little), int32 SRID, the
  *    4-double MBR, 0x7C marker, int32 geometry class (1 point …
  *    7 collection; +1000/2000/3000 for Z/M/ZM), the coordinate body
  *    (multi-part members each prefixed by a 0x69 entity marker + class
  *    int), 0xFE end byte.
  *
  * Scale shape: identical to [[GeoPackageIO]] — driver touches header +
  * sqlite_master + root page (+ the R-tree walk when pruning); each root
  * subtree or candidate chunk is one task. Writes share the gpkg page /
  * b-tree / R*-tree builders with only the dialect swapped (same
  * single-writer interchange-egress contract).
  */
object SpatiaLiteIO {
  import GeoPackageIO.{FileBuilder, Master, PageSource, buildRtree,
    buildTableBtree, decodeRecord, encodeLayer, encodeRecord, finishFile,
    openSource, readFeatureTable, readMaster, walk}

  /** table -> (geometry column, resolved CRS) from `geometry_columns` +
    * `spatial_ref_sys` (EPSG rows only; custom authorities yield None).
    */
  def geometryColumns(spark: SparkSession,
      path: String): Map[String, (String, Option[String])] = {
    val src = openSource(spark.sessionState.newHadoopConf(), path)
    try geometryColumnsFrom(src, readMaster(src)) finally src.close()
  }

  /** Raw (table, geometry column) rows of `geometry_columns` — no
    * spatial_ref_sys walk (a real file carries ~6000 registry rows;
    * existence checks must not pay for a CRS resolution they discard).
    */
  private[io] def geometryColumnRows(src: PageSource,
      master: Seq[Master]): Seq[(String, String)] =
    master.find(_.name.equalsIgnoreCase("geometry_columns")) match {
      case None => Nil
      case Some(m) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        walk(src, m.rootPage, 0) { (_, payload) =>
          val r = decodeRecord(payload)
          out += ((r(0).asInstanceOf[String], r(1).asInstanceOf[String]))
        }
        out.toSeq
    }

  /** A table registered with MORE than one geometry column cannot be
    * read through the single-geometry scan (the extra column's raw
    * SpatiaLite blobs would surface under a TEXT-affinity schema) —
    * refuse it by name.
    */
  private[io] def requireSingleGeom(rows: Seq[(String, String)],
      table: String, path: String): Unit = {
    val cols = rows.collect { case (t, g) if t.equalsIgnoreCase(table) => g }
    require(cols.size <= 1,
      s"spatialite: table '$table' in $path registers ${cols.size} geometry " +
        s"columns (${cols.mkString(", ")}) — only single-geometry tables " +
        "are readable")
  }

  private[io] def geometryColumnsFrom(src: PageSource,
      master: Seq[Master]): Map[String, (String, Option[String])] = {
    val registry: Map[Long, String] =
      master.find(_.name.equalsIgnoreCase("spatial_ref_sys")) match {
        case None => Map.empty
        case Some(m) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          walk(src, m.rootPage, 0) { (rowid, payload) =>
            val r = decodeRecord(payload)
            // srid is INTEGER PRIMARY KEY -> rowid carries it when NULL
            val srid = Option(r(0)).map(_.asInstanceOf[Long]).getOrElse(rowid)
            (r.lift(1), r.lift(2)) match {
              case (Some(org: String), Some(cid: java.lang.Long))
                if org.equalsIgnoreCase("EPSG") => out += ((srid, s"EPSG:$cid"))
              case _ => ()
            }
          }
          out.toMap
      }
    master.find(_.name.equalsIgnoreCase("geometry_columns")) match {
      case None => Map.empty
      case Some(m) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, (String, Option[String]))]
        walk(src, m.rootPage, 0) { (_, payload) =>
          val r = decodeRecord(payload)
          val srid = r.lift(4).collect { case l: java.lang.Long => l.longValue() }
          out += ((r(0).asInstanceOf[String],
            (r(1).asInstanceOf[String], srid.flatMap(registry.get))))
        }
        // first registration wins deterministically (toMap would keep the
        // LAST b-tree row); multi-geometry tables are refused at read
        // time via requireSingleGeom
        out.foldLeft(Map.empty[String, (String, Option[String])]) {
          case (m2, (t, v)) => if (m2.contains(t)) m2 else m2 + (t -> v)
        }
    }
  }

  /** Distributed read of one SpatiaLite feature table; `bbox` prunes
    * through the `idx_<table>_<geom>_node` R*-tree when present (exact
    * envelope residual task-side either way).
    */
  def read(spark: SparkSession, path: String, table: String,
      bbox: Option[(Double, Double, Double, Double)] = None,
      geometryColumn: String = "geometry"): GeoDataFrame = {
    graft.sql.functions.install(spark)
    // one driver-side metadata walk: resolved here, injected below (a
    // real spatialite file carries ~6000 spatial_ref_sys rows — do not
    // re-walk them inside readFeatureTable)
    val (meta, gcRows) = {
      val src = openSource(spark.sessionState.newHadoopConf(), path)
      try {
        val master = readMaster(src)
        (geometryColumnsFrom(src, master), geometryColumnRows(src, master))
      } finally src.close()
    }
    val (resolved, (gcol, crs)) = GeoPackageIO.resolveCI(meta, table)
      .getOrElse(throw new IllegalArgumentException(
        s"spatialite: table '$table' not in geometry_columns of $path " +
          s"(have: ${meta.keys.mkString(", ")})"))
    requireSingleGeom(gcRows, resolved, path)
    val df = readFeatureTable(spark, path, resolved, bbox,
      geomColFor = (_, _) => Some(gcol),
      rtreeNodeName = (t, g) => s"idx_${t}_${g}_node",
      geomDecode = slToWkb)
    val out = if (gcol == geometryColumn) df
      else df.withColumnRenamed(gcol, geometryColumn)
    val g = GeoDataFrame(out, geometryColumn)
    crs.map(g.setCrs).getOrElse(g)
  }

  /** True when the file carries the `idx_<t>_<c>_node` R*-tree shadow
    * table — the precondition for bbox-pruned reads.
    */
  def hasRtree(spark: SparkSession, path: String, table: String): Boolean = {
    val src = openSource(spark.sessionState.newHadoopConf(), path)
    try {
      val master = readMaster(src)
      val rows = geometryColumnRows(src, master)
      rows.find(_._1 == table)
        .orElse(rows.find(_._1.equalsIgnoreCase(table)))
        .exists { case (t, g) =>
          GeoPackageIO.findMaster(master, s"idx_${t}_${g}_node")
            .exists(_.rootPage > 0)
        }
    } finally src.close()
  }

  // ------------------------------------------------------------- write

  /** Write `gdf` as a complete single-file SpatiaLite database containing
    * `table` (the write half of the 18th format — the reference writes any
    * OGR format via pyogrio, `io/file.py:49-149`). Same layout contract as
    * [[GeoPackageIO.write]]: `fid INTEGER PRIMARY KEY` (a LongType `fid`
    * column supplies rowids, strictly increasing) + attributes in
    * DataFrame order + the geometry last — declared `GEOMETRY` in the DDL
    * exactly as AddGeometryColumn would, carried as SpatiaLite serialized
    * blobs. With `spatialIndex` the `idx_<t>_<g>` R*-tree trio is emitted
    * and `spatial_index_enabled` set, so written files prune bbox reads.
    */
  def write(gdf: GeoDataFrame, path: String, table: String,
      pageSize: Int = 4096, spatialIndex: Boolean = true): Unit =
    writeLayers(Seq(table -> gdf), path, pageSize, spatialIndex)

  /** Multi-table SpatiaLite write — several feature tables in one file,
    * each with its own `geometry_columns` row and R*-tree. Driver-side
    * single-writer (single-file format with a global catalog — interchange
    * egress; shard across .sqlite files to scale out).
    */
  def writeLayers(layers: Seq[(String, GeoDataFrame)], path: String,
      pageSize: Int = 4096, spatialIndex: Boolean = true): Unit = {
    require(pageSize >= 512 && pageSize <= 32768 &&
      Integer.bitCount(pageSize) == 1, "pageSize must be a power of 2 in [512, 32768]")
    require(layers.nonEmpty, "spatialite write: at least one layer required")
    require(layers.map(_._1.toLowerCase).distinct.size == layers.size,
      s"spatialite write: duplicate layer names — SQLite identifiers are " +
        s"case-insensitive (${layers.map(_._1).mkString(", ")})")
    layers.foreach { case (t, _) =>
      val tl = t.toLowerCase
      require(t.nonEmpty && !tl.startsWith("sqlite_") && !tl.startsWith("idx_") &&
        tl != "geometry_columns" && tl != "spatial_ref_sys",
        s"invalid feature table name '$t'")
    }
    val fb = new FileBuilder(pageSize)
    fb.alloc() // page 1 reserved for the sqlite_master root
    val enc = layers.map { case (t, g) =>
      encodeLayer(g, t, fb, "spatialite", wkbToSl, geomDdlType = "GEOMETRY")
    }
    val indexed = enc.map(e => spatialIndex && e.rtreeEntries.nonEmpty)

    // dialect catalog: spatial_ref_sys (v4 layout; the reader consumes
    // auth_name/auth_srid, srid rides the rowid) + geometry_columns
    val srsDdl = "CREATE TABLE spatial_ref_sys (srid INTEGER NOT NULL PRIMARY KEY, " +
      "auth_name TEXT NOT NULL, auth_srid INTEGER NOT NULL, " +
      "ref_sys_name TEXT NOT NULL DEFAULT 'Unknown', proj4text TEXT NOT NULL, " +
      "srtext TEXT NOT NULL DEFAULT 'Undefined')"
    val srids = (4326 +: enc.map(_.srsId).filter(_ > 0)).distinct.sorted
    val srsRoot = buildTableBtree(srids.iterator.map(id =>
      (id.toLong, encodeRecord(Seq[Any](
        null, "EPSG", id.toLong, s"EPSG:$id", "", "Undefined")))), fb)

    val gcDdl = "CREATE TABLE geometry_columns (f_table_name TEXT NOT NULL, " +
      "f_geometry_column TEXT NOT NULL, geometry_type INTEGER NOT NULL, " +
      "coord_dimension INTEGER NOT NULL, srid INTEGER NOT NULL, " +
      "spatial_index_enabled INTEGER NOT NULL)"
    val gcRoot = buildTableBtree(enc.iterator.zipWithIndex.map { case (e, i) =>
      // v4 catalog dimensions follow the data: GEOMETRY Z layers declare
      // geometry_type 1000 / coord_dimension 3 so catalog-trusting
      // consumers don't drop Z
      ((i + 1).toLong, encodeRecord(Seq[Any](e.table, e.geomCol,
        if (e.hasZ) 1000L else 0L, if (e.hasZ) 3L else 2L,
        e.srsId.toLong, if (indexed(i)) 1L else 0L)))
    }, fb)

    // per-layer R*-tree: the idx_<t>_<g> virtual table + _node/_rowid/
    // _parent shadow b-trees (identical rtree module layout to the gpkg
    // trio — buildRtree is shared verbatim)
    val rtreeMasterRows: Seq[(String, String, String, Int, String)] =
      enc.zipWithIndex.flatMap { case (e, i) =>
        if (!indexed(i)) Nil
        else {
          val (nodeRoot, rowidRoot, parentRoot) = buildRtree(e.rtreeEntries, fb)
          val rt = s"idx_${e.table}_${e.geomCol}"
          Seq(
            ("table", rt, rt, 0,
              s"""CREATE VIRTUAL TABLE "$rt" USING rtree(pkid, xmin, xmax, ymin, ymax)"""),
            ("table", s"${rt}_node", s"${rt}_node", nodeRoot,
              s"""CREATE TABLE "${rt}_node"(nodeno INTEGER PRIMARY KEY,data)"""),
            ("table", s"${rt}_rowid", s"${rt}_rowid", rowidRoot,
              s"""CREATE TABLE "${rt}_rowid"(rowid INTEGER PRIMARY KEY,nodeno)"""),
            ("table", s"${rt}_parent", s"${rt}_parent", parentRoot,
              s"""CREATE TABLE "${rt}_parent"(nodeno INTEGER PRIMARY KEY,parentnode)"""))
        }
      }
    val masterRows = Seq(
      ("table", "spatial_ref_sys", "spatial_ref_sys", srsRoot, srsDdl),
      ("table", "geometry_columns", "geometry_columns", gcRoot, gcDdl)) ++
      rtreeMasterRows ++
      enc.map(e => ("table", e.table, e.table, e.featureRoot, e.ddl))
    finishFile(fb, masterRows, path,
      layers.head._2.df.sparkSession.sessionState.newHadoopConf(),
      userVersion = 0, applicationId = 0)
  }

  // ---------------------------------------------------- blob -> WKB codec

  /** WKB -> SpatiaLite serialized geometry blob — the write half of
    * [[slToWkb]]. Z survives on points/linestrings (+1000 class band,
    * mirroring the read side); M is never written (the engine's geometry
    * model drops it on ingest). Serializable (referenced from the
    * task-side encode closure in [[writeLayers]]).
    */
  private[io] def wkbToSl(wkb: Array[Byte], srid: Int): Array[Byte] = {
    val g = Wkb.read(wkb)
    val bodyBuf = new java.io.ByteArrayOutputStream(wkb.length + 16)
    val scratch = new Array[Byte](8)
    def putInt(v: Int): Unit = {
      ByteBuffer.wrap(scratch).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
      bodyBuf.write(scratch, 0, 4)
    }
    def putDouble(v: Double): Unit = {
      ByteBuffer.wrap(scratch).order(ByteOrder.LITTLE_ENDIAN).putDouble(v)
      bodyBuf.write(scratch, 0, 8)
    }
    // collections carry the dimension band on the OUTER class too
    // (1004 MultiPointZ, 1005 MultiLineStringZ, 1007 GeometryCollectionZ)
    // — real SpatiaLite/GDAL dispatch on it; members still frame their
    // own banded class after the 0x69 marker
    def hasZ(g: Geometry): Boolean = g match {
      case p: Point => !p.z.isNaN
      case l: LineString => l.zs != null
      case m: MultiPoint => m.pts.exists(hasZ)
      case m: MultiLineString => m.lines.exists(hasZ)
      case c: GeometryCollection => c.geoms.exists(hasZ)
      case _ => false // polygon z drops on ingest (engine model)
    }
    def clsOf(g: Geometry): Int = {
      val base = g match {
        case _: Point => 1
        case _: LineString => 2
        case _: Polygon => 3
        case _: MultiPoint => 4
        case _: MultiLineString => 5
        case _: MultiPolygon => 6
        case _: GeometryCollection => 7
      }
      if (hasZ(g)) base + 1000 else base
    }
    def members(gs: Array[Geometry]): Unit = {
      putInt(gs.length)
      gs.foreach { m => bodyBuf.write(0x69); putInt(clsOf(m)); body(m) }
    }
    def body(g: Geometry): Unit = g match {
      case p: Point =>
        putDouble(p.x); putDouble(p.y); if (!p.z.isNaN) putDouble(p.z)
      case l: LineString =>
        val n = l.xy.length / 2
        putInt(n)
        var i = 0
        while (i < n) {
          putDouble(l.xy(2 * i)); putDouble(l.xy(2 * i + 1))
          if (l.zs != null) putDouble(l.zs(i))
          i += 1
        }
      case pg: Polygon =>
        putInt(pg.rings.length)
        pg.rings.foreach { r =>
          putInt(r.length / 2)
          var i = 0
          while (i < r.length) { putDouble(r(i)); i += 1 }
        }
      case m: MultiPoint => members(m.pts.toArray[Geometry])
      case m: MultiLineString => members(m.lines.toArray[Geometry])
      case m: MultiPolygon => members(m.polys.toArray[Geometry])
      case c: GeometryCollection => members(c.geoms)
    }
    putInt(clsOf(g)); body(g)
    val bodyBytes = bodyBuf.toByteArray
    val env = Wkb.envelopeOf(wkb)
    // an empty geometry has an inverted +Inf/-Inf envelope; SpatiaLite
    // has no empty flag, so its MBR is written as zeros (the read side
    // re-derives envelopes from the decoded WKB, never this header)
    val (mnx, mny, mxx, mxy) =
      if (env.minX <= env.maxX && env.minY <= env.maxY)
        (env.minX, env.minY, env.maxX, env.maxY)
      else (0.0, 0.0, 0.0, 0.0)
    val out = new Array[Byte](39 + bodyBytes.length + 1)
    out(0) = 0x00; out(1) = 0x01 // start byte + little-endian flag
    val hb = ByteBuffer.wrap(out, 2, 36).order(ByteOrder.LITTLE_ENDIAN)
    hb.putInt(srid)
    hb.putDouble(mnx).putDouble(mny).putDouble(mxx).putDouble(mxy)
    out(38) = 0x7c
    System.arraycopy(bodyBytes, 0, out, 39, bodyBytes.length)
    out(out.length - 1) = 0xfe.toByte
    out
  }

  /** SpatiaLite serialized geometry -> WKB (null for the NULL shape). */
  private[io] def slToWkb(blob: Array[Byte]): Array[Byte] = {
    require(blob.length >= 45 && blob(0) == 0x00,
      "not a SpatiaLite geometry blob (missing 0x00 start byte)")
    require(blob(1) == 0x01,
      "big-endian SpatiaLite blobs not supported (0x01 little expected)")
    require((blob(38) & 0xff) == 0x7c,
      "not a SpatiaLite geometry blob (missing 0x7C MBR end marker)")
    require((blob(blob.length - 1) & 0xff) == 0xfe,
      "not a SpatiaLite geometry blob (missing 0xFE end byte)")
    val bb = ByteBuffer.wrap(blob, 39, blob.length - 40)
      .order(ByteOrder.LITTLE_ENDIAN)
    Wkb.write(readClass(bb, bb.getInt()))
  }

  private def readClass(bb: ByteBuffer, cls0: Int): Geometry = {
    // +1000 Z, +2000 M, +3000 ZM bands carry extra per-point doubles in
    // the same body layout; z survives on points/linestrings (the
    // engine's geometry model, like WKB ingest), polygon z and all m drop
    val band = cls0 / 1000
    val base = cls0 % 1000
    require(base >= 1 && base <= 7 && band >= 0 && band <= 3,
      s"spatialite: unsupported geometry class $cls0")
    val hasZ = band == 1 || band == 3
    val hasM = band == 2 || band == 3
    def pt() = {
      val x = bb.getDouble(); val y = bb.getDouble()
      val z = if (hasZ) bb.getDouble() else Double.NaN
      if (hasM) bb.getDouble()
      if (hasZ) Point(x, y, z) else Point(x, y)
    }
    def coords(n: Int): (Array[Double], Array[Double]) = {
      val xy = new Array[Double](n * 2)
      val zs = if (hasZ) new Array[Double](n) else null
      var i = 0
      while (i < n) {
        xy(2 * i) = bb.getDouble(); xy(2 * i + 1) = bb.getDouble()
        if (hasZ) zs(i) = bb.getDouble()
        if (hasM) bb.getDouble()
        i += 1
      }
      (xy, zs)
    }
    def line() = {
      val (xy, zs) = coords(bb.getInt())
      LineString(xy, zs)
    }
    def poly() = {
      val nr = bb.getInt()
      Polygon(Array.fill(nr)(coords(bb.getInt())._1))
    }
    def members(n: Int): IndexedSeq[Geometry] = (0 until n).map { _ =>
      require((bb.get() & 0xff) == 0x69,
        "spatialite: missing 0x69 entity marker in multi-geometry")
      readClass(bb, bb.getInt())
    }
    base match {
      case 1 => pt()
      case 2 => line()
      case 3 => poly()
      case 4 => MultiPoint(members(bb.getInt()).map(_.asInstanceOf[Point]).toArray)
      case 5 => MultiLineString(
        members(bb.getInt()).map(_.asInstanceOf[LineString]).toArray)
      case 6 => MultiPolygon(
        members(bb.getInt()).map(_.asInstanceOf[Polygon]).toArray)
      case 7 => GeometryCollection(members(bb.getInt()).toArray)
    }
  }
}
