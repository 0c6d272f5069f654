package graft.io

import graft.api.GeoDataFrame
import graft.geom.{Geometry, GeometryCollection, LineString, MultiLineString,
  MultiPoint, MultiPolygon, Point, Polygon, Wkb}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** SpatiaLite read — the other SQLite geometry dialect the reference's
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
  * subtree or candidate chunk is one task. Read-only: SpatiaLite egress
  * is out of scope (GeoPackage/GeoParquet are the write targets).
  */
object SpatiaLiteIO {
  import GeoPackageIO.{Master, PageSource, decodeRecord, openSource,
    readFeatureTable, readMaster, walk}

  /** table -> (geometry column, resolved CRS) from `geometry_columns` +
    * `spatial_ref_sys` (EPSG rows only; custom authorities yield None).
    */
  def geometryColumns(spark: SparkSession,
      path: String): Map[String, (String, Option[String])] = {
    val src = openSource(spark.sessionState.newHadoopConf(), path)
    try geometryColumnsFrom(src, readMaster(src)) finally src.close()
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
        out.toMap
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
    val meta = geometryColumns(spark, path)
    val (gcol, crs) = meta.getOrElse(table,
      throw new IllegalArgumentException(
        s"spatialite: table '$table' not in geometry_columns of $path " +
          s"(have: ${meta.keys.mkString(", ")})"))
    val df = readFeatureTable(spark, path, table, bbox,
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
      geometryColumnsFrom(src, master).get(table).exists { case (g, _) =>
        master.exists(m => m.name == s"idx_${table}_${g}_node" && m.rootPage > 0)
      }
    } finally src.close()
  }

  // ---------------------------------------------------- blob -> WKB codec

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
