package graft.io

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.geom.{Point, Wkb}

/** OpenStreetMap PBF reader/writer — pure-JVM codec for the `.osm.pbf`
  * planet-dump format (public spec: wiki.openstreetmap.org/wiki/PBF_Format
  * + the osmformat/fileformat .proto definitions). Planet-scale OSM
  * ingest is a canonical Spark workload: the file is a sequence of
  * independently-decodable compressed blobs, which is exactly a
  * partitioned scan.
  *
  * Read plan: ONE driver pass over the blob FRAMING only (4-byte
  * header-length + BlobHeader + seek past datasize — bytes read is
  * O(blobs), not O(file)), then blob (offset, size) ranges parallelize
  * across tasks; each task decompresses and decodes only its blobs
  * (string tables, delta-coded dense nodes, packed key/value indexes are
  * all blob-local by design). No global state, no shuffle.
  *
  * Layers: nodes (id, lon, lat, tags, WKB point), ways (id, refs, tags),
  * relations (id, member ids/types/roles, tags). [[wayLines]] assembles
  * way LineStrings distributively (explode refs -> join nodes -> ordered
  * re-collect), the standard OSM geometry construction.
  */
object OsmPbfIO {

  // protobuf wire primitives shared across codecs: graft.io.Pb

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(z)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (off < rawSize && !inf.finished())
      off += inf.inflate(out, off, rawSize - off)
    inf.end()
    require(off == rawSize, s"osm.pbf blob inflated to $off of $rawSize bytes")
    out
  }

  // ------------------------------------------------------------- framing
  private case class BlobRange(offset: Long, size: Int, blobType: String)

  /** One framing pass: BlobHeader lengths + seeks, O(blobs) bytes read. */
  private def blobRanges(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[BlobRange] = {
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[BlobRange]
      var pos = 0L
      val lenBuf = new Array[Byte](4)
      while (pos + 4 <= len) {
        in.readFully(pos, lenBuf)
        val hlen = ((lenBuf(0) & 0xff) << 24) | ((lenBuf(1) & 0xff) << 16) |
          ((lenBuf(2) & 0xff) << 8) | (lenBuf(3) & 0xff)
        val hbytes = new Array[Byte](hlen)
        in.readFully(pos + 4, hbytes)
        val h = new PbIn(hbytes, 0, hlen)
        var btype = ""
        var dsize = -1
        while (h.hasMore) {
          val t = h.varint()
          ((t >> 3).toInt, (t & 7).toInt) match {
            case (1, 2) => btype = new String(h.bytesField(), "UTF-8")
            case (3, 0) => dsize = h.varint().toInt
            case (_, w) => h.skip(w)
          }
        }
        require(dsize >= 0, "osm.pbf BlobHeader missing datasize")
        out += BlobRange(pos + 4 + hlen, dsize, btype)
        pos += 4 + hlen + dsize
      }
      out.toSeq
    } finally in.close()
  }

  private def readBlobRaw(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      r: BlobRange): Array[Byte] = {
    val bytes = new Array[Byte](r.size)
    val in = fs.open(p)
    try in.readFully(r.offset, bytes) finally in.close()
    val blob = new PbIn(bytes, 0, bytes.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (blob.hasMore) {
      val t = blob.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) => raw = blob.bytesField()
        case (2, 0) => rawSize = blob.varint().toInt
        case (3, 2) => zlib = blob.bytesField()
        case (_, w) => blob.skip(w)
      }
    }
    if (raw != null) raw
    else {
      require(zlib != null, "osm.pbf blob has neither raw nor zlib_data " +
        "(lzma/bzip2 compression not supported)")
      inflate(zlib, rawSize)
    }
  }

  // ------------------------------------------------------------- decode
  private case class OsmNode(id: Long, lon: Double, lat: Double,
      tags: Map[String, String])
  private case class OsmWay(id: Long, refs: Array[Long], tags: Map[String, String])
  private case class OsmRel(id: Long, memberIds: Array[Long],
      memberTypes: Array[String], memberRoles: Array[String],
      tags: Map[String, String])

  private val MemberTypes = Array("node", "way", "relation")

  /** `need*` gate per-kind parsing: a reader that wants only ways still
    * walks the block framing (cheap varint skips) but never materializes
    * node coordinates/tags — readFile's lines/polygons layers would
    * otherwise fully decode every kind twice across their two reads.
    */
  private def decodeBlock(raw: Array[Byte], needNodes: Boolean = true,
      needWays: Boolean = true, needRels: Boolean = true)
      : (Seq[OsmNode], Seq[OsmWay], Seq[OsmRel]) = {
    val blk = new PbIn(raw, 0, raw.length)
    var strings: Array[String] = Array.empty
    val groups = scala.collection.mutable.ArrayBuffer.empty[PbIn]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (blk.hasMore) {
      val t = blk.varint()
      ((t >> 3).toInt, (t & 7).toInt) match {
        case (1, 2) =>
          val st = blk.sub()
          val ss = scala.collection.mutable.ArrayBuffer.empty[String]
          while (st.hasMore) {
            val tt = st.varint()
            if ((tt >> 3) == 1 && (tt & 7) == 2)
              ss += new String(st.bytesField(), "UTF-8")
            else st.skip((tt & 7).toInt)
          }
          strings = ss.toArray
        case (2, 2) => groups += blk.sub()
        case (17, 0) => granularity = blk.varint()
        case (19, 0) => latOffset = blk.varint()
        case (20, 0) => lonOffset = blk.varint()
        case (_, w) => blk.skip(w)
      }
    }
    @inline def coord(offset: Long, v: Long): Double =
      1e-9 * (offset + granularity * v)
    def tagsOf(keys: Array[Long], vals: Array[Long]): Map[String, String] =
      keys.indices.map(i => strings(keys(i).toInt) -> strings(vals(i).toInt)).toMap

    val nodes = scala.collection.mutable.ArrayBuffer.empty[OsmNode]
    val ways = scala.collection.mutable.ArrayBuffer.empty[OsmWay]
    val rels = scala.collection.mutable.ArrayBuffer.empty[OsmRel]
    for (g <- groups) {
      while (g.hasMore) {
        val t = g.varint()
        ((t >> 3).toInt, (t & 7).toInt) match {
          case (1, 2) => // plain Node
            val n = g.sub()
            if (!needNodes) { n.skipAll() } else {
            var id = 0L; var lat = 0L; var lon = 0L
            var keys = Array.empty[Long]; var vals = Array.empty[Long]
            while (n.hasMore) {
              val tt = n.varint()
              ((tt >> 3).toInt, (tt & 7).toInt) match {
                case (1, 0) => id = n.svarint()
                case (2, 2) => keys = n.packedLongs(signed = false)
                case (3, 2) => vals = n.packedLongs(signed = false)
                case (8, 0) => lat = n.svarint()
                case (9, 0) => lon = n.svarint()
                case (_, w) => n.skip(w)
              }
            }
            nodes += OsmNode(id, coord(lonOffset, lon), coord(latOffset, lat),
              tagsOf(keys, vals))
            }
          case (2, 2) => // DenseNodes
            val dn = g.sub()
            if (!needNodes) { dn.skipAll() } else {
            var ids = Array.empty[Long]; var lats = Array.empty[Long]
            var lons = Array.empty[Long]; var kvs = Array.empty[Long]
            while (dn.hasMore) {
              val tt = dn.varint()
              ((tt >> 3).toInt, (tt & 7).toInt) match {
                case (1, 2) => ids = dn.packedLongs(signed = true)
                case (8, 2) => lats = dn.packedLongs(signed = true)
                case (9, 2) => lons = dn.packedLongs(signed = true)
                case (10, 2) => kvs = dn.packedLongs(signed = false)
                case (_, w) => dn.skip(w)
              }
            }
            var id = 0L; var la = 0L; var lo = 0L
            var k = 0
            var i = 0
            while (i < ids.length) {
              id += ids(i); la += lats(i); lo += lons(i)
              val tags = scala.collection.mutable.Map.empty[String, String]
              while (k < kvs.length && kvs(k) != 0) {
                tags += strings(kvs(k).toInt) -> strings(kvs(k + 1).toInt)
                k += 2
              }
              if (k < kvs.length) k += 1 // consume the 0 delimiter
              nodes += OsmNode(id, coord(lonOffset, lo), coord(latOffset, la),
                tags.toMap)
              i += 1
            }
            }
          case (3, 2) => // Way
            val wy = g.sub()
            if (!needWays) { wy.skipAll() } else {
            var id = 0L
            var keys = Array.empty[Long]; var vals = Array.empty[Long]
            var refs = Array.empty[Long]
            while (wy.hasMore) {
              val tt = wy.varint()
              ((tt >> 3).toInt, (tt & 7).toInt) match {
                case (1, 0) => id = wy.varint()
                case (2, 2) => keys = wy.packedLongs(signed = false)
                case (3, 2) => vals = wy.packedLongs(signed = false)
                case (8, 2) =>
                  val deltas = wy.packedLongs(signed = true)
                  var acc = 0L
                  refs = deltas.map { d => acc += d; acc }
                case (_, w) => wy.skip(w)
              }
            }
            ways += OsmWay(id, refs, tagsOf(keys, vals))
            }
          case (4, 2) => // Relation
            val rl = g.sub()
            if (!needRels) { rl.skipAll() } else {
            var id = 0L
            var keys = Array.empty[Long]; var vals = Array.empty[Long]
            var roles = Array.empty[Long]; var memids = Array.empty[Long]
            var types = Array.empty[Long]
            while (rl.hasMore) {
              val tt = rl.varint()
              ((tt >> 3).toInt, (tt & 7).toInt) match {
                case (1, 0) => id = rl.varint()
                case (2, 2) => keys = rl.packedLongs(signed = false)
                case (3, 2) => vals = rl.packedLongs(signed = false)
                case (8, 2) => roles = rl.packedLongs(signed = false)
                case (9, 2) =>
                  val deltas = rl.packedLongs(signed = true)
                  var acc = 0L
                  memids = deltas.map { d => acc += d; acc }
                case (10, 2) => types = rl.packedLongs(signed = false)
                case (_, w) => rl.skip(w)
              }
            }
            rels += OsmRel(id, memids, types.map(t => MemberTypes(t.toInt)),
              roles.map(r => strings(r.toInt)), tagsOf(keys, vals))
            }
          case (_, w) => g.skip(w)
        }
      }
    }
    (nodes.toSeq, ways.toSeq, rels.toSeq)
  }

  // ------------------------------------------------------------- readers
  private val tagsType = MapType(StringType, StringType)
  val nodeSchema: StructType = StructType(Seq(
    StructField("osm_id", LongType), StructField("lon", DoubleType),
    StructField("lat", DoubleType), StructField("tags", tagsType),
    StructField("geometry", BinaryType)))
  val waySchema: StructType = StructType(Seq(
    StructField("osm_id", LongType), StructField("refs", ArrayType(LongType)),
    StructField("tags", tagsType)))
  val relationSchema: StructType = StructType(Seq(
    StructField("osm_id", LongType),
    StructField("member_ids", ArrayType(LongType)),
    StructField("member_types", ArrayType(StringType)),
    StructField("member_roles", ArrayType(StringType)),
    StructField("tags", tagsType)))

  private def dataRanges(spark: SparkSession, path: String): (Seq[BlobRange], GeoParquetIO.SerializableConf) = {
    val conf = new GeoParquetIO.SerializableConf(
      spark.sessionState.newHadoopConf())
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    (blobRanges(fs, p).filter(_.blobType == "OSMData"), conf)
  }

  private def readLayer(spark: SparkSession, path: String, schema: StructType,
      needNodes: Boolean = true, needWays: Boolean = true,
      needRels: Boolean = true)(
      rows: ((Seq[OsmNode], Seq[OsmWay], Seq[OsmRel])) => Seq[Row]): DataFrame = {
    val (ranges, conf) = dataRanges(spark, path)
    val pathStr = path
    val parallelism = math.min(math.max(1, ranges.size),
      spark.sparkContext.defaultParallelism * 2)
    val rdd = spark.sparkContext
      .parallelize(ranges, parallelism)
      .flatMap { r =>
        val p = new Path(pathStr)
        val fs = p.getFileSystem(conf.value)
        rows(decodeBlock(readBlobRaw(fs, p, r), needNodes, needWays, needRels))
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Nodes with lon/lat, a tags map, and a ready WKB point geometry. */
  def readNodes(spark: SparkSession, path: String): DataFrame =
    readLayer(spark, path, nodeSchema,
        needWays = false, needRels = false) { case (nodes, _, _) =>
      nodes.map(n => Row(n.id, n.lon, n.lat, n.tags,
        Wkb.write(Point(n.lon, n.lat))))
    }

  /** Ways: ordered node refs + tags (geometry via [[wayLines]]). */
  def readWays(spark: SparkSession, path: String): DataFrame =
    readLayer(spark, path, waySchema,
        needNodes = false, needRels = false) { case (_, ways, _) =>
      ways.map(w => Row(w.id, w.refs.toSeq, w.tags))
    }

  def readRelations(spark: SparkSession, path: String): DataFrame =
    readLayer(spark, path, relationSchema,
        needNodes = false, needWays = false) { case (_, _, rels) =>
      rels.map(r => Row(r.id, r.memberIds.toSeq, r.memberTypes.toSeq,
        r.memberRoles.toSeq, r.tags))
    }

  /** Assemble way LineStrings distributively: explode refs with their
    * position, equi-join the node table (ONE shuffle pair on node id —
    * at planet scale both sides hash-partition; no driver node map),
    * re-collect per way ordered by position, build the line. Ways whose
    * refs are incomplete in the node set are dropped (partial extracts).
    */
  def wayLines(ways: DataFrame, nodes: DataFrame): DataFrame = {
    graft.sql.functions.install(ways.sparkSession)
    val refs = ways.select(col("osm_id").as("way_id"), col("tags"),
        size(col("refs")).as("_n"), posexplode(col("refs")).as(Seq("_pos", "_ref")))
    refs.join(nodes.select(col("osm_id").as("_ref"), col("lon"), col("lat")), "_ref")
      .groupBy(col("way_id"), col("tags"), col("_n"))
      .agg(sort_array(collect_list(struct(col("_pos"), col("lon"), col("lat"))))
        .as("_pts"), count(lit(1)).as("_found"))
      .filter(col("_found") === col("_n") && col("_n") >= 2)
      .withColumn("geometry", graft.sql.functions.st_makeLine(
        expr("transform(_pts, p -> st_point(p.lon, p.lat))")))
      .select(col("way_id").as("osm_id"), col("tags"), col("geometry"))
  }

  /** Closed ways as polygons (the OSM "simple area" rule: first ref ==
    * last ref and not tagged `area=no`; multipolygon RELATIONS need ring
    * assembly across member ways — read those via [[readRelations]] and
    * assemble per application). Same one-shuffle-pair plan as
    * [[wayLines]].
    */
  def wayPolygons(ways: DataFrame, nodes: DataFrame): DataFrame = {
    graft.sql.functions.install(ways.sparkSession)
    val closed = ways.filter(
      size(col("refs")) >= 4 &&
      element_at(col("refs"), 1) === element_at(col("refs"), -1) &&
      (not(map_contains_key(col("tags"), "area")) ||
        element_at(col("tags"), "area") =!= "no"))
    wayLines(closed, nodes)
      .withColumn("geometry",
        graft.sql.functions.st_makePolygon(col("geometry")))
  }

  /** Assemble `type=multipolygon` RELATIONS into MultiPolygon geometries
    * — the standard OSM algorithm: member ways stitch into closed rings
    * by matching shared endpoint nodes (reversing as needed), outer
    * rings come from `outer`/empty roles, `inner` rings become the holes
    * of the outer ring containing them. Distribution: member ways join
    * their relations (hash joins), then each relation's ring assembly is
    * a PER-GROUP kernel via `flatMapGroups` — state is one relation's
    * member ways (bounded by the relation, the format's own unit).
    * Relations whose ways don't close (clipped extracts) are dropped,
    * like every OSM toolchain does.
    */
  def relationMultipolygons(relations: DataFrame, ways: DataFrame,
      nodes: DataFrame): DataFrame = {
    val spark = relations.sparkSession
    graft.sql.functions.install(spark)
    import spark.implicits._
    val members = relations
      .filter(element_at(col("tags"), "type") === "multipolygon")
      .select(col("osm_id").as("rel_id"),
        posexplode(arrays_zip(col("member_ids"), col("member_types"),
          col("member_roles"))).as(Seq("_i", "m")))
      .filter(col("m.member_types") === "way")
      .select(col("rel_id"), col("m.member_ids").as("way_id"),
        col("m.member_roles").as("role"))
    // member way coordinate chains (the wayLines join, kept as raw xy)
    val refs = ways.select(col("osm_id").as("way_id"),
        size(col("refs")).as("_n"), posexplode(col("refs")).as(Seq("_pos", "_ref")))
    val chains = refs
      .join(nodes.select(col("osm_id").as("_ref"), col("lon"), col("lat")), "_ref")
      .groupBy(col("way_id"), col("_n"))
      .agg(sort_array(collect_list(struct(col("_pos"), col("lon"), col("lat"))))
        .as("_pts"), count(lit(1)).as("_found"))
      .filter(col("_found") === col("_n") && col("_n") >= 2)
      .select(col("way_id"),
        expr("flatten(transform(_pts, p -> array(p.lon, p.lat)))").as("xy"))
    val tagged = relations.select(col("osm_id").as("rel_id"), col("tags"))
    members.join(chains, "way_id").join(tagged, "rel_id")
      .select(col("rel_id"), col("role"), col("xy"), col("tags"))
      .as[(Long, String, Seq[Double], Map[String, String])]
      .groupByKey(_._1)
      .flatMapGroups { (relId, it) =>
        val rows = it.toSeq
        val tags = rows.head._4
        def stitch(parts: Seq[Array[Double]]): Seq[Array[Double]] = {
          val pool = scala.collection.mutable.Buffer(parts: _*)
          val rings = scala.collection.mutable.Buffer.empty[Array[Double]]
          while (pool.nonEmpty) {
            var cur = scala.collection.mutable.ArrayBuffer(pool.remove(0): _*)
            var progress = true
            while (progress &&
              !(cur.head == cur(cur.length - 2) && cur(1) == cur.last)) {
              val ex = cur(cur.length - 2); val ey = cur.last
              val idx = pool.indexWhere(w =>
                (w(0) == ex && w(1) == ey) ||
                (w(w.length - 2) == ex && w(w.length - 1) == ey))
              if (idx < 0) progress = false
              else {
                val w = pool.remove(idx)
                val seg = if (w(0) == ex && w(1) == ey) w
                  else { // reverse point order
                    val r = new Array[Double](w.length)
                    var i = 0
                    while (i < w.length) {
                      r(i) = w(w.length - 2 - i); r(i + 1) = w(w.length - 1 - i)
                      i += 2
                    }
                    r
                  }
                cur ++= seg.drop(2) // skip the shared joint vertex
              }
            }
            val closed = cur.length >= 8 &&
              cur.head == cur(cur.length - 2) && cur(1) == cur.last
            if (closed) rings += cur.toArray
            // unclosed chains drop (incomplete extract)
          }
          rings.toSeq
        }
        val outers = stitch(rows.filter(r => r._2 == "outer" || r._2 == "")
          .map(_._3.toArray))
        val inners = stitch(rows.filter(_._2 == "inner").map(_._3.toArray))
        if (outers.isEmpty) Iterator.empty
        else {
          val polys = outers.map(o =>
            scala.collection.mutable.Buffer[Array[Double]](o))
          for (h <- inners) {
            val pt = graft.geom.Point(h(0), h(1))
            val hostIdx = polys.indexWhere(p =>
              graft.geom.Predicates.covers(graft.geom.Polygon(Array(p.head)), pt))
            if (hostIdx >= 0) polys(hostIdx) += h
          }
          val mp = graft.geom.MultiPolygon(
            polys.map(rs => graft.geom.Polygon(rs.toArray)).toArray)
          Iterator((relId, tags, Wkb.write(mp)))
        }
      }
      .toDF("osm_id", "tags", "geometry")
  }

  // ------------------------------------------------------------- writer
  /** Write a single .osm.pbf (OSMHeader + one OSMData blob per
    * `blockSize` nodes/ways/relations, dense-node encoding, zlib blobs).
    * Driver-assembled single-file form for interchange and testing; the
    * distributed bulk path for OSM DATA is parquet after read — PBF is an
    * ingest format, not a pipeline sink.
    */
  def write(path: String, nodes: Seq[(Long, Double, Double, Map[String, String])],
      ways: Seq[(Long, Seq[Long], Map[String, String])] = Nil,
      relations: Seq[(Long, Seq[(String, Long, String)], Map[String, String])] = Nil,
      blockSize: Int = 8000,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val out = fs.create(p, true)
    try {
      def writeBlob(btype: String, raw: Array[Byte]): Unit = {
        val blob = new PbOut
        val z = deflate(raw)
        blob.int(2, raw.length)
        blob.lenDelim(3, z)
        val blobBytes = blob.toBytes
        val header = new PbOut
        header.str(1, btype)
        header.int(3, blobBytes.length)
        val hb = header.toBytes
        out.write(Array[Byte](
          ((hb.length >> 24) & 0xff).toByte, ((hb.length >> 16) & 0xff).toByte,
          ((hb.length >> 8) & 0xff).toByte, (hb.length & 0xff).toByte))
        out.write(hb)
        out.write(blobBytes)
      }
      // OSMHeader with the required features
      val hdr = new PbOut
      hdr.str(4, "OsmSchema-V0.6")
      hdr.str(4, "DenseNodes")
      writeBlob("OSMHeader", hdr.toBytes)

      def newStringTable(): (scala.collection.mutable.LinkedHashMap[String, Int], PbOut => Unit) = {
        val table = scala.collection.mutable.LinkedHashMap("" -> 0)
        (table, { blk: PbOut =>
          val st = new PbOut
          table.keysIterator.foreach(s => st.lenDelim(1, s.getBytes("UTF-8")))
          blk.lenDelim(1, st.toBytes)
        })
      }

      for (chunk <- nodes.grouped(blockSize)) {
        val (strings, emitStrings) = newStringTable()
        def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
        val dense = new PbOut
        val ids = chunk.map(_._1)
        // round to the granularity-100 grid directly (x * 1e7): the old
        // round(x*1e9)/100 TRUNCATED the last two digits, biasing ~1 cm
        // toward zero for coordinates off the 1e-7 grid
        val lats = chunk.map(n => math.round(n._3 * 1e7))
        val lons = chunk.map(n => math.round(n._2 * 1e7))
        def deltas(vs: Seq[Long]): Seq[Long] =
          vs.zip(0L +: vs.init).map { case (a, b) => a - b }
        dense.packed(1, deltas(ids), signed = true)
        dense.packed(8, deltas(lats), signed = true)
        dense.packed(9, deltas(lons), signed = true)
        val kvs = chunk.flatMap(n =>
          n._4.toSeq.flatMap { case (k, v) => Seq(sid(k).toLong, sid(v).toLong) } :+ 0L)
        dense.packed(10, kvs, signed = false)
        val group = new PbOut
        group.lenDelim(2, dense.toBytes)
        val blk = new PbOut
        emitStrings(blk)
        blk.lenDelim(2, group.toBytes)
        writeBlob("OSMData", blk.toBytes)
      }
      for (chunk <- ways.grouped(blockSize)) {
        val (strings, emitStrings) = newStringTable()
        def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
        val group = new PbOut
        for ((id, refs, tags) <- chunk) {
          val wy = new PbOut
          wy.int(1, id)
          wy.packed(2, tags.keys.map(sid(_).toLong), signed = false)
          wy.packed(3, tags.values.map(sid(_).toLong), signed = false)
          val deltas = refs.zip(0L +: refs.init).map { case (a, b) => a - b }
          wy.packed(8, deltas, signed = true)
          group.lenDelim(3, wy.toBytes)
        }
        val blk = new PbOut
        emitStrings(blk)
        blk.lenDelim(2, group.toBytes)
        writeBlob("OSMData", blk.toBytes)
      }
      for (chunk <- relations.grouped(blockSize)) {
        val (strings, emitStrings) = newStringTable()
        def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
        val group = new PbOut
        for ((id, members, tags) <- chunk) {
          val rl = new PbOut
          rl.int(1, id)
          rl.packed(2, tags.keys.map(sid(_).toLong), signed = false)
          rl.packed(3, tags.values.map(sid(_).toLong), signed = false)
          rl.packed(8, members.map(m => sid(m._3).toLong), signed = false)
          val ids = members.map(_._2)
          rl.packed(9, ids.zip(0L +: ids.init).map { case (a, b) => a - b },
            signed = true)
          rl.packed(10, members.map(m => MemberTypes.indexOf(m._1).toLong),
            signed = false)
          group.lenDelim(4, rl.toBytes)
        }
        val blk = new PbOut
        emitStrings(blk)
        blk.lenDelim(2, group.toBytes)
        writeBlob("OSMData", blk.toBytes)
      }
    } finally out.close()
  }
}
