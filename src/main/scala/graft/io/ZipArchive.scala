package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** `.zip` archive support for `read_file` — geopandas/pyogrio read zipped
  * datasets directly (`read_file("data.zip")` reaches them through GDAL's
  * /vsizip/, ref `io/file.py:49-149`); the dominant wild case is the zipped
  * shapefile trio that agencies publish.
  *
  * Shape: the archive is extracted ONCE into a content-addressed scratch
  * directory (key = path + mtime + length, so a changed archive
  * re-extracts and an unchanged one is reused across queries), then the
  * normal extension dispatch takes over — the extracted dataset's reads
  * parallelize exactly like any other `readFile` input.
  *
  * Scale: extraction is a single sequential pass on the driver — correct
  * for the sidecar formats that live in zips (shp/tab/gpkg are single-file
  * or single-trio formats; the cluster-scale paths are parquet/fgb
  * directories, never zips). On a real cluster set
  * `spark.graft.zip.scratchDir` to shared storage (HDFS/S3A) so executors
  * can see the extracted files; the default is the driver-local tmpdir,
  * which is correct for local[] mode.
  */
object ZipArchive {

  /** Extract `path` (a .zip on any Hadoop filesystem) into the scratch
    * dir and return the extracted directory's path. Entry paths are
    * flattened to their basenames (which also neutralizes zip-slip
    * `../` names); duplicate basenames across archive folders are an
    * error. A `_COMPLETE` marker + atomic rename make concurrent
    * extractions safe: losers adopt the winner's directory.
    */
  def extract(spark: SparkSession, path: String,
      scratchDir: Option[String] = None): String = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p.toUri}|${st.getModificationTime}|${st.getLen}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val scratch = scratchDir
      .orElse(spark.conf.getOption("spark.graft.zip.scratchDir"))
      .getOrElse(new java.io.File(
        System.getProperty("java.io.tmpdir")).toURI.toString)
    val outRoot = new Path(scratch, s"graft_zip_$key")
    val ofs = outRoot.getFileSystem(conf)
    val marker = new Path(outRoot, "_COMPLETE")
    if (ofs.exists(marker)) return outRoot.toString

    val tmp = new Path(scratch,
      s"graft_zip_$key.inprogress_${java.util.UUID.randomUUID().toString.take(8)}")
    ofs.mkdirs(tmp)
    // zip-bomb guard: a small archive must not be able to fill the
    // scratch volume; override for legitimately huge datasets
    val maxBytes = spark.conf.getOption("spark.graft.zip.maxBytes")
      .map(_.toLong).getOrElse(64L << 30)
    var written = 0L
    val seen = scala.collection.mutable.Set.empty[String]
    // any failure below must not strand gigabytes in the scratch dir
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.BufferedInputStream(fs.open(p), 1 << 20))
      try {
        var e = zin.getNextEntry
        var any = false
        while (e != null) {
          if (!e.isDirectory) {
            val name = new java.io.File(e.getName).getName
            if (name.nonEmpty && !name.startsWith(".") && name != "_COMPLETE") {
              require(seen.add(name.toLowerCase),
                s"zip: duplicate basename '$name' across archive folders in $path")
              val out = ofs.create(new Path(tmp, name), true)
              try {
                val buf = new Array[Byte](1 << 16)
                var n = zin.read(buf)
                while (n >= 0) {
                  written += n
                  require(written <= maxBytes,
                    s"zip: extraction exceeds spark.graft.zip.maxBytes=$maxBytes in $path")
                  out.write(buf, 0, n); n = zin.read(buf)
                }
              } finally out.close()
              any = true
            }
          }
          e = zin.getNextEntry
        }
        require(any, s"zip: no extractable entries in $path")
      } finally zin.close()
      ofs.create(new Path(tmp, "_COMPLETE"), true).close()
      // publish: rename only while the destination does not exist —
      // Hadoop rename onto an EXISTING directory moves the source INSIDE
      // it (or copies, on the local FS fallback), which would nest junk
      // into the shared extracted dataset. A racing winner is adopted.
      if (ofs.exists(marker) || !ofs.rename(tmp, outRoot)) {
        require(ofs.exists(marker), s"zip: extraction rename failed for $path")
        ofs.delete(tmp, true)
      } else {
        // paranoia against move-into-dir semantics: if the rename nested
        // tmp under a concurrently-created outRoot, remove the nest
        val nested = new Path(outRoot, tmp.getName)
        if (ofs.exists(nested)) ofs.delete(nested, true)
        require(ofs.exists(marker), s"zip: extraction rename failed for $path")
      }
    } catch {
      case t: Throwable =>
        try ofs.delete(tmp, true) catch { case _: Throwable => () }
        throw t
    }
    outRoot.toString
  }

  /** Extensions the `readFile` dispatcher can open directly as a single
    * file. README/license/metadata sidecars riding in real agency zips
    * must not defeat the sole-data-file dispatch.
    */
  private val DataExts = Set("shp", "gpkg", "fgb", "kml", "geojson",
    "geojsonl", "ndjson", "gml", "gpx", "topojson", "mif", "tab", "dxf",
    "arrow", "pbf", "csv")

  /** The single DATA file inside an extracted dir, when there is exactly
    * one (a zipped .gpkg/.fgb/.kml/... plus any number of readme/license
    * sidecars). A zipped shapefile trio also lands here — .dbf/.shx are
    * sidecars, not in [[DataExts]], so the lone .shp is returned and
    * `ShapefileIO` resolves its siblings from that path. None only when
    * several DATA files coexist (e.g. two layers), which dispatch as a
    * directory.
    */
  def soleFile(spark: SparkSession, dir: String): Option[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(p).filter(s => s.isFile)
      .map(_.getPath).filter(_.getName != "_COMPLETE")
    val data = files.filter(f => DataExts.contains(
      f.getName.toLowerCase.split('.').last))
    if (data.length == 1) Some(data(0).toString) else None
  }
}
