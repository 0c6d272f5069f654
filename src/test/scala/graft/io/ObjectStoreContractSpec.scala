package graft.io

import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Run the pure-JVM format codecs against an OBJECT STORE through the
  * `hadoop.fs.FileSystem` contract — whole objects, copy+delete rename,
  * no local paths, conf shipped task-side, positioned reads,
  * rename-on-commit — with no `java.io.File` leakage anywhere in the
  * path. This is the analog of the reference's moto-S3 IO tests
  * (`tests/io/conftest.py:29-87`).
  *
  * Two targets, same tests:
  *  - default: `mem://` — an in-memory FileSystem with object-store
  *    semantics; the zero-egress stand-in that always runs.
  *  - `GRAFT_OBJECT_STORE_URI=s3a://bucket/prefix sbt "testOnly
  *    *ObjectStoreContractSpec"` — the REAL s3a path. Requires
  *    `hadoop-aws` + `aws-sdk-bundle` on the test classpath (drop them in
  *    `lib/` or `/opt/spark/jars`) and standard AWS credentials
  *    (env/instance profile). When the env var names an s3a URI but the
  *    S3A filesystem class is absent, the suite CANCELS with a clear
  *    message instead of failing — the gate is the classpath, not this
  *    repo's (egress-free) build.
  */
class ObjectStoreContractSpec extends AnyFunSuite {

  /** Object-store base URI; trailing slash stripped. */
  private val base =
    sys.env.getOrElse("GRAFT_OBJECT_STORE_URI", "mem://bucket").stripSuffix("/")
  private val isMem = base.startsWith("mem:")

  private lazy val s3aAvailable: Boolean =
    try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
    catch { case _: Throwable => false }

  /** Cancels (not fails) when the configured target can't run here. */
  private def gate(): Unit =
    if (!isMem) assume(s3aAvailable,
      s"GRAFT_OBJECT_STORE_URI=$base but org.apache.hadoop.fs.s3a.S3AFileSystem " +
        "is not on the classpath — add hadoop-aws + aws-sdk-bundle jars")

  lazy val spark = {
    val s = TestSpark.spark
    s.sessionState.newHadoopConf() // force session init
    s.sparkContext.hadoopConfiguration
      .setClass("fs.mem.impl", classOf[MemFileSystem],
        classOf[org.apache.hadoop.fs.FileSystem])
    s
  }
  import spark.implicits._

  private def clear(prefix: String): Unit =
    if (isMem) MemFileSystem.clear()
    else {
      val p = new Path(s"$base/$prefix")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }

  /** Object keys under the base (relative paths) — mem store keys or a
    * recursive FileSystem listing for a real store.
    */
  private def keys(): Seq[String] =
    if (isMem) MemFileSystem.store.keys.toSeq
    else {
      val p = new Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val b = Seq.newBuilder[String]
        while (it.hasNext)
          b += it.next().getPath.toString.stripPrefix(base)
        b.result()
      }
    }

  private def df = (0 until 300).map { i =>
    (i.toLong, s"v_$i", Wkb.write(Point(i % 30 * 3.0, i / 30 * 3.0)))
  }.toDF("id", "v", "geometry").repartition(4)

  private def dump(d: org.apache.spark.sql.DataFrame) = d
    .select($"id", $"v", expr("st_astext(geometry)").as("w"))
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted

  test("FlatGeobuf directory write + indexed read over the object store (conf ships to tasks)") {
    gate(); clear("fgb")
    val gdf = graft.api.GeoDataFrame(df, "geometry")
    FlatGeobufIO.writeDir(gdf, s"$base/fgb", name = "pts")
    assert(keys().exists(_.contains("/fgb/")),
      "parts must land in the object store, not on local disk")
    val back = FlatGeobufIO.read(spark, s"$base/fgb")
    assert(dump(back) == dump(df))
    // bbox read prunes through headers/index over the same contract
    val n = FlatGeobufIO.read(spark, s"$base/fgb",
      bbox = Some((0.0, 0.0, 30.0, 12.0))).count()
    assert(n > 0 && n < 300)
  }

  test("shapefile trio write + chunked read over the object store") {
    gate(); clear("shp")
    ShapefileIO.write(df, s"$base/shp")
    assert(keys().exists(_.endsWith(".shp")))
    val back = ShapefileIO.read(spark, s"$base/shp")
    assert(dump(back) == dump(df))
    // header-envelope bbox pruning works against the store too
    assert(ShapefileIO.read(spark, s"$base/shp",
      bbox = Some((1e6, 1e6, 2e6, 2e6))).count() == 0)
  }

  test("GeoPackage single-file write + subtree-partitioned read over the object store") {
    gate(); clear("pts.gpkg")
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geometry"),
      s"$base/pts.gpkg", table = "pts")
    assert(keys().exists(_.endsWith("/pts.gpkg")))
    val back = GeoPackageIO.read(spark, s"$base/pts.gpkg", "pts")
    assert(dump(back) == dump(df))
  }

  test("DSv2 flatgeobuf write/read over the object store incl. rename-on-commit") {
    gate(); clear("dsv2")
    df.write.format("flatgeobuf").mode("overwrite").save(s"$base/dsv2")
    // committed parts only — no .inprogress left behind by the renames
    val ks = keys().filter(_.contains("/dsv2/"))
    assert(ks.nonEmpty && !ks.exists(_.contains(".inprogress")), ks)
    val back = spark.read.format("flatgeobuf").load(s"$base/dsv2")
    assert(dump(back) == dump(df))
  }
}
