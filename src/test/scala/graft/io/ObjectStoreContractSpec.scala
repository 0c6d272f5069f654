package graft.io

import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Run the pure-JVM format codecs against `mem://` — an in-memory Hadoop
  * FileSystem with object-store semantics (whole objects, copy+delete
  * rename, no local paths). This is the closest zero-egress stand-in for
  * the reference's moto-S3 IO tests: it proves the codecs reach storage
  * ONLY through the `hadoop.fs.FileSystem` contract — conf-shipped task
  * side, positioned reads, rename-on-commit — with no `java.io.File`
  * leakage anywhere in the path.
  */
class ObjectStoreContractSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    s.sessionState.newHadoopConf() // force session init
    s.sparkContext.hadoopConfiguration
      .setClass("fs.mem.impl", classOf[MemFileSystem],
        classOf[org.apache.hadoop.fs.FileSystem])
    s
  }
  import spark.implicits._

  private def df = (0 until 300).map { i =>
    (i.toLong, s"v_$i", Wkb.write(Point(i % 30 * 3.0, i / 30 * 3.0)))
  }.toDF("id", "v", "geometry").repartition(4)

  private def dump(d: org.apache.spark.sql.DataFrame) = d
    .select($"id", $"v", expr("st_astext(geometry)").as("w"))
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted

  test("FlatGeobuf directory write + indexed read over mem:// (conf ships to tasks)") {
    MemFileSystem.clear()
    val gdf = graft.api.GeoDataFrame(df, "geometry")
    FlatGeobufIO.writeDir(gdf, "mem://bucket/fgb", name = "pts")
    assert(MemFileSystem.store.keys.exists(_.startsWith("/fgb/")),
      "parts must land in the mem store, not on local disk")
    val back = FlatGeobufIO.read(spark, "mem://bucket/fgb")
    assert(dump(back) == dump(df))
    // bbox read prunes through headers/index over the same contract
    val n = FlatGeobufIO.read(spark, "mem://bucket/fgb",
      bbox = Some((0.0, 0.0, 30.0, 12.0))).count()
    assert(n > 0 && n < 300)
  }

  test("shapefile trio write + chunked read over mem://") {
    MemFileSystem.clear()
    ShapefileIO.write(df, "mem://bucket/shp")
    assert(MemFileSystem.store.keys.exists(_.endsWith(".shp")))
    val back = ShapefileIO.read(spark, "mem://bucket/shp")
    assert(dump(back) == dump(df))
    // header-envelope bbox pruning works against mem:// too
    assert(ShapefileIO.read(spark, "mem://bucket/shp",
      bbox = Some((1e6, 1e6, 2e6, 2e6))).count() == 0)
  }

  test("GeoPackage single-file write + subtree-partitioned read over mem://") {
    MemFileSystem.clear()
    GeoPackageIO.write(graft.api.GeoDataFrame(df, "geometry"),
      "mem://bucket/pts.gpkg", table = "pts")
    assert(MemFileSystem.store.contains("/pts.gpkg"))
    val back = GeoPackageIO.read(spark, "mem://bucket/pts.gpkg", "pts")
    assert(dump(back) == dump(df))
  }

  test("DSv2 flatgeobuf write/read over mem:// incl. rename-on-commit") {
    MemFileSystem.clear()
    df.write.format("flatgeobuf").mode("overwrite").save("mem://bucket/dsv2")
    // committed parts only — no .inprogress left behind by the renames
    val keys = MemFileSystem.store.keys.filter(_.startsWith("/dsv2/")).toSeq
    assert(keys.nonEmpty && !keys.exists(_.contains(".inprogress")), keys)
    val back = spark.read.format("flatgeobuf").load("mem://bucket/dsv2")
    assert(dump(back) == dump(df))
  }
}
