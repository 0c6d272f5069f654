package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FileGDB scan-path A/B: buffered sequential chunk reads (the r14 path)
  * vs per-row positioned reads (the pre-r14 shape; 2 positioned reads +
  * checksum verification per row — the syscall pathology the r13 soak
  * measured at 17x on FlatGeobuf). Writes an n-row point gdb, times the
  * full distributed scan both ways (warm min-of-2), prints one JSON line
  * per mode.
  *
  * Usage: `sbt "runMain graft.tools.GdbScanProfile [nRows [chunkSize]]"`
  */
object GdbScanProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(300000)
    val chunk = args.lift(1).map(_.toInt).getOrElse(16384)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    import graft.sql.functions._

    val dir = java.nio.file.Files.createTempDirectory("gdbprof").toString + "/prof.gdb"
    val src = spark.range(1, n + 1)
      .select(col("id"), concat(lit("row_"), col("id")).as("name"),
        (col("id") % 1000).cast("double").as("v"))
      .withColumn("geometry", st_point(col("id").cast("double") / 1000.0,
        (col("id") % 500).cast("double")))
    graft.io.FileGdbIO.write(src, dir)

    def scan(): Long = graft.io.FileGdbIO.read(spark, dir, chunkSize = chunk)
      .df.select(sum(st_x(col("geometry"))).cast("long")).head().getLong(0)
    def time(label: String): Unit = {
      val expect = scan() // warm + value pin
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        require(scan() == expect, "nondeterministic scan")
        (System.nanoTime() - t0) / 1e9
      }.min
      println(s"""{"op":"gdb_scan","mode":"$label","rows":$n,"chunk":$chunk,"wall_s":${f"$best%.2f"},"rows_per_s":${(n / best).toLong}}""")
    }
    time("sequential")
    spark.conf.set("spark.graft.gdb.forcePositionedReads", "true")
    time("positioned")
    spark.conf.unset("spark.graft.gdb.forcePositionedReads")

    // attribute-only scan through the DSv2 connector: the byte-level
    // decode mask bypasses the geometry decode entirely
    def attrScan(): Long = spark.read.format("filegdb")
      .option("chunkSize", chunk.toString).load(dir)
      .select(sum(col("v")).cast("long")).head().getLong(0)
    val expect = attrScan()
    val best = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      require(attrScan() == expect, "nondeterministic scan")
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"""{"op":"gdb_scan","mode":"attrs_only_masked","rows":$n,"chunk":$chunk,"wall_s":${f"$best%.2f"},"rows_per_s":${(n / best).toLong}}""")
    spark.stop()
  }
}
