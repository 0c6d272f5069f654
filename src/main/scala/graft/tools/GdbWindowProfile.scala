package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FileGDB windowed-read A/B: chunk pruning through the `.gspx`
  * block-envelope index (sidecar or lazily computed) vs the unpruned
  * full scan + residual (the pre-r15 shape, `envIndex=off`). Writes an
  * n-row point gdb whose rows ascend in x, reads a window covering
  * ~1/64 of the rows, prints one JSON line per mode (warm min-of-2).
  *
  * Usage: `sbt "runMain graft.tools.GdbWindowProfile [nRows [chunkSize]]"`
  */
object GdbWindowProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
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

    val dir = java.nio.file.Files.createTempDirectory("gdbwin").toString + "/win.gdb"
    val src = spark.range(1, n + 1)
      .select(col("id"), concat(lit("row_"), col("id")).as("name"),
        (col("id") % 1000).cast("double").as("v"))
      .withColumn("geometry", st_point(col("id").cast("double"),
        (col("id") % 500).cast("double")))
    graft.io.FileGdbIO.write(src, dir)
    // window over rows [n/2, n/2 + n/64): one narrow x-band
    val x0 = n / 2.0; val x1 = n / 2.0 + n / 64.0
    val expect = (x0.ceil.toLong to x1.floor.toLong).sum

    def window(): (Long, Int) = {
      val g = graft.io.FileGdbIO.read(spark, dir, chunkSize = chunk,
        bbox = Some((x0, -1.0, x1, 501.0)))
      (g.df.select(sum(col("id")).cast("long")).head().getLong(0),
        g.df.rdd.getNumPartitions)
    }
    def time(label: String): Unit = {
      val (got, parts) = window() // warm (builds/loads the index once)
      require(got == expect, s"wrong window sum: $got vs $expect")
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        require(window()._1 == expect)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(s"""{"op":"gdb_window","mode":"$label","rows":$n,"chunk":$chunk,"partitions":$parts,"wall_s":${f"$best%.3f"}}""")
    }
    time("gspx_sidecar")
    spark.conf.set("spark.graft.gdb.envIndex", "off")
    time("unpruned")
    spark.conf.unset("spark.graft.gdb.envIndex")
    // lazy path: a FRESH COPY of the gdb without the sidecar (a new
    // table path = a new envIdxMemo key — deleting the sidecar in place
    // would hit the index memoized by the sidecar leg above and time a
    // cache hit, not the build), then the first read (includes the
    // distributed env-index build) and the memoized re-read
    val dir2 = java.nio.file.Files.createTempDirectory("gdbwin2").toString + "/win.gdb"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir2))
    val d1 = new java.io.File(dir)
    d1.listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.endsWith(".gspx"))
      .foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(dir2, f.getName))
      }
    def window2(): (Long, Int) = {
      val g = graft.io.FileGdbIO.read(spark, dir2, chunkSize = chunk,
        bbox = Some((x0, -1.0, x1, 501.0)))
      (g.df.select(sum(col("id")).cast("long")).head().getLong(0),
        g.df.rdd.getNumPartitions)
    }
    val t0 = System.nanoTime()
    val (got2, parts2) = window2()
    require(got2 == expect)
    val firstS = (System.nanoTime() - t0) / 1e9
    println(s"""{"op":"gdb_window","mode":"lazy_first_read_incl_build","rows":$n,"chunk":$chunk,"partitions":$parts2,"wall_s":${f"$firstS%.3f"}}""")
    val t1 = System.nanoTime()
    require(window2()._1 == expect)
    val memoS = (System.nanoTime() - t1) / 1e9
    println(s"""{"op":"gdb_window","mode":"lazy_memoized","rows":$n,"chunk":$chunk,"wall_s":${f"$memoS%.3f"}}""")
    spark.stop()
  }
}
