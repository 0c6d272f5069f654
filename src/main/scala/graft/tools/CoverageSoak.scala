package graft.tools

import graft.api.GeoDataFrame
import graft.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Coverage-topology soak: the O(vertices) coverage union vs the general
  * overlay dissolve on a large edge-matched grid coverage, and
  * coverageSimplify throughput, at the documented scale shape (one
  * coverage window per `by` group, many groups in parallel).
  *
  * Builds an nx×ny unit-cell coverage with every edge subdivided once
  * (9-point rings), grouped into gx×gy block windows. Prints one JSON
  * line per measurement for SCALE.md.
  *
  * Usage: `sbt "runMain graft.tools.CoverageSoak [nx [ny [groups]]]"`
  * (defaults 1000 1000 100 → 1M cells / ~9M vertices / 100 windows).
  */
object CoverageSoak {
  def main(args: Array[String]): Unit = {
    val nx = args.lift(0).map(_.toInt).getOrElse(1000)
    val ny = args.lift(1).map(_.toInt).getOrElse(1000)
    val groups = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(spark)
    import spark.implicits._

    // `subdiv` = extra vertices per edge. subdiv=1 is overlay's best case
    // (tiny rings); real admin coverages carry MANY vertices on shared
    // boundaries, where overlay merges pay per vertex but the stitch is a
    // pass-through — that regime is what coverageUnion exists for.
    val subdiv = args.lift(3).map(_.toInt).getOrElse(1)
    val side = math.max(1, math.round(math.sqrt(groups.toDouble)).toInt)
    val bw = math.max(1, nx / side); val bh = math.max(1, ny / side)
    val nxL = nx; val nyL = ny; val sd = subdiv; val bwL = bw; val bhL = bh
    val sideL = side
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    val cellsRdd = spark.sparkContext.range(0L, nxL.toLong * nyL, 1,
        numSlices = cpus.toInt)
      .map { id =>
        val i = (id % nxL).toDouble; val j = (id / nxL).toDouble
        val pts = mutable.ArrayBuffer.empty[Double]
        // midpoints computed in CANONICAL (min→max) direction so both
        // cells sharing an edge get bit-identical vertices — a valid
        // coverage requires exact edge matching
        def edge(x0: Double, y0: Double, x1: Double, y1: Double): Unit = {
          val fwd = x0 < x1 || (x0 == x1 && y0 < y1)
          val (ax, ay, bx, by) = if (fwd) (x0, y0, x1, y1) else (x1, y1, x0, y0)
          val mids = (1 to sd).map { k =>
            val t = k.toDouble / (sd + 1)
            (ax + (bx - ax) * t, ay + (by - ay) * t)
          }
          pts += x0; pts += y0
          (if (fwd) mids else mids.reverse).foreach { p => pts += p._1; pts += p._2 }
        }
        edge(i, j, i + 1, j); edge(i + 1, j, i + 1, j + 1)
        edge(i + 1, j + 1, i, j + 1); edge(i, j + 1, i, j)
        pts += i; pts += j // close
        val grp = (id % nxL) / bwL * sideL + (id / nxL) / bhL
        org.apache.spark.sql.Row(grp,
          graft.geom.Wkb.write(graft.geom.Polygon(Array(pts.toArray))))
      }
    val cells = spark.createDataFrame(cellsRdd, schema)
      .localCheckpoint() // pin the fixture: measure the operators, not gen

    // min-of-2 with an untimed warmup each: both paths JIT the geometry
    // kernel — timing the first-run op cold would misattribute ~2 s of
    // JIT to whichever ran first
    def time[A](f: => A): (A, Double) = {
      val a0 = f
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val a = f
        require(a == a0, "soak: nondeterministic result")
        (System.nanoTime() - t0) / 1e9
      }
      (a0, times.min)
    }
    val gdf = GeoDataFrame(cells, "geometry")

    // task-level evidence for the 100 TB posture: max per-task Tungsten
    // peak (the spillable sort budget), max GC per task, shuffle volume
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    val maxGcMs = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            peak.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
            maxGcMs.accumulateAndGet(m.jvmGCTime, Math.max(_, _))
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    def resetMetrics(): Unit = { peak.set(0); maxGcMs.set(0); shuffleWrite.set(0) }
    def metricsJson: String =
      s""""task_peak_mb":${peak.get / (1 << 20)},"max_task_gc_ms":${maxGcMs.get},"shuffle_write_mb":${shuffleWrite.get / (1 << 20)}"""

    // 1. coverage union per window (interior-seam drop + stitch)
    val (covRows, covS) = time {
      gdf.coverageUnion(by = Seq("grp")).df
        .select(sum(st_area(col("geometry"))).cast("double")).head().getDouble(0).round
    }
    println(s"""{"op":"coverageUnion","cells":${nx.toLong * ny},"groups":$groups,"union_area":$covRows,"wall_s":${f"$covS%.2f"},$metricsJson}""")
    resetMetrics()

    // 2. general overlay dissolve on the same windows (the fallback path)
    val (ovRows, ovS) = time {
      gdf.dissolve(by = Seq("grp")).df
        .select(sum(st_area(col("geometry"))).cast("double")).head().getDouble(0).round
    }
    println(s"""{"op":"dissolve_overlay","cells":${nx.toLong * ny},"groups":$groups,"union_area":$ovRows,"wall_s":${f"$ovS%.2f"},"speedup_x":${f"${ovS / covS}%.1f"},$metricsJson}""")
    resetMetrics()

    // 3. coverage simplify per window (arc cut + DP + rebuild)
    val (nptsAfter, simpS) = time {
      gdf.coverageSimplify(0.01, by = Seq("grp")).df
        .select(sum(st_numPoints(col("geometry"))).cast("double")).head().getDouble(0).round
    }
    println(s"""{"op":"coverageSimplify","cells":${nx.toLong * ny},"npts_after":$nptsAfter,"npts_expected":${nx.toLong * ny * 5},"wall_s":${f"$simpS%.2f"},$metricsJson}""")

    // 4. the window guard under real load: cap below the per-window row
    // count and confirm the named error surfaces (not an OOM) and arrives
    // fast (fails on the FIRST over-budget window, not after the pass)
    spark.conf.set("spark.graft.coverage.maxWindowRows",
      math.max(1, nx.toLong * ny / groups / 2).toString)
    val t0 = System.nanoTime()
    val guarded = try {
      gdf.coverageUnion(by = Seq("grp")).df.count(); "MISSED"
    } catch {
      case e: Throwable =>
        def causes(t: Throwable): List[Throwable] =
          if (t == null) Nil else t :: causes(t.getCause)
        if (causes(e).exists(_.isInstanceOf[graft.api.CoverageWindowExceeded]))
          "CoverageWindowExceeded" else s"other:${e.getClass.getSimpleName}"
    }
    spark.conf.unset("spark.graft.coverage.maxWindowRows")
    println(s"""{"op":"window_guard","result":"$guarded","wall_s":${f"${(System.nanoTime() - t0) / 1e9}%.2f"}}""")

    spark.stop()
  }
}
