package graft.tools

import graft.geom._

/** Single-JVM micro-profile of one coverage window (no Spark): times
  * unionCoverage and simplifyCoverage on an n×n subdivided grid.
  * Usage: `sbt "runMain graft.tools.CoverageMicro [n [subdiv]]"`.
  */
object CoverageMicro {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50)
    val sd = args.lift(1).map(_.toInt).getOrElse(8)
    val cells: IndexedSeq[Geometry] = for (i <- 0 until n; j <- 0 until n) yield {
      val pts = scala.collection.mutable.ArrayBuffer.empty[Double]
      def edge(x0: Double, y0: Double, x1: Double, y1: Double): Unit = {
        var k = 0
        while (k <= sd) {
          val t = k.toDouble / (sd + 1)
          pts += x0 + (x1 - x0) * t; pts += y0 + (y1 - y0) * t
          k += 1
        }
      }
      edge(i, j, i + 1, j); edge(i + 1, j, i + 1, j + 1)
      edge(i + 1, j + 1, i, j + 1); edge(i, j + 1, i, j)
      pts += i.toDouble; pts += j.toDouble
      Polygon(Array(pts.toArray))
    }
    for (r <- 0 until 3) {
      val t0 = System.nanoTime()
      val u = Coverage.unionCoverage(cells)
      val t1 = System.nanoTime()
      val s = Coverage.simplifyCoverage(cells, 0.01)
      val t2 = System.nanoTime()
      println(f"round $r: union ${(t1 - t0) / 1e9}%.3f s (area ${Measures.area(u)}%.0f) " +
        f"simplify ${(t2 - t1) / 1e9}%.3f s (${s.length} polys)")
    }
  }
}
