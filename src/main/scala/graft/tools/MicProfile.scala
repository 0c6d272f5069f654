package graft.tools
import graft.geom._
object MicProfile {
  def main(args: Array[String]): Unit = {
    def rect(ox: Double, oy: Double, w: Double, h: Double) =
      Wkt.read(s"POLYGON (($ox $oy, ${ox+w} $oy, ${ox+w} ${oy+h}, $ox ${oy+h}, $ox $oy))")
    def holed(ox: Double, oy: Double, w: Double, h: Double) = {
      val g = w / 4.0; val gv = h / 4.0
      Wkt.read(s"POLYGON (($ox $oy, ${ox+w} $oy, ${ox+w} ${oy+h}, $ox ${oy+h}, $ox $oy), " +
        s"(${ox+g} ${oy+gv}, ${ox+w-g} ${oy+gv}, ${ox+w-g} ${oy+h-gv}, ${ox+g} ${oy+h-gv}, ${ox+g} ${oy+gv}))")
    }
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      var i = 0
      while (i < 1000) {
        val w = (i % 5) + 2.0; val h = (i % 4) + 1.0
        Extended.maximumInscribedCircle(rect((i%13)*3.0, (i%11)*3.0, w, h), 0.01)
        i += 1
      }
      println(f"rect  x1000: ${(System.nanoTime()-t0)/1e9}%.3f s")
      t0 = System.nanoTime()
      i = 0
      while (i < 1000) {
        val w = (i % 5) + 2.0; val h = (i % 4) + 1.0
        Extended.maximumInscribedCircle(holed((i%13)*3.0, (i%11)*3.0, w, h), 0.01)
        i += 1
      }
      println(f"holed x1000: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
  }
}
