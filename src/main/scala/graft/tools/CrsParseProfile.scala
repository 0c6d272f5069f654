package graft.tools

/** r11 micro-probe: cost of WKT-CRS / proj-record parsing on the
  * st_transform hot path, justifying the memo caches (st_transform
  * normalizes its CRS arguments per ROW). Pure driver-side timing —
  * the parse kernels are single-threaded scalar code. Usage:
  * `sbt "runMain graft.tools.CrsParseProfile [n]"`.
  */
object CrsParseProfile {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(600000)
    val wkt = """PROJCS["UTM_Zone_33N",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0.0],PARAMETER["central_meridian",15.0],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000.0],PARAMETER["false_northing",0.0],UNIT["Meter",1.0]]"""
    val rec = "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +ellps=WGS84"
    def time(label: String, iters: Int)(f: => Unit): Double = {
      f // warmup
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%8.3f s  (${s / iters * 1e9}%8.1f ns/op, per-600k-rows ${s * (n.toDouble / iters)}%7.2f s)")
      s
    }
    // uncached: tree parse + reduce every call (what per-row WOULD cost)
    time("wkt parse uncached", n / 100) {
      var i = 0
      while (i < n / 100) { // /100: full-rate would take minutes
        graft.sql.WktCrs.parseTree(wkt).flatMap(graft.sql.WktCrs.reduce); i += 1
      }
    }
    time("proj record parse uncached", n / 10) {
      var i = 0
      while (i < n / 10) { graft.sql.Crs.parseProj(rec); i += 1 }
    }
    // cached: the actual per-row path
    time("wkt parse memoized", n) {
      var i = 0
      while (i < n) { graft.sql.WktCrs.parse(wkt); i += 1 }
    }
    time("projFor memoized", n) {
      var i = 0
      while (i < n) { graft.sql.Crs.projFor(rec); i += 1 }
    }
    // one projected point for scale: the transform work itself
    val p = graft.sql.Crs.projFor(rec).get
    time("forward kernel", n) {
      var i = 0
      while (i < n) { p.forward(14.0 + (i % 7) * 0.1, 47.0); i += 1 }
    }
  }
}
