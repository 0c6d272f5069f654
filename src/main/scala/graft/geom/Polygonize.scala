package graft.geom

import scala.collection.mutable

/** Polygon formation from noded linework (shapely/GEOS polygonize;
  * reference surface: geopandas exposes shapely.polygonize per-partition).
  *
  * Classic planar-subdivision face tracing: dedup segments into an
  * undirected edge graph, prune dangles (degree-1 chains), sort outgoing
  * half-edges by angle at each vertex, and walk every half-edge's face
  * cycle (next = the edge clockwise from the arrival reversal, which traces
  * bounded faces counterclockwise). CCW cycles become polygon shells; CW
  * cycles are component outer boundaries — the ones strictly inside another
  * component's shell become that shell's holes (the nested-squares case:
  * outer-with-hole plus the inner square as its own polygon, matching
  * GEOS), the rest bound the unbounded face and are dropped.
  *
  * Precondition (as GEOS): input must be correctly noded — segments
  * intersect only at shared endpoints. Un-noded crossings produce
  * undefined faces, not an error.
  */
object Polygonize {

  def polygonize(g: Geometry): Geometry = {
    // ---- collect unique vertices and undirected edges
    val vidOf = mutable.LinkedHashMap.empty[(Double, Double), Int]
    val coords = mutable.ArrayBuffer.empty[(Double, Double)]
    def vid(x: Double, y: Double): Int =
      vidOf.getOrElseUpdate((x, y), { coords += ((x, y)); coords.length - 1 })
    val edges = mutable.LinkedHashSet.empty[(Int, Int)]
    def addPath(xy: Array[Double]): Unit = {
      var i = 0
      while (i + 3 < xy.length) {
        val u = vid(xy(i), xy(i + 1)); val v = vid(xy(i + 2), xy(i + 3))
        if (u != v) edges += (if (u < v) (u, v) else (v, u))
        i += 2
      }
    }
    def walk(g: Geometry): Unit = g match {
      case l: LineString          => addPath(l.xy)
      case p: Polygon             => p.rings.foreach(addPath)
      case m: MultiLineString     => m.lines.foreach(walk)
      case m: MultiPolygon        => m.polys.foreach(walk)
      case c: GeometryCollection  => c.geoms.foreach(walk)
      case _                      => () // points carry no linework
    }
    walk(g)
    if (edges.isEmpty) return GeometryCollection(Array.empty)

    // ---- prune dangles: iteratively drop edges at degree-1 vertices
    val adj = mutable.HashMap.empty[Int, mutable.LinkedHashSet[Int]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.LinkedHashSet.empty) += v
      adj.getOrElseUpdate(v, mutable.LinkedHashSet.empty) += u
    }
    val queue = mutable.Queue.empty[Int]
    adj.foreach { case (v, ns) => if (ns.size == 1) queue += v }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      adj.get(v).foreach { ns =>
        if (ns.size == 1) {
          val u = ns.head
          adj(v).clear(); adj -= v
          val un = adj(u)
          un -= v
          if (un.isEmpty) adj -= u
          else if (un.size == 1) queue += u
        }
      }
    }
    if (adj.isEmpty) return GeometryCollection(Array.empty)

    // ---- angular order of outgoing half-edges at each vertex
    val sorted = adj.map { case (v, ns) =>
      val (vx, vy) = coords(v)
      v -> ns.toArray.sortBy { u =>
        val (ux, uy) = coords(u)
        math.atan2(uy - vy, ux - vx)
      }
    }

    // ---- trace each directed half-edge's face once
    val visited = mutable.HashSet.empty[(Int, Int)]
    val shells = mutable.ArrayBuffer.empty[Array[Double]]
    val cwCycles = mutable.ArrayBuffer.empty[Array[Int]]
    sorted.keys.toArray.sorted.foreach { startV =>
      sorted(startV).foreach { startU =>
        val e0 = (startV, startU)
        if (!visited.contains(e0)) {
          val cycle = mutable.ArrayBuffer.empty[Int]
          var e = e0
          var guard = 0
          val maxSteps = 4 * edges.size + 4
          while ((cycle.isEmpty || e != e0) && guard < maxSteps) {
            visited += e
            cycle += e._1
            val (u, v) = e
            // arrive at v; leave along the edge clockwise from (v -> u)
            val outs = sorted(v)
            val idx = outs.indexOf(u)
            val next = outs((idx - 1 + outs.length) % outs.length)
            e = (v, next)
            guard += 1
          }
          if (e == e0 && cycle.length >= 3) {
            val ring = new Array[Double](2 * cycle.length + 2)
            var i = 0
            while (i < cycle.length) {
              val (x, y) = coords(cycle(i))
              ring(2 * i) = x; ring(2 * i + 1) = y
              i += 1
            }
            ring(2 * cycle.length) = ring(0)
            ring(2 * cycle.length + 1) = ring(1)
            val area = Measures.signedRingArea(ring)
            if (area > 0) shells += ring
            else if (area < 0) cwCycles += cycle.toArray
          }
        }
      }
    }

    // ---- assign CW component boundaries as holes of enclosing shells
    val shellPolys = shells.map(r => Polygon(r)).toArray
    val holesOf = Array.fill(shellPolys.length)(mutable.ArrayBuffer.empty[Array[Double]])
    cwCycles.foreach { cycle =>
      // a vertex strictly inside a shell proves enclosure by a different
      // component (own-component shells only touch at shared vertices)
      var best = -1
      var bestArea = Double.PositiveInfinity
      var i = 0
      while (i < shellPolys.length) {
        val a = Measures.area(shellPolys(i))
        if (a < bestArea) {
          var strictlyIn = false
          var k = 0
          while (k < cycle.length && !strictlyIn) {
            val (x, y) = coords(cycle(k))
            if (Predicates.locate(x, y, shellPolys(i)) == Predicates.IN)
              strictlyIn = true
            k += 1
          }
          if (strictlyIn) { best = i; bestArea = a }
        }
        i += 1
      }
      if (best >= 0) {
        val ring = new Array[Double](2 * cycle.length + 2)
        var i2 = 0
        while (i2 < cycle.length) {
          val (x, y) = coords(cycle(i2))
          ring(2 * i2) = x; ring(2 * i2 + 1) = y
          i2 += 1
        }
        ring(2 * cycle.length) = ring(0)
        ring(2 * cycle.length + 1) = ring(1)
        holesOf(best) += ring
      }
    }

    val polys = shellPolys.zipWithIndex.map { case (p, i) =>
      if (holesOf(i).isEmpty) p: Geometry
      else Polygon(p.rings(0) +: holesOf(i).toArray): Geometry
    }
    GeometryCollection(polys)
  }

  /** GEOS/shapely `build_area`: form the maximal areal geometry from
    * linework — polygonize the faces, classify the nesting tree by shell
    * containment (a face whose representative interior point sits inside
    * an odd number of OTHER faces' shells is a hole), keep the even-depth
    * faces, and dissolve shared edges by unioning them. Empty / dangling
    * linework yields an empty collection, like GEOS.
    */
  def buildArea(g: Geometry): Geometry = {
    val faces: Array[Polygon] = polygonize(g) match {
      case p: Polygon            => Array(p)
      case m: MultiPolygon       => m.polys
      case c: GeometryCollection => c.geoms.collect { case p: Polygon => p }
      case _                     => Array.empty
    }
    if (faces.isEmpty) return GeometryCollection(Array.empty)
    val pts = faces.map(Constructive.pointOnSurface)
    val keep = faces.indices.filter { i =>
      var d = 0
      var j = 0
      while (j < faces.length) {
        if (j != i) {
          val shell = Polygon(Array(faces(j).rings(0)))
          if (Predicates.locate(pts(i).x, pts(i).y, shell) == Predicates.IN) d += 1
        }
        j += 1
      }
      d % 2 == 0
    }.map(faces).toSeq
    Overlay.unionAll(keep)
  }
}
