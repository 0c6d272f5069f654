package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Bounded streaming union: the dissolve aggregation buffer must not grow
  * with the number of input rows (the 100 TB dissolve path), and the
  * cascaded merge must produce the same geometry as a direct n-ary union.
  */
class CascadedUnionSpec extends AnyFunSuite {

  test("buffer stays O(log n) on a large overlapping-polygon stream") {
    val cu = new Overlay.CascadedUnion(8)
    val n = 2000
    // chain of overlapping unit squares: [k/2, k/2+1] x [0,1]
    var k = 0
    var maxSize = 0
    while (k < n) {
      cu.add(Polygon.box(k * 0.5, 0, k * 0.5 + 1, 1))
      if (cu.size > maxSize) maxSize = cu.size
      k += 1
    }
    // pending(<batch) + one partial per binomial level: 8 + ~log2(2000/8)
    assert(maxSize <= 24, s"buffer grew to $maxSize geometries")
    val g = cu.result().get
    // chain of n squares with 50% overlap: total extent [0, (n-1)/2 + 1] x [0,1]
    val expected = (n - 1) * 0.5 + 1.0
    assert(math.abs(Measures.area(g) - expected) < 1e-6,
      s"area ${Measures.area(g)} vs $expected")
    assert(Geometry.parts(g).count(!_.isEmpty) == 1)
  }

  test("cascaded result equals direct balanced unionAll") {
    val squares = (0 until 57).map(k => Polygon.box((k % 19) * 1.5, (k / 19) * 1.5,
      (k % 19) * 1.5 + 2, (k / 19) * 1.5 + 2): Geometry)
    val cu = new Overlay.CascadedUnion(4)
    squares.foreach(cu.add)
    val a = Measures.area(cu.result().get)
    val b = Measures.area(Overlay.unionAll(squares))
    assert(math.abs(a - b) < 1e-9, s"$a vs $b")
  }

  test("disjoint parts survive as separate polygons") {
    val cu = new Overlay.CascadedUnion(3)
    (0 until 10).foreach(k => cu.add(Polygon.box(k * 5, 0, k * 5 + 1, 1)))
    val g = cu.result().get
    assert(Geometry.parts(g).count(!_.isEmpty) == 10)
    assert(math.abs(Measures.area(g) - 10.0) < 1e-12)
  }

  test("empty stream yields no result") {
    val cu = new Overlay.CascadedUnion()
    assert(cu.result().isEmpty)
    cu.add(GeometryCollection(Array.empty))
    assert(cu.result().isEmpty)
  }
}
