package graft.streaming

import graft.geom.{Point, Wkb}
import graft.sql.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The executor-side fence-decode memo keys by (app id, broadcast id):
  * the app id disambiguates SparkContexts recreated in the same JVM
  * (broadcast ids restart from 0 — the r15 advice finding), while the
  * numeric id keeps the memo per-executor (object-identity keys would
  * miss once per task, since every task deserializes its own broadcast
  * stub).
  */
class FenceDecodeCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decode memo: no cross-broadcast reuse, stable memo per broadcast") {
    val sc = spark.sparkContext
    val b1 = sc.broadcast(Seq(1L -> Wkb.write(Point(0.0, 0.0))))
    val b2 = sc.broadcast(Seq(
      2L -> Wkb.write(Point(5.0, 5.0)),
      3L -> Wkb.write(Point(7.0, 7.0))))
    val d1 = GeoStreaming.decodedFences(b1)
    val d2 = GeoStreaming.decodedFences(b2)
    assert(d1.map(_._1) == Seq(1L))
    assert(d2.map(_._1) == Seq(2L, 3L))
    assert(d2.head._2.asInstanceOf[Point].x == 5.0)
    // repeated lookups return the SAME decoded instance (memo hit), and
    // the two broadcasts never alias each other's entries
    assert(GeoStreaming.decodedFences(b1) eq d1)
    assert(GeoStreaming.decodedFences(b2) eq d2)
    assert(!(GeoStreaming.decodedFences(b1) eq d2))
  }
}
