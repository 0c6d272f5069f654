package graft.api

import graft.sql.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Clustering family: clusterDBSCAN / clusterWithin / clusterIntersecting
  * (PostGIS ST_ClusterDBSCAN / ST_ClusterWithin / ST_ClusterIntersecting
  * surface). The sf0.01 value-hash equivalence vs a DuckDB reach-CTE oracle
  * is the driver's gate (g101/g102); these specs pin the semantics on
  * hand-built shapes and cross-check the distributed plan against an
  * in-memory brute-force DBSCAN on seeded random data.
  */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gdf(pts: Seq[(Long, Double, Double)]) =
    GeoDataFrame.pointsFromXY(pts.toDF("id", "x", "y"), "x", "y")

  /** Reference DBSCAN: brute force on the driver, same conventions
    * (count includes self; labels = min core id of the component; border
    * takes the min label among core neighbors; noise = None).
    */
  private def bruteDbscan(
      pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int)
      : Map[Long, (Boolean, Option[Long])] = {
    val within = (a: (Long, Double, Double), b: (Long, Double, Double)) =>
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps * eps
    val nbrs = pts.map(p => p._1 -> pts.filter(q => q._1 != p._1 && within(p, q))).toMap
    val core = pts.map(p => p._1 -> (nbrs(p._1).size + 1 >= minPts)).toMap
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(pts.map(p => p._1 -> p._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (p <- pts if core(p._1); q <- nbrs(p._1) if core(q._1)) {
      val (a, b) = (find(p._1), find(q._1))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    // component label = min core id (union-find roots to the min already)
    pts.map { p =>
      if (core(p._1)) p._1 -> ((true, Some(find(p._1))))
      else {
        val coreNbrLabels = nbrs(p._1).filter(q => core(q._1)).map(q => find(q._1))
        p._1 -> ((false, if (coreNbrLabels.isEmpty) None else Some(coreNbrLabels.min)))
      }
    }.toMap
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Boolean, Option[Long])] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    }.toMap

  test("dbscan: two blobs, a border, and noise") {
    // blob A around (0,0): ids 1-4 mutually within eps; blob B around
    // (100,0): ids 10-12; border 5 near blob A's core but with too few
    // neighbors of its own reach; noise 99 far away
    val pts = Seq[(Long, Double, Double)](
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0),
      (5L, 2.6, 0.0), // within eps=3 of 1,2,3,4 -> 5 incl self -> core
      (6L, 5.5, 0.0), // within eps of 5 only -> 2 incl self -> border
      (10L, 100.0, 0.0), (11L, 101.0, 0.0), (12L, 100.0, 1.0),
      (99L, 500.0, 500.0))
    val got = collectAssign(gdf(pts).clusterDBSCAN("id", eps = 3.0, minPoints = 3))
    val want = bruteDbscan(pts, 3.0, 3)
    assert(got == want)
    // explicit expectations: blob A all one cluster labeled 1
    assert(got(1L) == ((true, Some(1L))) && got(4L) == ((true, Some(1L))))
    assert(got(5L)._2 == Some(1L))
    // 6 is a border of the min-reachable cluster
    assert(got(6L) == ((false, Some(1L))))
    // blob B labeled 10
    assert(got(10L) == ((true, Some(10L))) && got(12L)._2 == Some(10L))
    // noise
    assert(got(99L) == ((false, None)))
  }

  test("dbscan: border between two clusters takes the min label") {
    // two unit squares (all four corners mutually within eps=2, so all
    // core at minPts=4); a lone point exactly eps away from one core of
    // EACH square (inclusive boundary, exact integer arithmetic) with only
    // 3 neighbors incl self < minPts -> border, min label wins
    val pts = Seq[(Long, Double, Double)](
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0), (4L, 1.0, 1.0),
      (20L, 5.0, 0.0), (21L, 6.0, 0.0), (22L, 5.0, 1.0), (23L, 6.0, 1.0),
      (50L, 3.0, 0.0)) // dist to id 2 = 2.0 and to id 20 = 2.0, both <= eps
    val got = collectAssign(gdf(pts).clusterDBSCAN("id", eps = 2.0, minPoints = 4))
    val want = bruteDbscan(pts, 2.0, 4)
    assert(got == want)
    assert(got(50L) == ((false, Some(1L)))) // attached to min label among core neighbors
    // the two blobs stay distinct (50 is not core, cannot bridge)
    assert(got(20L)._2 == Some(20L) && got(1L)._2 == Some(1L))
  }

  test("dbscan: minPoints=1 makes everything core; chain connectivity") {
    // a chain 0-1-2-3 spaced 1.0 apart with eps=1.0 — connectivity must
    // propagate across cells (inclusive <= eps boundary)
    val pts = (0L to 3L).map(i => (i, i.toDouble, 0.0))
    val got = collectAssign(gdf(pts).clusterDBSCAN("id", eps = 1.0, minPoints = 1))
    assert(got.values.forall(_._1 == true))
    assert(got.values.map(_._2).toSet == Set(Some(0L)))
  }

  test("dbscan: randomized differential vs brute force") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    for ((eps, mp) <- Seq((3.0, 3), (5.0, 5), (1.5, 2))) {
      val got = collectAssign(gdf(pts).clusterDBSCAN("id", eps, mp))
      val want = bruteDbscan(pts, eps, mp)
      assert(got == want, s"eps=$eps minPts=$mp")
    }
  }

  test("clusterWithin: chained connectivity, singletons label themselves") {
    // a-b-c chained at 1.0 spacing (a to c is 2.0 > d) plus a singleton
    val pts = Seq[(Long, Double, Double)](
      (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 2.0, 0.0), (9L, 50.0, 50.0))
    val out = gdf(pts).clusterWithin("id", distance = 1.2, cellSize = 1.2)
      .select($"id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(9L) == 9L)
  }

  test("clusterIntersecting: overlapping boxes cluster, disjoint do not") {
    val wkts = Seq(
      (1L, "POLYGON((0 0,2 0,2 2,0 2,0 0))"),
      (2L, "POLYGON((1 1,3 1,3 3,1 3,1 1))"), // overlaps 1
      (3L, "POLYGON((2.5 2.5,4 2.5,4 4,2.5 4,2.5 2.5))"), // overlaps 2, not 1 -> chain
      (4L, "POLYGON((10 10,11 10,11 11,10 11,10 10))")) // isolated
    val df = wkts.toDF("id", "wkt")
      .withColumn("geometry", graft.sql.functions.st_geomFromWKT($"wkt"))
    val out = GeoDataFrame(df).clusterIntersecting("id", cellSize = 2.0)
      .select($"id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L)
  }

  test("dbscan: inclusive eps boundary and exactly-one-row-per-input") {
    // pairs at exactly eps apart connect (<=, not <) — exact integer
    // doubles so both engines would agree bit-for-bit
    val pts = Seq[(Long, Double, Double)](
      (1L, 0.0, 0.0), (2L, 2.0, 0.0), (3L, 4.0, 0.0))
    val out = gdf(pts).clusterDBSCAN("id", eps = 2.0, minPoints = 2)
    assert(out.count() == 3)
    val got = collectAssign(out)
    assert(got.values.forall(v => v._1 && v._2 == Some(1L)))
  }

  test("dbscan: narrow output schema (id, is_core, cluster_id) and dense-grid case") {
    // a 10x5 unit grid with eps=2 connects everything; plus schema contract:
    // geometry is projected away at the head of the plan, the output is the
    // three narrow columns only (the 100 TB story — geometry never shuffles)
    val pts = (0L until 50L).map(i => (i, (i % 10).toDouble, (i / 10).toDouble))
    val out = gdf(pts).clusterDBSCAN("id", 2.0, 3)
    assert(out.columns.toSeq == Seq("id", "is_core", "cluster_id"))
    assert(out.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("long", "boolean", "long"))
    val got = collectAssign(out)
    assert(got == bruteDbscan(pts, 2.0, 3))
    assert(got.values.forall(v => v._1 && v._2 == Some(0L)))
  }

  test("kmeans: separated blobs converge to blob membership") {
    // three tight blobs far apart: any reasonable init converges in 2
    // iterations and each blob lands in exactly one cluster
    val pts = (0L until 30L).map { i =>
      val blob = i % 3
      (i, blob * 1000.0 + (i % 5) * 0.5, blob * 1000.0 + (i % 7) * 0.5)
    }
    val out = GeoDataFrame.pointsFromXY(pts.toDF("id", "x", "y"), "x", "y")
      .clusterKMeans("id", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byBlob = pts.groupBy(_._1 % 3).map { case (b, ps) => b -> ps.map(p => out(p._1)).toSet }
    assert(byBlob.values.forall(_.size == 1), s"blob split across clusters: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3) // three distinct labels
  }

  test("kmeans: deterministic across partitionings; k > n keeps empty clusters harmless") {
    val pts = (0L until 40L).map(i => (i, (i % 8).toDouble * 3, (i / 8).toDouble * 3))
    def run(parts: Int) = GeoDataFrame
      .pointsFromXY(pts.toDF("id", "x", "y").repartition(parts), "x", "y")
      .clusterKMeans("id", k = 4, iters = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(run(1) == run(7))
    // k larger than the point count: ids stay in [0, k), no crash
    val small = GeoDataFrame.pointsFromXY(
        Seq((1L, 0.0, 0.0), (2L, 10.0, 10.0)).toDF("id", "x", "y"), "x", "y")
      .clusterKMeans("id", k = 5, iters = 2)
      .collect().map(_.getInt(1))
    assert(small.forall(c => c >= 0 && c < 5) && small.distinct.length == 2)
  }
}
