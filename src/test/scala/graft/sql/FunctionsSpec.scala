package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.functions._

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sql.functions.install(s)
    s
  }
}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("st_point / st_x / st_y / st_astext") {
    val df = Seq((1.0, 2.0), (3.5, -4.25)).toDF("x", "y")
      .withColumn("g", st_point($"x", $"y"))
    val rows = df.select(st_x($"g"), st_y($"g"), st_asText($"g")).collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 2.0)
    assert(rows(0).getString(2) == "POINT (1 2)")
    assert(rows(1).getString(2) == "POINT (3.5 -4.25)")
  }

  test("predicates and measures over columns") {
    val df = Seq((0.0, 0.0), (10.0, 10.0)).toDF("x", "y")
      .withColumn("g", st_point($"x", $"y"))
      .withColumn("tri", st_geomFromWKT(lit("POLYGON ((-1 -1, 5 -1, -1 5, -1 -1))")))
    val got = df.select(st_contains($"tri", $"g"), st_distance($"g", st_point(lit(0.0), lit(3.0)))).collect()
    assert(got(0).getBoolean(0) && !got(1).getBoolean(0))
    assert(got(0).getDouble(1) == 3.0)
  }

  test("sql registration works") {
    val n = spark.sql(
      "SELECT st_area(st_geomfromwkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')) AS a").collect()(0).getDouble(0)
    assert(n == 4.0)
  }

  test("st_union_agg / st_envelope_agg / dissolve shape") {
    val df = Seq((1, 0.0, 0.0), (1, 1.0, 1.0), (1, 0.0, 0.0), (2, 5.0, 5.0))
      .toDF("k", "x", "y").withColumn("g", st_point($"x", $"y"))
    val agg = df.groupBy($"k").agg(
      st_unionAgg($"g").as("u"), st_envelopeAgg($"g").as("e"))
      .select($"k", st_numGeometries($"u").as("n"), $"e.xmin", $"e.ymax")
      .orderBy($"k").collect()
    assert(agg(0).getInt(1) == 2) // two distinct points in group 1
    assert(agg(0).getDouble(2) == 0.0 && agg(0).getDouble(3) == 1.0)
    assert(agg(1).getInt(1) == 1)
  }

  test("st_intersection_agg: shrink-fold, empty result, null skip, partition merge") {
    // group 1: three overlapping boxes -> [2,3]x[2,3]; group 2: disjoint
    // boxes -> empty; group 3: one null input only -> empty collection
    val rows = Seq(
      (1, "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"),
      (1, "POLYGON ((2 2, 5 2, 5 5, 2 5, 2 2))"),
      (1, "POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))"),
      (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
      (2, "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"),
      (3, null)
    ).toDF("k", "wkt")
      // 6 partitions: every row aggregates alone, forcing serialize/merge
      .repartition(6)
      .withColumn("g", when($"wkt".isNotNull, st_geomFromWKT($"wkt")))
    val got = rows.groupBy($"k")
      .agg(st_intersectionAgg($"g").as("ig"))
      .select($"k", st_area($"ig").as("a"), st_isEmpty($"ig").as("e"))
      .orderBy($"k").collect()
    assert(got(0).getDouble(1) == 1.0 && !got(0).getBoolean(2))
    assert(got(1).getBoolean(2), "disjoint group must intersect to empty")
    assert(got(2).getBoolean(2), "all-null group yields empty collection")
    // SQL registration
    val a = spark.sql(
      """SELECT st_area(st_intersection_agg(g)) FROM (
           SELECT st_geomfromwkt('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS g
           UNION ALL
           SELECT st_geomfromwkt('POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))'))""")
      .collect()(0).getDouble(0)
    assert(a == 2.0)
  }

  test("st_intersection_agg fuzz: random box folds match the closed-form rectangle") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 40).flatMap { g =>
      // boxes around a per-group center with bounded offsets: guaranteed
      // overlap for even groups, guaranteed-empty for odd ones
      val cx = g * 100.0
      (0 until 6).map { i =>
        val (ox, oy) = if (g % 2 == 0) (rnd.nextDouble(), rnd.nextDouble())
                       else (i * 50.0, 0.0) // disjoint chain
        val h = 2.0 + rnd.nextDouble() * 3.0
        (g, cx + ox - h, oy - h, cx + ox + h, oy + h)
      }
    }
    val df = rows.toDF("g", "x0", "y0", "x1", "y1")
      .withColumn("b", st_makeEnvelope($"x0", $"y0", $"x1", $"y1"))
      .repartition(8) // force partial/merge paths
    val got = df.groupBy($"g").agg(st_intersectionAgg($"b").as("ig"))
      .select($"g", st_area($"ig"), st_isEmpty($"ig")).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val want = rows.groupBy(_._1).map { case (g, bs) =>
      val x0 = bs.map(_._2).max; val y0 = bs.map(_._3).max
      val x1 = bs.map(_._4).min; val y1 = bs.map(_._5).min
      g -> (if (x0 < x1 && y0 < y1) (x1 - x0) * (y1 - y0) else 0.0)
    }
    want.foreach { case (g, a) =>
      if (a == 0.0) assert(got(g)._2, s"group $g should fold to empty")
      else assert(math.abs(got(g)._1 - a) < 1e-9 * math.max(a, 1.0),
        s"group $g area ${got(g)._1} != $a")
    }
  }

  test("st_closestpoint: on-A point realizing the pair distance") {
    val df = Seq(
      ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (10 2)"),
      ("LINESTRING (0 0, 10 0)", "POINT (3 5)"),
      ("POINT (1 1)", "LINESTRING (5 5, 9 5)")
    ).toDF("wa", "wb")
      .withColumn("a", st_geomFromWKT($"wa")).withColumn("b", st_geomFromWKT($"wb"))
      .select(st_closestPoint($"a", $"b").as("cp"), $"a", $"b")
      .withColumn("on_a", st_distance($"cp", $"a"))
      .withColumn("realizes", abs(st_distance($"cp", $"b") - st_distance($"a", $"b")))
      .select($"on_a", $"realizes", st_x($"cp"), st_y($"cp")).collect()
    df.foreach { r =>
      assert(r.getDouble(0) == 0.0, "closest point must lie on A")
      assert(r.getDouble(1) < 1e-9, "closest point must realize dist(A,B)")
    }
    assert(df(0).getDouble(2) == 4.0 && df(0).getDouble(3) == 2.0)
    assert(df(1).getDouble(2) == 3.0 && df(1).getDouble(3) == 0.0)
    assert(df(2).getDouble(2) == 1.0 && df(2).getDouble(3) == 1.0)
  }

  test("st_dump + explode") {
    val df = Seq("MULTIPOINT ((1 1), (2 2), (3 3))").toDF("wkt")
      .withColumn("g", st_geomFromWKT($"wkt"))
      .select(explode(st_dump($"g")).as("part"))
      .select(st_x($"part").as("x"))
    assert(df.as[Double].collect().sorted.sameElements(Array(1.0, 2.0, 3.0)))
  }

  test("sfc keys") {
    val df = Seq((0.0, 0.0), (1.0, 1.0), (1.0, 0.0)).toDF("x", "y")
      .withColumn("g", st_point($"x", $"y"))
    val h = df.select(st_hilbert($"g", lit(2), lit(0.0), lit(0.0), lit(1.0), lit(1.0))).as[Long].collect()
    assert(h.sameElements(Array(0L, 10L, 15L)))
    val gh = df.select(st_geohash($"g", lit(5))).as[String].collect()
    assert(gh(0) == "s0000")
  }

  test("text kernels") {
    val df = Seq("the cat and the hat", "").toDF("t")
    val got = df.select(gr_tokenCount($"t"), gr_simhash64($"t"), gr_langId($"t")).collect()
    assert(got(0).getInt(0) == 5)
    assert(got(0).getString(2) == "en")
    assert(got(1).getInt(0) == 0)
  }

  test("vector kernels") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(gr_cosine($"a", $"b")).as[Double].collect()
    assert(got(0) == 1.0 && got(1) == 0.0)
  }

  test("null propagation") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(2.0))).toDF("x", "y")
    val got = df.select(st_point($"x", $"y")).collect()
    assert(got(0).get(0) != null && got(1).get(0) == null)
  }

  test("st_transform lonlat <-> mercator roundtrip") {
    val df = Seq((10.0, 45.0)).toDF("lon", "lat")
      .withColumn("g", st_point($"lon", $"lat"))
      .withColumn("m", st_transform($"g", lit("EPSG:4326"), lit("EPSG:3857")))
      .withColumn("back", st_transform($"m", lit("EPSG:3857"), lit("EPSG:4326")))
    val r = df.select(st_x($"back"), st_y($"back"), st_x($"m")).collect()(0)
    assert(math.abs(r.getDouble(0) - 10.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 45.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1113194.9079327357) < 1e-6)
  }

  test("st_transform treats NAD83 geographic as WGS84 (documented approximation)") {
    val df = Seq((15.5, 46.0)).toDF("lon", "lat")
      .withColumn("g", st_point($"lon", $"lat"))
      .withColumn("a", st_transform($"g", lit("EPSG:4269"), lit("EPSG:3857")))
      .withColumn("b", st_transform($"g", lit("EPSG:4326"), lit("EPSG:3857")))
      .withColumn("noop", st_transform($"g", lit("NAD83"), lit("EPSG:4326")))
    val r = df.select(st_x($"a"), st_x($"b"), st_x($"noop"), st_y($"noop")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(2) == 15.5 && r.getDouble(3) == 46.0)
    // the other WGS84-equivalent geographic datums resolve the same way
    Seq("EPSG:4258", "ETRS89", "EPSG:4283", "GDA94", "EPSG:7844",
        "EPSG:4167", "EPSG:6668").foreach { code =>
      val v = Seq((15.5, 46.0)).toDF("lon", "lat")
        .withColumn("g", st_point($"lon", $"lat"))
        .select(st_x(st_transform($"g", lit(code), lit("EPSG:4326"))))
        .collect()(0).getDouble(0)
      assert(v == 15.5, s"$code should be WGS84-equivalent")
    }
  }

  test("st_asText with rounding_precision rounds coordinates before writing") {
    val got = Seq(("POINT (1.23456789 -2.98765432)", 3),
        ("LINESTRING (0.5004999 0, 10.12 20.999)", 2))
      .toDF("wkt", "p")
      .select(st_asText(st_geomFromWKT($"wkt"), $"p"))
      .as[String].collect().toSeq
    assert(got == Seq("POINT (1.235 -2.988)", "LINESTRING (0.5 0, 10.12 21)"))
  }

  test("gr_repetition counts tokens, top token, bigrams") {
    val df = Seq(
      (1L, "a b a b a"),        // 5 tokens, 2 distinct, top 'a'=3, 4 bigrams ('a b','b a' x2 each) -> 2 distinct
      (2L, "x"),                // single token: no bigrams
      (3L, "")).toDF("id", "text")
    val r = df.select($"id", gr_repetition($"text").as("r"))
      .select($"id", $"r.n_tokens", $"r.n_distinct", $"r.top_count",
        $"r.n_bigrams", $"r.n_distinct_bigrams")
      .orderBy($"id").collect()
    assert(r(0).toSeq.drop(1) == Seq(5L, 2L, 3L, 4L, 2L))
    assert(r(1).toSeq.drop(1) == Seq(1L, 1L, 1L, 0L, 0L))
    assert(r(2).toSeq.drop(1) == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("st_transform composes any supported pair through lon/lat") {
    // mercator -> UTM 33N directly equals mercator -> 4326 -> UTM 33N
    val df = Seq((15.5, 46.0)).toDF("lon", "lat")
      .withColumn("g", st_point($"lon", $"lat"))
      .withColumn("m", st_transform($"g", lit("EPSG:4326"), lit("EPSG:3857")))
      .withColumn("direct", st_transform($"m", lit("EPSG:3857"), lit("EPSG:32633")))
      .withColumn("hub", st_transform(
        st_transform($"m", lit("EPSG:3857"), lit("EPSG:4326")),
        lit("EPSG:4326"), lit("EPSG:32633")))
      .withColumn("back", st_transform($"direct", lit("EPSG:32633"), lit("EPSG:3857")))
    val r = df.select(st_x($"direct"), st_x($"hub"), st_y($"direct"), st_y($"hub"),
      st_x($"back"), st_x($"m")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(2) == r.getDouble(3))
    // roundtrip mercator -> UTM -> mercator within series accuracy
    assert(math.abs(r.getDouble(4) - r.getDouble(5)) < 1e-3)
  }

  test("st_areaspheroid/perimeterspheroid: graticule-quad truth by Simpson integration") {
    // ellipsoidal area of [lam1,lam2]x[phi1,phi2] = dlam * Int M N cos(phi)
    // — an independent numeric truth; the operator projects through the
    // equal-area LAEA kernel, so agreement validates the whole chain.
    val A = 6378137.0; val F = 1.0 / 298.257223563; val E2 = F * (2.0 - F)
    def w(p: Double) = math.sqrt(1.0 - E2 * math.sin(p) * math.sin(p))
    def mn(p: Double) = (A * (1.0 - E2) / math.pow(w(p), 3)) * (A / w(p)) * math.cos(p)
    def quadTruth(lat0: Double): Double = {
      val steps = 4000
      var s = 0.0
      for (k <- 0 until steps) {
        val a0 = math.toRadians(lat0 + k.toDouble / steps)
        val a1 = math.toRadians(lat0 + (k + 1).toDouble / steps)
        s += (a1 - a0) / 6.0 * (mn(a0) + 4 * mn((a0 + a1) / 2) + mn(a1))
      }
      s * math.toRadians(1.0)
    }
    // densified 1x1 degree quad (0.05-degree steps — the documented
    // densify-long-edges guidance; straight-LAEA edge error is L^2)
    def quadWkt(lon0: Double, lat0: Double): String = {
      val pts = ((0 to 20).map(i => (lon0 + i * 0.05, lat0)) ++
        (0 to 20).map(i => (lon0 + 1.0, lat0 + i * 0.05)) ++
        (0 to 20).map(i => (lon0 + 1.0 - i * 0.05, lat0 + 1.0)) ++
        (0 to 20).map(i => (lon0, lat0 + 1.0 - i * 0.05)))
      "POLYGON ((" + pts.map { case (x, y) => s"$x $y" }.mkString(", ") + "))"
    }
    for (lat0 <- Seq(0.0, 60.0)) {
      val got = Seq(quadWkt(7.0, lat0)).toDF("wkt")
        .select(st_areaSpheroid(st_geomFromWKT($"wkt")).as("a"),
          st_perimeterSpheroid(st_geomFromWKT($"wkt")).as("p"))
        .as[(Double, Double)].head()
      val truth = quadTruth(lat0)
      assert(math.abs(got._1 / truth - 1.0) < 2e-6,
        s"area at lat0=$lat0: ${got._1} vs $truth")
      // perimeter: 2 meridian arcs (1 deg) + the two parallel arcs
      def parallelArc(latDeg: Double) = {
        val p = math.toRadians(latDeg)
        math.toRadians(1.0) * (A / w(p)) * math.cos(p)
      }
      val steps = 2000
      var mArc = 0.0
      for (k <- 0 until steps) {
        val a0 = math.toRadians(lat0 + k.toDouble / steps)
        val a1 = math.toRadians(lat0 + (k + 1).toDouble / steps)
        val mr = (p: Double) => A * (1.0 - E2) / math.pow(w(p), 3)
        mArc += (a1 - a0) / 6.0 * (mr(a0) + 4 * mr((a0 + a1) / 2) + mr(a1))
      }
      val perimTruth = 2 * mArc + parallelArc(lat0) + parallelArc(lat0 + 1.0)
      assert(math.abs(got._2 / perimTruth - 1.0) < 1e-5,
        s"perimeter at lat0=$lat0: ${got._2} vs $perimTruth")
    }
  }

  test("geography measures: st_distancespheroid/sphere/lengthspheroid") {
    val r = Seq((7.44, 46.95, 8.54, 47.38)).toDF("x1", "y1", "x2", "y2")
      .select(
        st_distanceSpheroid(st_point($"x1", $"y1"), st_point($"x2", $"y2")).as("dv"),
        st_distanceSphere(st_point($"x1", $"y1"), st_point($"x2", $"y2")).as("ds"),
        st_lengthSpheroid(st_makeLine(array(
          st_point($"x1", $"y1"), st_point($"x2", $"y2")))).as("len"))
      .collect()(0)
    // Bern -> Zurich ~95 km; the line's length IS the endpoint geodesic
    assert(r.getDouble(0) > 90000 && r.getDouble(0) < 100000)
    assert(math.abs(r.getDouble(0) / r.getDouble(1) - 1.0) < 0.006)
    assert(r.getDouble(2) == r.getDouble(0))
  }

  test("st_lengthspheroid recurses into collections; st_areaspheroid handles the antimeridian") {
    // a MultiLineString nested inside a GeometryCollection must contribute
    // (one-level collect used to silently drop it)
    val q = Seq(1).toDF("i").select(
      expr("st_lengthspheroid(st_geomfromwkt(" +
        "'GEOMETRYCOLLECTION(MULTILINESTRING((0 0, 1 0),(2 0, 3 0)), LINESTRING(4 0, 5 0))'))")
        .as("nested"),
      expr("st_lengthspheroid(st_geomfromwkt('MULTILINESTRING((0 0, 1 0),(2 0, 3 0),(4 0, 5 0))'))")
        .as("flat")).collect()(0)
    assert(q.getDouble(0) > 0 && q.getDouble(0) == q.getDouble(1))

    // antimeridian-spanning quad: same shape as a lon-0 quad, so the
    // ellipsoidal area must match (center used to land ~180 deg away)
    val a = Seq(1).toDF("i").select(
      expr("st_areaspheroid(st_geomfromwkt('POLYGON((179 10, -179 10, -179 11, 179 11, 179 10))'))")
        .as("am"),
      expr("st_areaspheroid(st_geomfromwkt('POLYGON((0 10, 2 10, 2 11, 0 11, 0 10))'))")
        .as("ref")).collect()(0)
    assert(a.getDouble(1) > 0)
    assert(math.abs(a.getDouble(0) / a.getDouble(1) - 1.0) < 1e-9,
      s"antimeridian area ${a.getDouble(0)} vs ${a.getDouble(1)}")
  }

  test("st_bufferspheroid: point ring sits at geodesic distance r; area matches the cap") {
    val r = 50000.0
    val rows = Seq((8.54, 47.38), (-73.97, 40.78), (151.21, -33.87))
      .toDF("lon", "lat")
      .withColumn("pt", st_point($"lon", $"lat"))
      .withColumn("buf", st_bufferSpheroid($"pt", lit(r), lit(16)))
      .select($"pt", $"buf", st_numPoints($"buf").as("n"),
        expr("st_areaspheroid(buf)").as("area"))
      .collect()
    for (row <- rows) {
      val pt = graft.geom.Wkb.read(row.getAs[Array[Byte]](0)).asInstanceOf[graft.geom.Point]
      val buf = graft.geom.Wkb.read(row.getAs[Array[Byte]](1))
      // every exterior vertex at geodesic distance r from the center, sub-mm
      val poly = buf.asInstanceOf[graft.geom.Polygon]
      val xy = poly.rings.head
      var i = 0
      while (i + 1 < xy.length) {
        val d = Crs.geodesicDistance(pt.x, pt.y, xy(i), xy(i + 1))
        assert(math.abs(d - r) < 1e-3, s"vertex dist $d vs $r")
        i += 2
      }
      // ellipsoidal area ~ the inscribed 64-gon of a geodesic circle:
      // pi r^2 * (1 - curvature correction) with polygon deficit
      // sin(2pi/n)/(2pi/n); 0.5% tolerance absorbs both corrections
      val capApprox = math.Pi * r * r
      assert(math.abs(row.getDouble(3) / capApprox - 1.0) < 0.005,
        s"area ${row.getDouble(3)} vs $capApprox")
      assert(row.getInt(2) == 65) // 4*16 segments + closing vertex
    }
  }

  test("st_bufferspheroid: line/polygon inputs and antimeridian recentering") {
    // 100 km segment buffered by 10 km: area ~ 2*r*len + pi*r^2
    val lr = Seq(1).toDF("i").select(
      expr("st_bufferspheroid(st_geomfromwkt('LINESTRING(7 46, 7 46.8993)'), 10000, 16)").as("b"))
      .select(expr("st_areaspheroid(b)").as("area"),
        expr("st_lengthspheroid(st_geomfromwkt('LINESTRING(7 46, 7 46.8993)'))").as("len"))
      .collect()(0)
    val expected = 2.0 * 10000.0 * lr.getDouble(1) + math.Pi * 1e8
    assert(math.abs(lr.getDouble(0) / expected - 1.0) < 0.005,
      s"line buffer area ${lr.getDouble(0)} vs $expected")

    // negative buffer erodes a polygon: area shrinks but stays positive
    val er = Seq(1).toDF("i").select(
      expr("st_areaspheroid(st_bufferspheroid(" +
        "st_geomfromwkt('POLYGON((0 10, 1 10, 1 11, 0 11, 0 10))'), -20000, 16))").as("a"),
      expr("st_areaspheroid(st_geomfromwkt('POLYGON((0 10, 1 10, 1 11, 0 11, 0 10))'))").as("a0"))
      .collect()(0)
    assert(er.getDouble(0) > 0 && er.getDouble(0) < er.getDouble(1))

    // antimeridian-spanning center: ring still at geodesic distance r
    val am = Seq(1).toDF("i").select(
      expr("st_bufferspheroid(st_geomfromwkt('LINESTRING(179.8 10, -179.8 10)'), 5000, 16)").as("b"))
      .collect()(0)
    val bg = graft.geom.Wkb.read(am.getAs[Array[Byte]](0))
    val env = bg.envelope
    assert(!env.isEmpty)
    // vertices stay in valid lon range and on both sides of the seam
    assert(env.minX >= -180.0 && env.maxX <= 180.0)
    assert(env.maxX - env.minX > 180.0) // wrapped output spans the seam
  }

  test("degenerate CRS records are rejected at parse (eqdc symmetric parallels)") {
    assert(Crs.projFor("+proj=eqdc +lat_1=10 +lat_2=-10 +lat_0=0 +lon_0=0 +ellps=WGS84").isEmpty)
    assert(Crs.projFor("+proj=eqdc +lat_1=0 +lat_2=0 +lat_0=0 +lon_0=0 +ellps=WGS84").isEmpty)
    assert(Crs.projFor("+proj=eqdc +lat_1=20 +lat_2=60 +lat_0=40 +lon_0=-96 +ellps=WGS84").isDefined)
  }
}
