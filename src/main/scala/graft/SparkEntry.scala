package graft

import graft.api.GeoDataFrame
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query has a matching `oracleSql` entry in plain DuckDB SQL (the
  * container's DuckDB has no spatial extension, so geo oracles are written
  * against the same synthetic coordinate mapping in scalar arithmetic).
  * Column names, types (BIGINT/DOUBLE/VARCHAR), rounding and ORDER BY are
  * aligned pairwise between the Spark query and its oracle.
  *
  * Canonical synthetic geometry over the TPC-H-ish testdata (no geometry
  * columns ship with it — geometry is synthesized like the reference's
  * points_from_xy, `dask_geopandas/expr.py:881-894`):
  *  - customer point:  (c_acctbal, (c_custkey % 1000)::double)
  *  - region triangle k: convex hull of (2200k-1000, 50) (2200k+1000, 50)
  *    (2200k, 950) — disjoint, covering the customer point domain
  *  - supplier square:  center (s_acctbal, (s_suppkey%100)*10), half-side
  *    (s_suppkey%10)+1 ; supplier right triangle for area/centroid
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.sql.functions.install(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  // customer points (the workhorse synthetic geometry)
  private def customerPts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn("cx", col("c_acctbal"))
      .withColumn("cy", (col("c_custkey") % 1000).cast("double"))
      .withColumn("geometry", st_point(col("cx"), col("cy")))

  // region triangles via collect + convex hull (CCW shells)
  private def regionTris(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region")
      .withColumn("ax", lit(2200.0) * col("r_regionkey") - 1000.0)
      .withColumn("geometry", st_convexHull(st_collect(array(
        st_point(col("ax"), lit(50.0)),
        st_point(col("ax") + 2000.0, lit(50.0)),
        st_point(lit(2200.0) * col("r_regionkey"), lit(950.0))))))
      .select(col("r_regionkey"), col("geometry"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full stack: scan -> point synthesis -> spatial join (broadcast NLJ with
    * custom predicate) -> aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val pts = GeoDataFrame(customerPts(spark, dir))
    val tris = GeoDataFrame(regionTris(spark, dir))
    val joined = pts.sjoin(tris, predicate = "within", strategy = "broadcast")
    joined.groupBy(col("r_regionkey")).agg(count(lit(1)).as("n_customers"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the pipeline
    * extensions). Keys are stable across rounds.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ================================================= relational core
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 1).as("sum_qty"),
          round(sum(col("l_extendedprice")), 1).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 1).as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_revenue_by_nation" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      // pre-aggregate lineitem to one row per order BEFORE the join: the
      // fact-side shuffle shrinks ~4x (600k line items -> 150k orders) and
      // count(DISTINCT o_orderkey) degenerates to count(*) — no Expand.
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("_rev"))
      perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("_rev")), 1).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    "q03_top_orders" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 1).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q04_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("c_custkey"), col("c_acctbal"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("nationkey"), col("rnk"))
    }),

    "q05_exists" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem").filter(col("l_quantity") > 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    "q06_filter_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    "q07_events_hourly" -> ((s, d) => {
      // events.ts is a nanosecond parquet timestamp; read as long (session
      // sets spark.sql.legacy.parquet.nanosAsLong) and bucket with exact
      // integer math — double division of 1e18-scale nanos would round.
      t(s, d, "events")
        .withColumn("hour_epoch", expr("ts DIV 3600000000000") * 3600)
        .groupBy(col("hour_epoch"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour_epoch"), col("event_type"))
    }),

    // ===================================================== geo operators
    // cx bbox selection (reference expr.py:391-402)
    "g01_bbox_filter" -> ((s, d) => {
      GeoDataFrame(customerPts(s, d)).cx(1000, 200, 5000, 800)
        .df.select(col("c_custkey"), col("cx"), col("cy"))
        .orderBy(col("c_custkey"))
    }),

    // st_distance (reference expr.py:1001-1013)
    "g02_distance" -> ((s, d) => {
      customerPts(s, d)
        .withColumn("dist", st_distance(col("geometry"), st_point(lit(5000.0), lit(500.0))))
        .filter(col("dist") < 1500.0)
        .select(col("c_custkey"), round(col("dist"), 4).as("dist"))
        .orderBy(col("c_custkey"))
    }),

    // sjoin broadcast strategy (reference sjoin.py:14-122)
    "g03_sjoin_pip" -> ((s, d) => {
      GeoDataFrame(customerPts(s, d))
        .sjoin(GeoDataFrame(regionTris(s, d)), predicate = "within", strategy = "broadcast")
        .select(col("c_custkey"), col("r_regionkey").cast("long").as("r_regionkey"))
        .orderBy(col("c_custkey"), col("r_regionkey"))
    }),

    // sjoin grid strategy — same semantics, shuffle-join plan
    "g15_sjoin_grid" -> ((s, d) => {
      GeoDataFrame(customerPts(s, d))
        .sjoin(GeoDataFrame(regionTris(s, d)), predicate = "within", strategy = "grid",
          gridLevel = 5)
        .select(col("c_custkey"), col("r_regionkey").cast("long").as("r_regionkey"))
        .orderBy(col("c_custkey"), col("r_regionkey"))
    }),

    // dissolve = groupBy + ST_UnionAgg (reference expr.py:652-703)
    "g04_dissolve" -> ((s, d) => {
      val g = GeoDataFrame(customerPts(s, d))
      g.dissolve(Seq("c_nationkey"), Seq(count(lit(1)).as("n_rows")))
        .df.select(col("c_nationkey").cast("long").as("nationkey"),
          st_numGeometries(col("geometry")).cast("long").as("n_points"),
          st_xmin(col("geometry")).as("xmin"), st_ymin(col("geometry")).as("ymin"),
          st_xmax(col("geometry")).as("xmax"), st_ymax(col("geometry")).as("ymax"),
          col("n_rows"))
        .orderBy(col("nationkey"))
    }),

    // total_bounds (reference expr.py:270-280)
    "g05_total_bounds" -> ((s, d) => {
      customerPts(s, d)
        .agg(st_envelopeAgg(col("geometry")).as("b"))
        .select(col("b.xmin").as("xmin"), col("b.ymin").as("ymin"),
          col("b.xmax").as("xmax"), col("b.ymax").as("ymax"))
    }),

    // area / centroid / perimeter over constructed triangles
    "g06_area_centroid" -> ((s, d) => {
      t(s, d, "supplier")
        .withColumn("ax", col("s_acctbal"))
        .withColumn("ay", (col("s_suppkey") % 100).cast("double") * 10.0)
        .withColumn("bx", col("ax") + ((col("s_suppkey") % 7) + 1).cast("double") * 100.0)
        .withColumn("cyy", col("ay") + ((col("s_suppkey") % 5) + 1).cast("double") * 100.0)
        .withColumn("tri", st_convexHull(st_collect(array(
          st_point(col("ax"), col("ay")),
          st_point(col("bx"), col("ay")),
          st_point(col("ax"), col("cyy"))))))
        .select(col("s_suppkey"),
          round(st_area(col("tri")), 4).as("area"),
          round(st_x(st_centroid(col("tri"))), 4).as("centroid_x"),
          round(st_y(st_centroid(col("tri"))), 4).as("centroid_y"),
          round(st_perimeter(col("tri")), 4).as("perimeter"))
        .orderBy(col("s_suppkey"))
    }),

    // WKT parse/write roundtrip (reference expr.py:897-919, 546-549)
    "g07_wkt_roundtrip" -> ((s, d) => {
      customerPts(s, d)
        .withColumn("wkt", concat(lit("POINT ("), col("cx").cast("string"),
          lit(" "), col("cy").cast("string"), lit(")")))
        .withColumn("parsed", st_geomFromWKT(col("wkt")))
        .select(col("c_custkey"), st_x(col("parsed")).as("x"), st_y(col("parsed")).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // morton SFC key (reference morton_distance.py)
    "g08_morton" -> ((s, d) => {
      customerPts(s, d)
        .select(col("c_custkey"),
          st_morton(col("geometry"), lit(16), lit(-1000.0), lit(0.0), lit(10000.0), lit(1000.0))
            .as("morton"))
        .orderBy(col("c_custkey"))
    }),

    // hilbert SFC key (reference hilbert_distance.py)
    "g09_hilbert" -> ((s, d) => {
      customerPts(s, d)
        .select(col("c_custkey"),
          st_hilbert(col("geometry"), lit(16), lit(-1000.0), lit(0.0), lit(10000.0), lit(1000.0))
            .as("hilbert"))
        .orderBy(col("c_custkey"))
    }),

    // geohash (reference geohash.py) — no plain-SQL oracle; rows-only check
    "g10_geohash" -> ((s, d) => {
      customerPts(s, d)
        .withColumn("lon", col("cx") / 100.0)
        .withColumn("lat", col("cy") / 20.0 - 25.0)
        .select(col("c_custkey"),
          st_geohash(st_point(col("lon"), col("lat")), lit(6)).as("geohash"))
        .orderBy(col("c_custkey"))
    }),

    // clip to rect (reference clip.py) over supplier squares
    "g11_clip" -> ((s, d) => {
      t(s, d, "supplier")
        .withColumn("x0", col("s_acctbal"))
        .withColumn("y0", (col("s_suppkey") % 100).cast("double") * 10.0)
        .withColumn("h", ((col("s_suppkey") % 10) + 1).cast("double"))
        .withColumn("sq", st_makeEnvelope(col("x0") - col("h"), col("y0") - col("h"),
          col("x0") + col("h"), col("y0") + col("h")))
        .select(col("s_suppkey"),
          round(st_area(st_clipByBox(col("sq"), lit(0.0), lit(0.0), lit(5000.0), lit(500.0))), 4)
            .as("clipped_area"))
        .orderBy(col("s_suppkey"))
    }),

    // explode of multipart geometries (reference expr.py:565-572)
    "g12_explode" -> ((s, d) => {
      val g = customerPts(s, d).filter(col("c_custkey") < 100)
        .withColumn("mp", st_collect(array(
          st_point(col("cx"), col("cy")), st_point(col("cy"), col("cx")))))
      GeoDataFrame(g.drop("geometry").withColumnRenamed("mp", "geometry"))
        .explodeParts()
        .df.select(col("c_custkey"), col("part_index").cast("long").as("part_index"),
          st_x(col("geometry")).as("px"), st_y(col("geometry")).as("py"))
        .orderBy(col("c_custkey"), col("part_index"))
    }),

    // buffer (reference expr.py:314-322)
    "g13_buffer" -> ((s, d) => {
      t(s, d, "supplier")
        .withColumn("r", ((col("s_suppkey") % 5) + 1).cast("double"))
        .withColumn("pt", st_point(col("s_acctbal"), (col("s_suppkey") % 100).cast("double")))
        .select(col("s_suppkey"),
          round(st_area(st_buffer(col("pt"), col("r"), lit(16))), 4).as("buf_area"))
        .orderBy(col("s_suppkey"))
    }),

    // affine chain (reference expr.py:339-385)
    "g14_affine" -> ((s, d) => {
      customerPts(s, d)
        .withColumn("tr", st_scale(
          st_translate(
            st_rotate(col("geometry"), lit(90.0), lit(0.0), lit(0.0)),
            lit(10.0), lit(20.0)),
          lit(2.0), lit(3.0), lit(0.0), lit(0.0)))
        .select(col("c_custkey"),
          round(st_x(col("tr")), 6).as("fx"), round(st_y(col("tr")), 6).as("fy"))
        .orderBy(col("c_custkey"))
    }),

    // ================================================ pipeline: text
    "t01_token_stats" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          gr_tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "t02_exact_dedup" -> ((s, d) => {
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "t03_quality" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), round(gr_qualityScore(col("text")), 4).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "t04_langid" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), gr_langId(col("text")).as("pred"))
        .orderBy(col("doc_id"))
    }),

    // minhash LSH near-dup candidates — no plain-SQL oracle; rows-only
    "t05_minhash_pairs" -> ((s, d) => {
      Dedup.minhashLsh(t(s, d, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 4, threshold = 0.35)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "t06_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccard(
        t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", "lang", n = 3, threshold = 0.3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "t07_simhash" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), gr_simhash64(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // ============================================= pipeline: vectors
    "e01_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", round(gr_cosine(col("qv"), col("cv")), 4))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH ANN — approximate; rows-only check
    "e02_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 8)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("query_id"), col("cosine").desc, col("neighbor_id"))
    }),

    // ========================================== pipeline: multimodal
    "m01_image_meta" -> ((s, d) => {
      Multimodal.extractImageMeta(
        Multimodal.withBinaryPayload(t(s, d, "documents"), "text"), "payload")
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"))
        .orderBy(col("doc_id"))
    }),

    // lang profile (text analysis rollup; exercises annotate + agg)
    "t08_lang_profile" -> ((s, d) => {
      TextAnalysis.langProfile(t(s, d, "documents"), "text")
        .select(col("lang_pred"), col("n_docs"), col("total_tokens"), col("avg_quality"))
        .orderBy(col("lang_pred"))
    })
  )

  /** DuckDB oracle SQL per query (omitted for approximate/rows-only ops:
    * g10_geohash, t05_minhash_pairs, e02_ann_lsh).
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
