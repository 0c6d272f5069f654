package graft

/** DuckDB oracle SQL for SparkEntry.queries. Plain SQL only (the driver's
  * DuckDB has no spatial extension), replicating the same synthetic
  * geometry mapping in scalar arithmetic. Rounding, column names, integer
  * widths and ORDER BY match the Spark side pairwise.
  */
object OracleSql {

  // shared snippets
  private val custPts =
    "SELECT c_custkey, c_nationkey, c_acctbal AS cx, (c_custkey % 1000)::DOUBLE AS cy FROM customer"

  private val quantX = "CAST(floor(((cx - (-1000.0)) / (10000.0 - (-1000.0))) * 65535) AS BIGINT)"
  private val quantY = "CAST(floor(((cy - 0.0) / (1000.0 - 0.0)) * 65535) AS BIGINT)"

  private def spread(v: String): String = {
    val s1 = s"((($v) | (($v) << 16)) & 281470681808895)"
    val s2 = s"((($s1) | (($s1) << 8)) & 71777214294589695)"
    val s3 = s"((($s2) | (($s2) << 4)) & 1085102592571150095)"
    val s4 = s"((($s3) | (($s3) << 2)) & 3689348814741910323)"
    s"((($s4) | (($s4) << 1)) & 6148914691236517205)"
  }

  // strict point-in-triangle via CCW cross products; triangle for region k:
  // A=(2200k-1000, 50) B=(2200k+1000, 50) C=(2200k, 950)
  private val pipCond = """
    (((2200.0*r_regionkey+1000.0) - (2200.0*r_regionkey-1000.0)) * (cy - 50.0)
      - (50.0 - 50.0) * (cx - (2200.0*r_regionkey-1000.0))) > 0
    AND ((2200.0*r_regionkey - (2200.0*r_regionkey+1000.0)) * (cy - 50.0)
      - (950.0 - 50.0) * (cx - (2200.0*r_regionkey+1000.0))) > 0
    AND (((2200.0*r_regionkey-1000.0) - 2200.0*r_regionkey) * (cy - 950.0)
      - (50.0 - 950.0) * (cx - 2200.0*r_regionkey)) > 0"""

  // shared by t62 (batch) and t64 (streaming): the two engines MUST
  // verify against the SAME reconstruction SQL — a one-sided edit
  // would silently desynchronize the batch and streaming oracles
  private lazy val rewriteOracleSql: String = s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN [md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)]
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr,
                   unnest(range(0, len(gs))) AS pos
            FROM g WHERE source <> 'src0'),
      hit AS (SELECT c.doc_id, c.pos FROM c JOIN b ON c.gr = b.gr),
      m AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     > 8
                THEN 1 ELSE 0 END AS brk
            FROM hit),
      sn AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span
             FROM m),
      spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
                FROM sn GROUP BY doc_id, span),
      sp AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sps
             FROM spans GROUP BY doc_id),
      r AS (SELECT t.doc_id, toks, sps
            FROM tok t LEFT JOIN sp USING (doc_id)
            WHERE t.source <> 'src0'),
      k AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
              CASE WHEN sps IS NULL THEN toks
                   ELSE [toks[i+1] FOR i IN range(0, len(toks))
                         IF len(list_filter(sps,
                              x -> i >= x.s AND i < x.e)) = 0]
              END AS kept
            FROM r)
      SELECT doc_id, n_tokens,
             (n_tokens - len(kept))::BIGINT AS n_removed,
             round(CASE WHEN n_tokens > 0
               THEN (n_tokens - len(kept))::DOUBLE / n_tokens::DOUBLE
               ELSE 0.0 END, 4) AS removed_ratio,
             coalesce(array_to_string(kept, ' '), '') AS new_text,
             md5(coalesce(array_to_string(kept, ' '), '')) AS new_hash
      FROM k ORDER BY doc_id"""

  private val docToks =
    "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

  // square pair A/B per supplier (same fp op order as the Spark query)
  private val sqPairs = """
    SELECT s_suppkey,
      s_acctbal - ((s_suppkey % 10) + 1)::DOUBLE AS ax0,
      s_acctbal + ((s_suppkey % 10) + 1)::DOUBLE AS ax1,
      (s_suppkey % 100)::DOUBLE * 10.0 - ((s_suppkey % 10) + 1)::DOUBLE AS ay0,
      (s_suppkey % 100)::DOUBLE * 10.0 + ((s_suppkey % 10) + 1)::DOUBLE AS ay1,
      s_acctbal + (s_suppkey % 30)::DOUBLE - ((s_suppkey % 7) + 1)::DOUBLE AS bx0,
      s_acctbal + (s_suppkey % 30)::DOUBLE + ((s_suppkey % 7) + 1)::DOUBLE AS bx1,
      (s_suppkey % 100)::DOUBLE * 10.0 - ((s_suppkey % 7) + 1)::DOUBLE AS by0,
      (s_suppkey % 100)::DOUBLE * 10.0 + ((s_suppkey % 7) + 1)::DOUBLE AS by1
    FROM supplier"""

  private val qualityExpr = s"""
    CASE WHEN length(text) = 0 OR len($docToks) = 0 THEN 0.0 ELSE
      0.5 * (CASE WHEN ml >= 3 AND ml <= 10 THEN 1.0
                  WHEN ml < 3 THEN ml / 3.0 ELSE 10.0 / ml END)
      + 0.25 * (1.0 - least(1.0, 5.0 * (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / length(text)))
      + 0.25 * (1.0 - least(1.0, 5.0 * (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / length(text)))
    END"""

  // minhash-LSH candidate pipeline shared by t05/t10 (MD5 lanes, bands,
  // signature estimate) — terminates in the `est` CTE.
  // CAP ASSUMPTION: this enumerates exact all-pairs per bucket, which
  // equals the engine's output only while every LSH bucket fits inside
  // minhashLsh's default maxBucket=128 (above it the engine switches to
  // representative-chained emission). Verified at the oracle SF (sf0.01):
  // max bucket = 101. If the testdata generator ever pushes a bucket past
  // 128 at sf0.01, either raise the cap in the declared queries or mirror
  // the chaining here.
  private val minhashCtes = """
      d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 4),
      sh AS (SELECT DISTINCT doc_id, substr(text, i::INT, 4) AS s4
             FROM d, LATERAL unnest(range(1, length(text) - 2)) t(i)),
      hh AS (SELECT doc_id,
                    ('0x' || substr(md5(s4), 1, 16))::UBIGINT::HUGEINT AS h1,
                    ('0x' || substr(md5(s4), 17, 16))::UBIGINT::HUGEINT AS h2
             FROM sh),
      lanes AS (SELECT doc_id, k.k AS k,
                       min(((h1 + (42 + k.k) * h2) % 9223372036854775808)::BIGINT) AS v
                FROM hh, (SELECT unnest(range(0, 64)) AS k) k
                GROUP BY doc_id, k.k),
      sig AS (SELECT doc_id, list(v ORDER BY k) AS s FROM lanes GROUP BY doc_id),
      bands AS (SELECT doc_id, b.b AS b,
                       s[4*b.b + 1]::VARCHAR || ',' || s[4*b.b + 2]::VARCHAR || ',' ||
                       s[4*b.b + 3]::VARCHAR || ',' || s[4*b.b + 4]::VARCHAR AS key
                FROM sig, (SELECT unnest(range(0, 16)) AS b) b),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
               FROM bands a JOIN bands c
                 ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id),
      est AS (SELECT id_a, id_b,
                     len(list_filter(range(1, 65), i -> sa.s[i] = sb.s[i]))::DOUBLE / 64.0 AS est
              FROM cand
              JOIN sig sa ON sa.doc_id = cand.id_a
              JOIN sig sb ON sb.doc_id = cand.id_b)"""

  private val meanLenCte = s"""
    SELECT doc_id, text,
      CASE WHEN len($docToks) = 0 THEN 0.0
           ELSE list_sum(list_transform($docToks, x -> length(x)))::DOUBLE / len($docToks)
      END AS ml
    FROM documents"""

  // language-ID subquery (doc_id, pred) shared by t04 and the t15 funnel
  private val langIdCte = s"""
    WITH c AS (
      SELECT doc_id,
        len(list_filter(list_transform($docToks, x -> lower(x)),
            x -> x IN ('the','and','of','to','is','in','that','it'))) AS en,
        len(list_filter(list_transform($docToks, x -> lower(x)),
            x -> x IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
        len(list_filter(list_transform($docToks, x -> lower(x)),
            x -> x IN ('le','la','les','et','est','un','une','dans'))) AS fr,
        len(list_filter(list_transform($docToks, x -> lower(x)),
            x -> x IN ('el','los','las','es','un','una','que','por'))) AS es,
        len(list_filter(list_transform($docToks, x -> lower(x)),
            x -> x IN ('的','是','在','了','和','有','我','不'))) AS zh
      FROM documents)
    SELECT doc_id,
      CASE
        WHEN en > 0 AND en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
        WHEN de > 0 AND de > en AND de >= fr AND de >= es AND de >= zh THEN 'de'
        WHEN fr > 0 AND fr > en AND fr > de AND fr >= es AND fr >= zh THEN 'fr'
        WHEN es > 0 AND es > en AND es > de AND es > fr AND es >= zh THEN 'es'
        WHEN zh > 0 AND zh > en AND zh > de AND zh > fr AND zh > es THEN 'zh'
        ELSE 'und'
      END AS pred
    FROM c"""

  val all: Map[String, String] = Map(

    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 1) AS sum_qty,
             round(sum(l_extendedprice), 1) AS sum_base,
             round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS sum_disc,
             round(avg(l_quantity), 4) AS avg_qty,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_revenue_by_nation" -> """
      SELECT n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS revenue,
             count(DISTINCT o_orderkey) AS n_orders
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "q03_top_orders" -> """
      SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS revenue
      FROM lineitem
      GROUP BY l_orderkey
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10""",

    "q04_window_rank" -> """
      SELECT c_nationkey::BIGINT AS nationkey, c_custkey, c_acctbal, rnk::BIGINT AS rnk
      FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
            FROM customer) s
      WHERE rnk <= 3
      ORDER BY nationkey, rnk""",

    "q05_exists" -> """
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q06_filter_agg" -> """
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q07_events_hourly" -> """
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_epoch, event_type""",

    "q08_rollup" -> """
      SELECT coalesce(o_orderpriority, 'ALL') AS priority,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n, round(sum(o_totalprice), 1) AS total
      FROM orders
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY priority, status""",

    "q09_correlated_subquery" -> """
      SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS price
      FROM lineitem l1
      WHERE l_quantity > (SELECT avg(l_quantity) * 1.5 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey)
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q10_salted_join" -> """
      SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 1) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    // same gap-sessionization semantics, expressed with window functions
    // (lag + running sum of break flags); 24h gap in nanoseconds
    "q15_event_funnel" -> """
      WITH v AS (SELECT user_id, min(ts) AS tv FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > v.tv
              AND e.ts < v.tv + INTERVAL 24 HOUR GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > c.tc
              AND e.ts < c.tc + INTERVAL 24 HOUR GROUP BY e.user_id)
      SELECT stage, users FROM (
        SELECT 'view' AS stage, count(*)::BIGINT AS users FROM v
        UNION ALL SELECT 'view_click', count(*)::BIGINT FROM c
        UNION ALL SELECT 'view_click_purchase', count(*)::BIGINT FROM p)
      ORDER BY stage""",

    "q16_band_join" -> """
      SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
             round(p.value - v.value, 2) AS diff
      FROM events p JOIN events v ON p.user_id = v.user_id
      WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        AND abs(p.value - v.value) <= 5.0
      ORDER BY purchase_id, view_id""",

    // trajectory mirror: identical position synthesis, lag window, and
    // the g83-style haversine expression structure
    "q17_trajectory" -> s"""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns,
                   ((event_id * 7919) % 3600) / 10.0 - 180.0 AS lon,
                   ((event_id * 104729) % 1600) / 10.0 - 80.0 AS lat
                 FROM events),
      l AS (SELECT user_id, lon, lat,
              lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
      st AS (SELECT user_id,
               CASE WHEN plon IS NULL THEN 0.0
                    ELSE 2.0 * 6371008.8 * asin(least(1.0, sqrt(
                      sin((radians(lat) - radians(plat)) / 2)
                        * sin((radians(lat) - radians(plat)) / 2)
                      + cos(radians(plat)) * cos(radians(lat))
                        * sin(radians(lon - plon) / 2)
                        * sin(radians(lon - plon) / 2))))
               END AS step_m
             FROM l)
      SELECT user_id, count(*)::BIGINT AS n_pings,
             round(sum(step_m) / 1000.0, 2) AS total_km,
             round(max(step_m) / 1000.0, 3) AS max_leg_km
      FROM st GROUP BY user_id ORDER BY user_id""",

    "q11_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns, value FROM events),
      b AS (SELECT user_id, event_id, tns, value,
              CASE WHEN lag(tns) OVER w IS NULL
                     OR tns - lag(tns) OVER w > 86400000000000
                   THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
      s AS (SELECT user_id, tns, value,
              sum(brk) OVER (PARTITION BY user_id ORDER BY tns, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM b)
      SELECT user_id, session_seq::BIGINT AS session_seq,
             count(*) AS n_events,
             (min(tns) // 1000000000)::BIGINT AS start_sec,
             ((max(tns) - min(tns)) // 1000000000)::BIGINT AS duration_sec,
             round(sum(value), 2) AS sum_value
      FROM s GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq""",

    // as-of semantics in plain SQL: max strictly-earlier view timestamp,
    // greatest event_id on exact-timestamp ties (matching the Spark
    // window order ts, side, tie), value read from that resolved row
    "q12_asof_join" -> """
      WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS tns
                 FROM events WHERE event_type = 'purchase'),
      v AS (SELECT event_id, user_id, epoch_ns(ts) AS tns, value
            FROM events WHERE event_type = 'view'),
      m AS (SELECT p.purchase_id, max(v.tns) AS vtns
            FROM p JOIN v ON v.user_id = p.user_id AND v.tns < p.tns
            GROUP BY p.purchase_id),
      mv AS (SELECT p.purchase_id, m.vtns, max(v.event_id) AS view_id
             FROM m JOIN p ON p.purchase_id = m.purchase_id
             JOIN v ON v.user_id = p.user_id AND v.tns = m.vtns
             GROUP BY p.purchase_id, m.vtns)
      SELECT p.purchase_id, p.user_id, mv.view_id,
             ((p.tns - mv.vtns) // 1000000000)::BIGINT AS gap_sec,
             round(v.value, 2) AS view_value
      FROM p
      LEFT JOIN mv ON mv.purchase_id = p.purchase_id
      LEFT JOIN v ON v.event_id = mv.view_id AND v.user_id = p.user_id
      ORDER BY p.purchase_id""",

    "q13_json_props" -> """
      SELECT event_type, count(*) AS n,
             round(avg(k), 4) AS avg_k, min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
              json_extract_string(props, '$.k')::BIGINT AS k FROM events)
      GROUP BY event_type
      ORDER BY event_type""",

    "q14_bucketed_join" -> """
      SELECT o_orderpriority, count(*)::BIGINT AS n_items,
             round(sum(l_extendedprice), 1) AS rev
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "g01_bbox_filter" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    "g02_distance" -> s"""
      SELECT c_custkey, round(dist, 4) AS dist
      FROM (SELECT c_custkey, sqrt((cx - 5000.0)*(cx - 5000.0) + (cy - 500.0)*(cy - 500.0)) AS dist
            FROM ($custPts))
      WHERE dist < 1500.0
      ORDER BY c_custkey""",

    "g03_sjoin_pip" -> s"""
      SELECT c_custkey, r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) CROSS JOIN region
      WHERE $pipCond
      ORDER BY c_custkey, r_regionkey""",

    "g75_sql_spatial_join" -> s"""
      SELECT c_custkey, r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) CROSS JOIN region
      WHERE $pipCond
      ORDER BY c_custkey, r_regionkey""",

    "g72_sjoin_on_attribute" -> s"""
      SELECT c_custkey, r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) CROSS JOIN region
      WHERE $pipCond AND (c_nationkey % 5) = r_regionkey
      ORDER BY c_custkey, r_regionkey""",

    "g15_sjoin_grid" -> s"""
      SELECT c_custkey, r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) CROSS JOIN region
      WHERE $pipCond
      ORDER BY c_custkey, r_regionkey""",

    "g48_sjoin_left" -> s"""
      SELECT p.c_custkey, r.r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) p LEFT JOIN region r ON $pipCond
      ORDER BY c_custkey, r_regionkey""",

    "g87_sjoin_left_grid" -> s"""
      SELECT p.c_custkey, r.r_regionkey::BIGINT AS r_regionkey
      FROM ($custPts) p LEFT JOIN region r ON $pipCond
      ORDER BY c_custkey, r_regionkey""",

    "g04_dissolve" -> s"""
      SELECT c_nationkey::BIGINT AS nationkey,
             count(DISTINCT (cx, cy))::BIGINT AS n_points,
             min(cx) AS xmin, min(cy) AS ymin, max(cx) AS xmax, max(cy) AS ymax,
             count(*) AS n_rows
      FROM ($custPts)
      GROUP BY c_nationkey
      ORDER BY nationkey""",

    "g05_total_bounds" -> s"""
      SELECT min(cx) AS xmin, min(cy) AS ymin, max(cx) AS xmax, max(cy) AS ymax
      FROM ($custPts)""",

    "g06_area_centroid" -> """
      SELECT s_suppkey,
             round(abs((ax*ay2 - bx*ay) + (bx*cy2 - ax*ay2) + (ax*ay - ax*cy2)) / 2.0, 4) AS area,
             round((ax + bx + ax) / 3.0, 4) AS centroid_x,
             round((ay + ay2 + cy2) / 3.0, 4) AS centroid_y,
             round((bx - ax) + sqrt((ax-bx)*(ax-bx) + (cy2-ay2)*(cy2-ay2)) + (cy2 - ay), 4) AS perimeter
      FROM (SELECT s_suppkey, s_acctbal AS ax,
                   (s_suppkey % 100)::DOUBLE * 10.0 AS ay,
                   (s_suppkey % 100)::DOUBLE * 10.0 AS ay2,
                   s_acctbal + ((s_suppkey % 7) + 1)::DOUBLE * 100.0 AS bx,
                   (s_suppkey % 100)::DOUBLE * 10.0 + ((s_suppkey % 5) + 1)::DOUBLE * 100.0 AS cy2
            FROM supplier)
      ORDER BY s_suppkey""",

    "g07_wkt_roundtrip" -> """
      SELECT c_custkey, c_acctbal AS x, (c_custkey % 1000)::DOUBLE AS y
      FROM customer ORDER BY c_custkey""",

    "g08_morton" -> s"""
      WITH p AS (SELECT c_custkey, $quantX AS qx, $quantY AS qy FROM ($custPts))
      SELECT c_custkey, (${spread("qx")} | (${spread("qy")} << 1)) AS morton
      FROM p ORDER BY c_custkey""",

    "g09_hilbert" -> s"""
      WITH RECURSIVE p AS (SELECT c_custkey, $quantX AS x0, $quantY AS y0 FROM ($custPts)),
      h AS (
        SELECT c_custkey, x0 AS x, y0 AS y, 0::BIGINT AS d, 32768::BIGINT AS s FROM p
        UNION ALL
        SELECT c_custkey,
          CASE WHEN (y & s) > 0 THEN x WHEN (x & s) > 0 THEN 65535 - y ELSE y END,
          CASE WHEN (y & s) > 0 THEN y WHEN (x & s) > 0 THEN 65535 - x ELSE x END,
          d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                          CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
          s // 2
        FROM h WHERE s > 0)
      SELECT c_custkey, d AS hilbert FROM h WHERE s = 0 ORDER BY c_custkey""",

    "g11_clip" -> """
      SELECT s_suppkey,
             round(greatest(0.0, least(x0 + h, 5000.0) - greatest(x0 - h, 0.0))
                 * greatest(0.0, least(y0 + h, 500.0) - greatest(y0 - h, 0.0)), 4) AS clipped_area
      FROM (SELECT s_suppkey, s_acctbal AS x0,
                   (s_suppkey % 100)::DOUBLE * 10.0 AS y0,
                   ((s_suppkey % 10) + 1)::DOUBLE AS h
            FROM supplier)
      ORDER BY s_suppkey""",

    "g12_explode" -> s"""
      SELECT c_custkey, part_index, px, py FROM (
        SELECT c_custkey, 0::BIGINT AS part_index, cx AS px, cy AS py FROM ($custPts) WHERE c_custkey < 100
        UNION ALL
        SELECT c_custkey, 1::BIGINT, cy, cx FROM ($custPts) WHERE c_custkey < 100)
      ORDER BY c_custkey, part_index""",

    "g13_buffer" -> """
      SELECT s_suppkey, round(32.0 * r * r * sin(pi() / 32.0), 4) AS buf_area
      FROM (SELECT s_suppkey, ((s_suppkey % 5) + 1)::DOUBLE AS r FROM supplier)
      ORDER BY s_suppkey""",

    "g14_affine" -> s"""
      SELECT c_custkey,
             round(2.0 * ((cos(radians(90.0)) * cx - sin(radians(90.0)) * cy) + 10.0), 6) AS fx,
             round(3.0 * ((sin(radians(90.0)) * cx + cos(radians(90.0)) * cy) + 20.0), 6) AS fy
      FROM ($custPts)
      ORDER BY c_custkey""",

    "g16_predicates" -> s"""
      WITH sq AS ($sqPairs),
      m AS (SELECT *, least(ax1, bx1) - greatest(ax0, bx0) AS xi,
                      least(ay1, by1) - greatest(ay0, by0) AS yi FROM sq)
      SELECT s_suppkey,
        (xi >= 0 AND yi >= 0) AS p_intersects,
        NOT (xi >= 0 AND yi >= 0) AS p_disjoint,
        (bx0 >= ax0 AND bx1 <= ax1 AND by0 >= ay0 AND by1 <= ay1) AS p_contains,
        (ax0 >= bx0 AND ax1 <= bx1 AND ay0 >= by0 AND ay1 <= by1) AS p_within,
        (bx0 >= ax0 AND bx1 <= ax1 AND by0 >= ay0 AND by1 <= ay1) AS p_covers,
        (ax0 >= bx0 AND ax1 <= bx1 AND ay0 >= by0 AND ay1 <= by1) AS p_coveredby,
        (bx0 > ax0 AND bx1 < ax1 AND by0 > ay0 AND by1 < ay1) AS p_containsproperly,
        (xi >= 0 AND yi >= 0 AND (xi = 0 OR yi = 0)) AS p_touches,
        (xi > 0 AND yi > 0
          AND NOT (bx0 >= ax0 AND bx1 <= ax1 AND by0 >= ay0 AND by1 <= ay1)
          AND NOT (ax0 >= bx0 AND ax1 <= bx1 AND ay0 >= by0 AND ay1 <= by1)) AS p_overlaps,
        (ax0 = bx0 AND ax1 = bx1 AND ay0 = by0 AND ay1 = by1) AS p_equals,
        false AS p_crosses,
        (sqrt(pow(greatest(0.0, greatest(ax0, bx0) - least(ax1, bx1)), 2)
            + pow(greatest(0.0, greatest(ay0, by0) - least(ay1, by1)), 2)) <= 5.0) AS p_dwithin
      FROM m ORDER BY s_suppkey""",

    "g17_overlay" -> s"""
      WITH sq AS ($sqPairs),
      m AS (SELECT *, greatest(0.0, least(ax1, bx1) - greatest(ax0, bx0)) AS xi,
                      greatest(0.0, least(ay1, by1) - greatest(ay0, by0)) AS yi FROM sq)
      SELECT s_suppkey,
        round(xi * yi, 4) AS inter_area,
        round((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - xi * yi, 4) AS union_area,
        round((ax1 - ax0) * (ay1 - ay0) - xi * yi, 4) AS diff_area,
        round((ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - 2 * xi * yi, 4) AS sym_area
      FROM m ORDER BY s_suppkey""",

    "g18_line_measures" -> s"""
      WITH p AS (SELECT c_custkey, abs(cx) + 1.0 AS hx, abs(cy) + 1.0 AS hy FROM ($custPts))
      SELECT c_custkey,
        round(hx + hy, 6) AS len_open,
        round((hx + hy) + sqrt(hx * hx + hy * hy), 6) AS len_closed,
        'LineString' AS gtype, 3::BIGINT AS n_points,
        false AS ring_open, true AS ring_closed,
        true AS simple, true AS valid, false AS empty, false AS hasz,
        2::BIGINT AS bnd_open_n, 0::BIGINT AS bnd_closed_n
      FROM p ORDER BY c_custkey""",

    "g19_wkb_roundtrip" -> s"""
      SELECT c_custkey, cx AS x, cy AS y, 42::BIGINT AS hexlen,
        ((c_custkey % 5) <= 2) AS p_eqexact
      FROM ($custPts) ORDER BY c_custkey""",

    "g20_simplify" -> """
      WITH p AS (SELECT s_suppkey, (s_suppkey % 11)::DOUBLE * 0.1 AS e FROM supplier)
      SELECT s_suppkey,
        (CASE WHEN e > 0.5 THEN 3 ELSE 2 END)::BIGINT AS n_after,
        CASE WHEN e > 0.5 THEN round(sqrt(4.0 + e * e) * 2, 6) ELSE 4.0 END AS len_after
      FROM p ORDER BY s_suppkey""",

    "g21_interpolate" -> s"""
      WITH p AS (SELECT c_custkey, abs(cx) + 1.0 AS hx, abs(cy) + 1.0 AS hy,
                        (c_custkey % 10)::DOUBLE / 10.0 AS f FROM ($custPts))
      SELECT c_custkey,
        round(f * hx, 6) AS ix, round(f * hy, 6) AS iy,
        round((hx * hx) / (hx * hx + hy * hy) * sqrt(hx * hx + hy * hy), 6) AS along
      FROM p ORDER BY c_custkey""",

    "g22_to_crs" -> s"""
      WITH p AS (SELECT c_custkey, cx / 100.0 AS lon, cy / 20.0 - 25.0 AS lat FROM ($custPts))
      SELECT c_custkey,
        round(radians(lon) * 6378137.0, 4) + 0.0 AS mx,
        round(ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137.0, 4) + 0.0 AS my,
        round(degrees((radians(lon) * 6378137.0) / 6378137.0), 6) + 0.0 AS lon2,
        round(degrees(2 * atan(exp((ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137.0) / 6378137.0))
              - pi() / 2), 6) + 0.0 AS lat2
      FROM p ORDER BY c_custkey""",

    "g23_geoparquet_roundtrip" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    // native-encoded roundtrip: struct<x,y> coordinates are exact doubles,
    // so the cx window selects identically to the plain coordinate filter
    "g69_geoarrow_parquet" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    "g41_covering_roundtrip" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    "g24_spatial_shuffle" -> """
      SELECT count(*)::BIGINT AS total_rows, true AS ranges_ok FROM customer""",

    "g25_union_all" -> """
      SELECT s_nationkey::BIGINT AS nationkey,
             round((count(*) * 400)::DOUBLE, 4) AS union_area,
             count(*) AS n_parts, count(*) AS n_rows,
             round(sum(s_acctbal), 2) AS sum_bal,
             round(min(s_acctbal), 2) AS min_bal
      FROM supplier GROUP BY s_nationkey ORDER BY nationkey""",

    "g26_envelope" -> """
      WITH tr AS (SELECT s_suppkey, s_acctbal AS ax,
                         (s_suppkey % 100)::DOUBLE * 10.0 AS ay,
                         s_acctbal + ((s_suppkey % 7) + 1)::DOUBLE * 100.0 AS bx,
                         (s_suppkey % 100)::DOUBLE * 10.0
                           + ((s_suppkey % 5) + 1)::DOUBLE * 100.0 AS cy2
                  FROM supplier)
      SELECT s_suppkey,
        round((bx - ax) * (cy2 - ay), 4) AS env_area,
        round(2 * ((bx - ax) + (cy2 - ay)), 4) AS env_perim,
        round(2 * ((bx - ax) + (cy2 - ay)), 4) AS bnd_len,
        5::BIGINT AS ext_pts, 'LineString' AS bnd_type,
        round((ax + bx + ax) / 3.0, 4) AS pos_x,
        round((ay + ay + cy2) / 3.0, 4) AS pos_y
      FROM tr ORDER BY s_suppkey""",

    "g27_relate" -> s"""
      WITH j AS (
        SELECT c_custkey, r_regionkey,
          ((2200.0*r_regionkey+1000.0) - (2200.0*r_regionkey-1000.0)) * (cy - 50.0)
            - (50.0 - 50.0) * (cx - (2200.0*r_regionkey-1000.0)) AS c1,
          (2200.0*r_regionkey - (2200.0*r_regionkey+1000.0)) * (cy - 50.0)
            - (950.0 - 50.0) * (cx - (2200.0*r_regionkey+1000.0)) AS c2,
          ((2200.0*r_regionkey-1000.0) - 2200.0*r_regionkey) * (cy - 950.0)
            - (50.0 - 950.0) * (cx - 2200.0*r_regionkey) AS c3
        FROM ($custPts) CROSS JOIN region)
      SELECT c_custkey, r_regionkey::BIGINT AS r_regionkey,
        CASE WHEN c1 > 0 AND c2 > 0 AND c3 > 0 THEN '0FFFFF212' ELSE 'FF0FFF212' END AS pattern,
        '0FFFFFFF2' AS self_pattern,
        (c1 > 0 AND c2 > 0 AND c3 > 0) AS pat_within,
        NOT (c1 > 0 AND c2 > 0 AND c3 > 0) AS pat_disjoint
      FROM j WHERE c1 <> 0 AND c2 <> 0 AND c3 <> 0
      ORDER BY c_custkey, r_regionkey""",

    // the MVT roundtrip oracle predicts the decoded pyramid from the tile
    // math alone: encode -> task commit -> distributed decode must agree
    // with pure arithmetic on (tile, count, min/max id)
    "m08_mvt_roundtrip" -> s"""
      WITH p AS (SELECT c_custkey, c_acctbal / 100.0 AS lon,
                        (c_custkey % 1000) / 20.0 - 25.0 AS lat
                 FROM customer),
      t AS (SELECT c_custkey,
              CAST(least(31, greatest(0,
                floor((lon + 180.0) / 360.0 * 32.0))) AS INT) AS tile_x,
              CAST(least(31, greatest(0, floor((1.0 -
                ln(tan(radians(least(85.05112878, greatest(-85.05112878, lat))))
                   + 1.0 / cos(radians(least(85.05112878,
                       greatest(-85.05112878, lat))))) / pi()) / 2.0 * 32.0)))
                AS INT) AS tile_y
            FROM p)
      SELECT tile_x, tile_y, count(*)::BIGINT AS n_features,
             min(c_custkey)::BIGINT AS min_id, max(c_custkey)::BIGINT AS max_id
      FROM t GROUP BY tile_x, tile_y ORDER BY tile_x, tile_y""",

    // way lengths predicted from the synthesis arithmetic: ref order ==
    // custkey order per nation, planar segment sum
    "g95_osm_ways" -> s"""
      WITH p AS (SELECT c_custkey, c_nationkey::BIGINT AS nk,
                   round(c_acctbal / 100.0, 7) AS lon,
                   round((c_custkey % 1000) / 20.0 - 25.0, 7) AS lat
                 FROM customer),
      l AS (SELECT nk, lon, lat,
              lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
            FROM p WINDOW w AS (PARTITION BY nk ORDER BY c_custkey))
      SELECT nk AS osm_id,
             round(sum(CASE WHEN plon IS NULL THEN 0.0
                       ELSE sqrt((lon - plon) * (lon - plon)
                              + (lat - plat) * (lat - plat)) END), 6)
               AS length_deg
      FROM l GROUP BY nk ORDER BY osm_id""",

    // the OSM roundtrip oracle predicts the decoded node table from the
    // synthesis arithmetic alone (the codec must be value-transparent)
    "g94_osm_pbf" -> s"""
      SELECT c_custkey AS osm_id,
             round(c_acctbal / 100.0, 7) AS lon,
             round((c_custkey % 1000) / 20.0 - 25.0, 7) AS lat,
             c_mktsegment AS segment
      FROM customer ORDER BY osm_id""",

    // axial hex binning mirror: same inverse basis, same cube rounding
    // with floor(v+0.5) (chosen over round() because engines disagree on
    // negative halves)
    "g93_hexbin" -> s"""
      WITH p AS (SELECT c_acctbal, c_acctbal / 100.0 AS hx,
                        (c_custkey % 1000) / 20.0 - 25.0 AS hy
                 FROM customer),
      f AS (SELECT c_acctbal,
              (sqrt(3.0) / 3.0 * hx - hy / 3.0) / 2.5 AS fq,
              (2.0 / 3.0 * hy) / 2.5 AS fr
            FROM p),
      r0 AS (SELECT c_acctbal, fq, fr, -fq - fr AS fs,
               floor(fq + 0.5) AS rq, floor(fr + 0.5) AS rr,
               floor(-fq - fr + 0.5) AS rs
             FROM f),
      fx AS (SELECT c_acctbal,
               CASE WHEN abs(rq - fq) > abs(rr - fr)
                     AND abs(rq - fq) > abs(rs - fs)
                    THEN -rr - rs ELSE rq END AS q1,
               CASE WHEN NOT (abs(rq - fq) > abs(rr - fr)
                              AND abs(rq - fq) > abs(rs - fs))
                         AND abs(rr - fr) > abs(rs - fs)
                    THEN -rq - rs ELSE rr END AS r1
             FROM r0)
      SELECT CAST(q1 AS BIGINT) AS hq, CAST(r1 AS BIGINT) AS hr,
             count(*)::BIGINT AS n_pts,
             round((sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0)
               / count(*), 4) AS avg_bal,
             round(2.5 * sqrt(3.0) * (q1 + r1 / 2.0), 6) AS center_x,
             round(2.5 * 1.5 * r1, 6) AS center_y
      FROM fx GROUP BY q1, r1 ORDER BY hq, hr""",

    // term-by-term slippy-map tile math mirror (OSM wiki formulas); the
    // quadkey digits come from the same bit arithmetic as the kernel
    "g92_tiles" -> s"""
      WITH p AS (SELECT c_custkey, c_acctbal / 100.0 AS lon,
                        (c_custkey % 1000) / 20.0 - 25.0 AS lat
                 FROM customer),
      t AS (SELECT c_custkey, lon, lat,
              CAST(least(255, greatest(0,
                floor((lon + 180.0) / 360.0 * 256.0))) AS INT) AS tile_x,
              CAST(least(255, greatest(0, floor((1.0 -
                ln(tan(radians(least(85.05112878, greatest(-85.05112878, lat))))
                   + 1.0 / cos(radians(least(85.05112878,
                       greatest(-85.05112878, lat))))) / pi()) / 2.0 * 256.0)))
                AS INT) AS tile_y
            FROM p),
      e AS (SELECT *,
              tile_x / 256.0 * 360.0 - 180.0 AS lon_min_r,
              (tile_x + 1) / 256.0 * 360.0 - 180.0 AS lon_max_r,
              degrees(atan((exp(pi() * (1.0 - 2.0 * (tile_y + 1) / 256.0))
                - exp(-(pi() * (1.0 - 2.0 * (tile_y + 1) / 256.0)))) / 2.0))
                AS lat_min_r,
              degrees(atan((exp(pi() * (1.0 - 2.0 * tile_y / 256.0))
                - exp(-(pi() * (1.0 - 2.0 * tile_y / 256.0)))) / 2.0))
                AS lat_max_r
            FROM t)
      SELECT c_custkey, tile_x, tile_y,
             array_to_string(list_transform(range(1, 9), i ->
               CAST(((tile_x >> (8 - i)) & 1)
                 + 2 * ((tile_y >> (8 - i)) & 1) AS VARCHAR)), '') AS quadkey,
             round(lon_min_r, 6) AS lon_min, round(lat_min_r, 6) AS lat_min,
             round(lon_max_r, 6) AS lon_max, round(lat_max_r, 6) AS lat_max,
             (lon >= lon_min_r AND lon <= lon_max_r AND
              lat >= lat_min_r AND lat <= lat_max_r) AS in_tile
      FROM e ORDER BY c_custkey""",

    "g10_geohash" -> s"""
      WITH p AS (SELECT c_custkey,
        LEAST(32767, GREATEST(0,
          CAST(floor(((cx / 100.0) + 180.0) / 360.0 * 32768) AS BIGINT))) AS qlon,
        LEAST(32767, GREATEST(0,
          CAST(floor(((cy / 20.0 - 25.0) + 90.0) / 180.0 * 32768) AS BIGINT))) AS qlat
        FROM ($custPts)),
      c AS (SELECT c_custkey,
        ((${spread("qlon")}) << 1 | (${spread("qlat")})) AS code FROM p)
      SELECT c_custkey,
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + ((code >> 25) & 31))::INT, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + ((code >> 20) & 31))::INT, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + ((code >> 15) & 31))::INT, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + ((code >> 10) & 31))::INT, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + ((code >> 5) & 31))::INT, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (1 + (code & 31))::INT, 1) AS geohash,
        code AS geohash_long
      FROM c ORDER BY c_custkey""",

    "t12_repetition" -> s"""
      WITH toks AS (SELECT doc_id, $docToks AS tk FROM documents),
      tc AS (SELECT doc_id, max(c)::BIGINT AS top_count FROM (
               SELECT doc_id, t, count(*) AS c
               FROM (SELECT doc_id, unnest(tk) AS t FROM toks)
               GROUP BY doc_id, t)
             GROUP BY doc_id),
      bi AS (SELECT doc_id,
               CASE WHEN len(tk) >= 2
                 THEN list_transform(generate_series(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i + 1])
                 ELSE [] END AS bg
             FROM toks)
      SELECT toks.doc_id,
             len(toks.tk)::BIGINT AS n_tokens,
             len(list_distinct(toks.tk))::BIGINT AS n_distinct,
             coalesce(tc.top_count, 0)::BIGINT AS top_count,
             len(bi.bg)::BIGINT AS n_bigrams,
             len(list_distinct(bi.bg))::BIGINT AS n_distinct_bigrams
      FROM toks
      LEFT JOIN tc ON tc.doc_id = toks.doc_id
      JOIN bi ON bi.doc_id = toks.doc_id
      ORDER BY toks.doc_id""",

    "t13_contamination" -> """
      WITH sh AS (
        SELECT DISTINCT doc_id, substr(text, i::INT, 20) AS g
        FROM documents, LATERAL unnest(range(1, length(text) - 18)) AS t(i)),
      ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 0)
      SELECT doc_id, count(*)::BIGINT AS n_shared
      FROM sh JOIN ev USING (g)
      WHERE doc_id % 100 <> 0
      GROUP BY doc_id
      ORDER BY doc_id""",

    "t16_source_cap" -> s"""
      WITH ml AS (SELECT doc_id, ml FROM ($meanLenCte)),
      q AS (SELECT d.doc_id, d.source, round($qualityExpr, 4) AS q
            FROM documents d JOIN ml ON ml.doc_id = d.doc_id),
      r AS (SELECT source, doc_id, q,
              row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
                AS rnk
            FROM q)
      SELECT source, rnk::BIGINT AS rnk, doc_id, q
      FROM r WHERE rnk <= 10
      ORDER BY source, rnk""",

    "t17_stratified_sample" -> s"""
      WITH b AS (
        SELECT doc_id, text, lang,
               ('0x' || substr(md5(text), 1, 16))::UBIGINT % 100 AS bucket
        FROM documents),
      k AS (SELECT lang, text,
              CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 25 ELSE 75 END)
                   THEN 1 ELSE 0 END AS kept
            FROM b)
      SELECT lang, count(*) AS n_docs,
             sum(kept)::BIGINT AS n_kept,
             sum(CASE WHEN kept = 1
                 THEN len($docToks) ELSE 0 END)::BIGINT AS kept_tokens
      FROM k GROUP BY lang ORDER BY lang""",

    "t18_chunking" -> """
      WITH starts AS (
        SELECT doc_id, text,
               unnest(range(0, greatest(length(text), 1), 150)) AS start0
        FROM documents),
      c AS (
        SELECT doc_id, start0, substr(text, start0 + 1, 200) AS chunk
        FROM starts)
      SELECT doc_id, (start0 // 150)::BIGINT AS chunk_id,
             length(chunk)::BIGINT AS chunk_len,
             substr(md5(chunk), 1, 8) AS chunk_hash
      FROM c ORDER BY doc_id, chunk_id""",

    "t25_bow_dedup" -> """
      WITH n AS (SELECT doc_id,
               md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bow_hash
             FROM documents)
      SELECT doc_id, substr(bow_hash, 1, 8) AS bow_key,
             min(doc_id) OVER (PARTITION BY bow_hash) AS canonical_id,
             count(*) OVER (PARTITION BY bow_hash)::BIGINT AS group_size
      FROM n ORDER BY doc_id""",

    "t26_domain_mix" -> """
      WITH c AS (SELECT source, count(*)::BIGINT AS n_docs,
               ((substr(source, 4, 10)::INT % 3) + 1)::DOUBLE AS w
             FROM documents GROUP BY source),
      m AS (SELECT min(n_docs / w) AS m FROM c),
      k AS (SELECT source, n_docs, floor(w * m)::BIGINT AS n_keep FROM c, m),
      b AS (SELECT d.source,
              ('0x' || substr(md5(d.text), 1, 16))::UBIGINT % 1000000 AS bucket,
              k.n_docs, k.n_keep
            FROM documents d JOIN k ON d.source = k.source)
      SELECT source, max(n_docs) AS n_docs, max(n_keep) AS n_keep,
             sum(CASE WHEN bucket * n_docs < n_keep * 1000000 THEN 1 ELSE 0 END)::BIGINT AS n_kept
      FROM b GROUP BY source ORDER BY source""",

    "t29_boilerplate" -> s"""
      WITH f AS (SELECT doc_id, $docToks AS toks FROM documents
                 WHERE len($docToks) >= 2),
      pos AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
                i -> array_to_string(toks[i + 1:i + 2], ' '))) AS gram
              FROM f),
      dfreq AS (SELECT gram, count(DISTINCT doc_id) AS df FROM pos GROUP BY gram),
      b AS (SELECT gram FROM dfreq
            WHERE df >= greatest(25, ceil(0.005 *
              (SELECT count(DISTINCT doc_id) FROM documents))))
      SELECT p.doc_id, count(*)::BIGINT AS n_positions,
             sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
             round(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 4) AS boiler_ratio
      FROM pos p LEFT JOIN b ON p.gram = b.gram
      GROUP BY p.doc_id ORDER BY p.doc_id""",

    "t31_substring_dedup" -> s"""
      WITH f AS (SELECT doc_id, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, toks FROM f
            WHERE len(toks) >= 8),
      w AS (SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS k
            FROM g, unnest(range(0, len(toks) - 7)) AS u(i)),
      d AS (SELECT k FROM (SELECT k, count(DISTINCT doc_id) AS df
                           FROM w GROUP BY k) WHERE df >= 2),
      p AS (SELECT doc_id, pos FROM w JOIN d USING (k)),
      m AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                     OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                   THEN 1 ELSE 0 END AS newspan
            FROM p),
      sp0 AS (SELECT doc_id, pos,
                sum(newspan) OVER (PARTITION BY doc_id ORDER BY pos) AS span
              FROM m),
      sp AS (SELECT doc_id, span, min(pos) AS s, max(pos) + 8 AS e,
               count(*) AS nw FROM sp0 GROUP BY doc_id, span),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_spans,
                sum(e - s)::BIGINT AS dup_tokens,
                max(nw)::BIGINT AS max_span_windows
              FROM sp GROUP BY doc_id)
      SELECT g.doc_id, g.n_tokens,
             coalesce(a.n_spans, 0)::BIGINT AS n_spans,
             coalesce(a.dup_tokens, 0)::BIGINT AS dup_tokens,
             coalesce(a.max_span_windows, 0)::BIGINT AS max_span_windows,
             round(coalesce(a.dup_tokens, 0)::DOUBLE / g.n_tokens, 4) AS dup_ratio
      FROM g LEFT JOIN agg a USING (doc_id) ORDER BY g.doc_id""",

    // Generic URL canonicalization mirrored rule-for-rule from
    // TextKernel.canonicalUrl: the oracle canonicalizes the RAW string
    // with regexp/list functions (no shortcut through the arithmetic the
    // URLs were synthesized from).
    "t32_url_dedup" -> s"""
      WITH r AS (
        SELECT doc_id,
          (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END)
          || source || '.example.com'
          || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
          || '/docs/' || (doc_id % 50)
          || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
          || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=crawl&page=2&lang=en'
                   ELSE '?lang=en&page=2&fbclid=xyz' END)
          || (CASE WHEN doc_id % 6 = 0 THEN '#section-3' ELSE '' END) AS url
        FROM documents),
      c1 AS (
        SELECT doc_id, url,
          lower(regexp_extract(trim(url), '^([^:/?#]+)://', 1)) AS scheme,
          regexp_replace(regexp_replace(trim(url), '^[^:/?#]+://', ''),
            '#.*$$', '') AS rest
        FROM r),
      c2 AS (
        SELECT doc_id, url, scheme, rest,
          lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
          substr(rest, length(regexp_extract(rest, '^([^/?]*)', 1)) + 1) AS pq
        FROM c1),
      c3 AS (
        SELECT doc_id, url, scheme, pq,
          CASE WHEN scheme = 'http' AND h2 LIKE '%:80'
                 THEN left(h2, length(h2) - 3)
               WHEN scheme = 'https' AND h2 LIKE '%:443'
                 THEN left(h2, length(h2) - 4)
               ELSE h2 END AS host
        FROM (SELECT *, regexp_replace(hostport, '^www\\.', '') AS h2 FROM c2)),
      c4 AS (
        SELECT doc_id, url, scheme, host,
          CASE WHEN instr(pq, '?') > 0
               THEN substr(pq, 1, instr(pq, '?') - 1) ELSE pq END AS path0,
          CASE WHEN instr(pq, '?') > 0
               THEN substr(pq, instr(pq, '?') + 1) ELSE '' END AS qs
        FROM c3),
      c5 AS (
        SELECT doc_id, url, scheme, host, qs,
          CASE WHEN p1 <> '/' AND p1 LIKE '%/'
               THEN left(p1, length(p1) - 1) ELSE p1 END AS path
        FROM (SELECT *, CASE WHEN path0 = '' THEN '/' ELSE path0 END AS p1
              FROM c4)),
      c6 AS (
        SELECT doc_id, url,
          scheme || '://' || host || path ||
          CASE WHEN len(kept) = 0 THEN ''
               ELSE '?' || array_to_string(kept, '&') END AS curl
        FROM (SELECT *, list_sort(list_filter(string_split(qs, '&'),
                p -> p <> '' AND NOT regexp_matches(p,
                  '^(utm_[^=&]*|gclid|fbclid|ref|mc_cid|mc_eid)(=|$$)'))) AS kept
              FROM c5))
      SELECT curl, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_doc,
             count(DISTINCT url)::BIGINT AS n_raw_variants
      FROM c6 GROUP BY curl ORDER BY curl""",

    // cluster-atomic split: near-dup clusters (t10's reach CTE) hash as a
    // unit, singletons hash their own id; cross_split_pairs audits that no
    // near-dup pair straddles the train/val cut (0 by construction)
    "t33_leakage_split" -> s"""
      WITH RECURSIVE $minhashCtes,
      prs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
      e AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION SELECT id_b, id_a FROM prs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             FROM reach GROUP BY a),
      asg AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
      sp AS (SELECT doc_id, cluster_id,
               CASE WHEN ('0x' || substr(md5('cl:' || cluster_id::VARCHAR), 1, 16))::UBIGINT % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
             FROM asg),
      cx AS (SELECT count(*)::BIGINT AS cross_split_pairs
             FROM prs
             JOIN sp a ON prs.id_a = a.doc_id
             JOIN sp b ON prs.id_b = b.doc_id
             WHERE a.split <> b.split)
      SELECT split, count(*)::BIGINT AS n_docs,
             count(DISTINCT cluster_id)::BIGINT AS n_clusters,
             (SELECT cross_split_pairs FROM cx) AS cross_split_pairs
      FROM sp GROUP BY split ORDER BY split""",

    "t34_snapshot_diff" -> """
      WITH prev AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
      cur AS (SELECT doc_id,
                md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END) AS h
              FROM documents WHERE doc_id % 11 <> 0)
      SELECT coalesce(prev.doc_id, cur.doc_id) AS doc_id,
             CASE WHEN prev.doc_id IS NULL THEN 'added'
                  WHEN cur.doc_id IS NULL THEN 'removed'
                  WHEN prev.h IS NOT DISTINCT FROM cur.h THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id
      ORDER BY doc_id""",

    "t35_dup_rate_report" -> """
      WITH d AS (SELECT source, doc_id, md5(text) AS h FROM documents),
      canon AS (SELECT h, min(doc_id) AS keep_id FROM d GROUP BY h)
      SELECT source, count(*)::BIGINT AS n_docs,
             count(DISTINCT d.h)::BIGINT AS n_unique,
             sum(CASE WHEN d.doc_id = canon.keep_id THEN 1 ELSE 0 END)::BIGINT AS n_canonical,
             round(1.0 - count(DISTINCT d.h)::DOUBLE / count(*), 4) AS dup_rate
      FROM d JOIN canon ON d.h = canon.h
      GROUP BY source ORDER BY source""",

    "t36_mixture_expand" -> """
      WITH d AS (
        SELECT doc_id, source,
               (substr(source, 4)::INT % 4 + 1) * 0.75 AS epochs
        FROM documents),
      c AS (
        SELECT doc_id, source, epochs,
               floor(epochs)::INT
               + CASE WHEN ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 16))::UBIGINT % 1000
                           < round((epochs - floor(epochs)) * 1000)::INT
                      THEN 1 ELSE 0 END AS copies
        FROM d),
      x AS (
        SELECT doc_id, source, epochs
        FROM c, LATERAL unnest(range(1, copies + 1)) t(i)
        WHERE copies >= 1)
      SELECT source, epochs::DOUBLE AS epochs,
             count(DISTINCT doc_id)::BIGINT AS n_docs_kept,
             count(*)::BIGINT AS n_rows_out,
             round(count(*)::DOUBLE / count(DISTINCT doc_id), 4) AS realized_epochs
      FROM x GROUP BY source, epochs ORDER BY source""",

    // capacity 64 > the corpus's distinct-token count, so the SpaceSaving
    // sketch is exact and the plain count mirror applies (err = 0)
    // the STREAMING SpaceSaving run is exact in this regime (capacity >
    // per-lang distinct tokens), so the batch exact-count oracle applies
    // verbatim — value-level batch-equivalence for the streaming path
    "t51_stream_heavy_hitters" -> """
      WITH tk AS (
        SELECT lang, unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> x <> '')) AS token
        FROM documents),
      c AS (SELECT lang, token, count(*)::BIGINT AS cnt
            FROM tk GROUP BY lang, token),
      r AS (SELECT lang, token, cnt,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY cnt DESC, token) AS rn
            FROM c)
      SELECT lang, token, cnt, 0::BIGINT AS err
      FROM r WHERE rn <= 10
      ORDER BY lang, cnt DESC, token""",

    // streaming-vs-batch ANN equivalence gate: the Spark side verifies the
    // streaming LSH top-k pair set equals the batch lshTopK pair set and
    // reduces to exact arithmetic (query count from the static side +
    // the equality boolean) — engine-independent constants here
    "t52_stream_ann" -> """
      SELECT count(*)::BIGINT AS n_queries, true AS pairs_match
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 110""",

    "t37_heavy_hitters" -> """
      WITH tk AS (
        SELECT lang, unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 x -> x <> '')) AS token
        FROM documents),
      c AS (SELECT lang, token, count(*)::BIGINT AS cnt
            FROM tk GROUP BY lang, token),
      r AS (SELECT lang, token, cnt,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY cnt DESC, token) AS rn
            FROM c)
      SELECT lang, token, cnt, 0::BIGINT AS err
      FROM r WHERE rn <= 10
      ORDER BY lang, cnt DESC, token""",

    // temperature targets mirrored exactly: weights summed in lang order
    // (list(ORDER BY) pins the IEEE fold), same floor(x+0.5) rounding,
    // same md5 within-group draw
    "t49_temperature_mix" -> """
      WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
      s AS (SELECT lang, n, pow(n::DOUBLE, 0.5) AS sw FROM c),
      tot AS (SELECT list_sum(list(sw ORDER BY lang)) AS tw FROM s),
      tgt AS (SELECT lang,
                     least(n, floor(120 * sw / (SELECT tw FROM tot) + 0.5)::BIGINT) AS k
              FROM s),
      h AS (SELECT lang, doc_id,
              ('0x' || substr(md5('tmp:' || doc_id::VARCHAR), 1, 16))::UBIGINT
                % 1000000000 AS hk
            FROM documents),
      r AS (SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
            FROM h)
      SELECT r.lang AS lang, r.doc_id FROM r JOIN tgt ON r.lang = tgt.lang
      WHERE r.rn <= tgt.k
      ORDER BY r.lang, r.doc_id""",

    // A-ES weighted draw mirrored exactly: same md5-derived u, same
    // -ln(u)/w key rounded to 12 decimals, same id tie-break
    "t48_weighted_sample" -> """
      WITH h AS (
        SELECT lang, doc_id,
               octet_length(encode(text))::DOUBLE + 1.0 AS w,
               ((('0x' || substr(md5('wsmp:' || doc_id::VARCHAR), 1, 16))::UBIGINT
                 % 1000000000)::DOUBLE + 1.0) / 1e9 AS u
        FROM documents),
      x AS (SELECT lang, doc_id, round(-ln(u) / w, 12) AS key FROM h),
      r AS (SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) AS rn
            FROM x)
      SELECT lang, doc_id FROM r WHERE rn <= 15
      ORDER BY lang, doc_id""",

    "t38_group_sample" -> """
      WITH h AS (
        SELECT lang, doc_id,
               ('0x' || substr(md5('smp:' || doc_id::VARCHAR), 1, 16))::UBIGINT % 1000000000 AS hk
        FROM documents),
      r AS (SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
            FROM h)
      SELECT lang, doc_id FROM r WHERE rn <= 20
      ORDER BY lang, doc_id""",

    // interpolated bigram LM: identical token stream, counts, and
    // interpolation arithmetic (1.0 - 0.7 computed, not written as a
    // literal, so both engines hold the same IEEE value); ntile over ce
    // ROUNDED to 4 decimals + doc_id tie-break = deterministic tiers
    "t39_bigram_lm" -> """
      WITH a AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> length(x) > 0) AS a
                 FROM documents),
      uni AS (SELECT w, count(*)::BIGINT AS c_w
              FROM (SELECT unnest(a) AS w FROM a) GROUP BY w),
      tot AS (SELECT sum(c_w)::BIGINT AS c_total FROM uni),
      pr AS (SELECT doc_id, a[i::INT] AS w1, a[i::INT + 1] AS w2
             FROM a, LATERAL unnest(range(1, len(a))) t(i)
             WHERE len(a) >= 2),
      big AS (SELECT w1, w2, count(*)::BIGINT AS c_12 FROM pr GROUP BY w1, w2),
      nll AS (SELECT doc_id,
                -ln(0.7::DOUBLE * c_12::DOUBLE / u1.c_w::DOUBLE
                    + (1.0::DOUBLE - 0.7::DOUBLE) * u2.c_w::DOUBLE / c_total::DOUBLE) AS v
              FROM pr
              JOIN big USING (w1, w2)
              JOIN uni u1 ON u1.w = pr.w1
              JOIN uni u2 ON u2.w = pr.w2, tot),
      sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               round(avg(v), 4) AS ce
             FROM nll GROUP BY doc_id),
      tiered AS (SELECT doc_id, n_bigrams, ce,
                   ntile(3) OVER (ORDER BY ce, doc_id) AS tier
                 FROM sc)
      SELECT doc_id, n_bigrams, ce,
             CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS lm_bucket
      FROM tiered ORDER BY doc_id""",

    // block dedup with rewrite: global first occurrence by min (doc_id,
    // idx) per block hash; new_hash = md5 of the space-joined survivors
    "t40_block_rewrite" -> """
      WITH a AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
                 FROM documents),
      blk AS (SELECT doc_id, j::BIGINT AS idx,
                array_to_string(toks[(j * 20 + 1)::INT : (j * 20 + 20)::INT], ' ') AS blk
              FROM a, LATERAL unnest(range(0, (len(toks) - 1) // 20 + 1)) t(j)
              WHERE len(toks) >= 1),
      h AS (SELECT doc_id, idx, blk, md5(blk) AS hh FROM blk),
      k AS (SELECT doc_id, idx, blk,
              row_number() OVER (PARTITION BY hh ORDER BY doc_id, idx) = 1 AS keep
            FROM h),
      agg AS (SELECT doc_id, count(*)::BIGINT AS n_blocks,
                sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                array_to_string(list(blk ORDER BY idx) FILTER (WHERE keep), ' ')
                  AS new_text
              FROM k GROUP BY doc_id)
      SELECT doc_id, n_blocks, n_kept,
             round((n_blocks - n_kept)::DOUBLE / n_blocks::DOUBLE, 4)
               AS removed_ratio,
             coalesce(new_text, '') AS new_text,
             md5(coalesce(new_text, '')) AS new_hash
      FROM agg ORDER BY doc_id""",

    // hashed linear scorer: same md5 bucket residue, same Knuth-hash
    // weight synthesis, sigmoid(8 * mean weight) rounded to 4 decimals
    "t41_quality_model" -> """
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                 x -> length(x) > 0)) AS w
        FROM documents),
      f AS (SELECT doc_id,
              (('0x' || substr(md5(w), 1, 16))::UBIGINT % 64)::BIGINT AS b
            FROM toks),
      wt AS (SELECT i::BIGINT AS b,
               ((i * 2654435761) % 1000)::DOUBLE / 1000.0::DOUBLE - 0.5::DOUBLE AS wt
             FROM range(0, 64) t(i)),
      sc AS (SELECT doc_id, count(*)::BIGINT AS n_toks, avg(wt.wt) AS raw
             FROM f JOIN wt USING (b) GROUP BY doc_id)
      SELECT doc_id, n_toks,
             round(1.0::DOUBLE / (1.0::DOUBLE + exp(-raw * 8.0::DOUBLE)), 4) AS score,
             CASE WHEN round(1.0::DOUBLE / (1.0::DOUBLE + exp(-raw * 8.0::DOUBLE)), 4) >= 0.5
                  THEN 'keep' ELSE 'drop' END AS label
      FROM sc ORDER BY doc_id""",

    // BM25 (Lucene idf form): same tokenizer, same literal query set,
    // same constant arithmetic (k1+1 etc. computed, not folded by hand);
    // score rounded to 4 decimals + doc_id tie-break = deterministic rank
    "t42_bm25" -> s"""
      WITH base AS (SELECT doc_id, $docToks AS toks FROM documents),
      d AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM base),
      st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
      qt(query_id, w) AS (VALUES
        (1, 'fast'), (1, 'query'),
        (2, 'table'), (2, 'scan'), (2, 'slow'),
        (3, 'hash'), (3, 'join'),
        (4, 'stream'), (4, 'window'),
        (5, 'vector'), (5, 'column'), (5, 'data'),
        (6, 'zz_absent_term')),
      tok AS (SELECT doc_id, dl, unnest(toks) AS w FROM d),
      tf AS (SELECT doc_id, dl, w, count(*)::DOUBLE AS tf
             FROM tok WHERE w IN (SELECT w FROM qt)
             GROUP BY doc_id, dl, w),
      dfq AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w),
      qidf AS (SELECT query_id, qt.w,
                 ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                   AS idf,
                 avgdl
               FROM qt JOIN dfq ON dfq.w = qt.w, st),
      c AS (SELECT query_id, doc_id,
              idf * tf * (1.2::DOUBLE + 1.0::DOUBLE)
                / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                    + 0.75::DOUBLE * dl / avgdl)) AS c
            FROM tf JOIN qidf ON qidf.w = tf.w),
      sc AS (SELECT query_id, doc_id, round(sum(c), 4) AS score
             FROM c GROUP BY query_id, doc_id),
      r AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS rank
            FROM sc)
      SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
             score
      FROM r WHERE rank <= 10 ORDER BY query_id, rank""",

    // streaming session_window: gap-sessionize in the MICROS domain with
    // the >= break that mirrors session_window's exclusive end bound
    "t54_stream_sessionize" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, value FROM events),
      b AS (SELECT user_id, tus, value,
              CASE WHEN lag(tus) OVER w IS NULL
                     OR tus - lag(tus) OVER w >= 86400000000
                   THEN 1 ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      s AS (SELECT user_id, tus, value,
              sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
            FROM b)
      SELECT user_id,
             (min(tus) // 1000000)::BIGINT AS start_sec,
             ((max(tus) - min(tus)) // 1000000)::BIGINT AS duration_sec,
             count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM s GROUP BY user_id, seq
      ORDER BY user_id, start_sec""",

    // hybrid RRF: the t42 BM25 pipeline (3 queries) + the e01 cosine
    // pipeline (same ids), fused as sum(1/(60+rank)). Each (query, doc)
    // has at most TWO terms and IEEE addition of two doubles is
    // order-independent, so round(…,10) + the doc-id tie-break pin the
    // fused ranking on both engines.
    "t53_hybrid_rrf" -> s"""
      WITH base AS (SELECT doc_id, $docToks AS toks FROM documents),
      d AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM base),
      st AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM d),
      qt(query_id, w) AS (VALUES
        (1, 'fast'), (1, 'query'),
        (2, 'hash'), (2, 'join'),
        (3, 'stream'), (3, 'window')),
      tok AS (SELECT doc_id, dl, unnest(toks) AS w FROM d),
      tf AS (SELECT doc_id, dl, w, count(*)::DOUBLE AS tf
             FROM tok WHERE w IN (SELECT w FROM qt)
             GROUP BY doc_id, dl, w),
      dfq AS (SELECT w, count(*)::DOUBLE AS df FROM tf GROUP BY w),
      qidf AS (SELECT query_id, qt.w,
                 ln(1.0::DOUBLE + (n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE))
                   AS idf,
                 avgdl
               FROM qt JOIN dfq ON dfq.w = qt.w, st),
      cb AS (SELECT query_id, doc_id,
              idf * tf * (1.2::DOUBLE + 1.0::DOUBLE)
                / (tf + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
                    + 0.75::DOUBLE * dl / avgdl)) AS c
            FROM tf JOIN qidf ON qidf.w = tf.w),
      sc AS (SELECT query_id, doc_id, round(sum(c), 4) AS score
             FROM cb GROUP BY query_id, doc_id),
      lex AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, doc_id) AS rank
              FROM sc),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      cs AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                   round(CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN 0.0
                         ELSE list_dot_product(q.v, c.v) / (q.nrm * c.nrm) END, 4) AS cosine
            FROM nn q CROSS JOIN nn c
            WHERE q.vec_id IN (1, 2, 3) AND q.vec_id <> c.vec_id),
      den AS (SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, doc_id ASC) AS rank
              FROM cs),
      u AS (SELECT query_id, doc_id, rank FROM lex WHERE rank <= 10
            UNION ALL
            SELECT query_id, doc_id, rank FROM den WHERE rank <= 10),
      f AS (SELECT query_id, doc_id,
              round(sum(1.0::DOUBLE / (60.0::DOUBLE + rank)), 10) AS score
            FROM u GROUP BY query_id, doc_id),
      fr AS (SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rank
             FROM f)
      SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
             doc_id::BIGINT AS doc_id, score
      FROM fr WHERE rank <= 10 ORDER BY query_id, rank""",

    // Gopher rules: same tokenizer, same counters, same guarded ratio
    // arithmetic; booleans compare directly
    "t43_gopher_rules" -> s"""
      WITH base AS (SELECT doc_id, text, $docToks AS toks,
                      string_split(text, chr(10)) AS lines
                    FROM documents),
      m AS (SELECT doc_id,
              len(toks)::BIGINT AS n_words,
              len(lines)::BIGINT AS n_lines,
              coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT
                AS sumlen,
              (length(text) - length(replace(text, '#', '')))::BIGINT AS nhash,
              len(regexp_extract_all(text, '\\.\\.\\.'))::BIGINT AS nell,
              len(list_filter(lines, l -> starts_with(ltrim(l), '-')
                OR starts_with(ltrim(l), '*')
                OR starts_with(ltrim(l), '•')))::BIGINT AS nbullet,
              len(list_filter(lines, l -> ends_with(rtrim(l), '...')))::BIGINT
                AS nellend,
              len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))::BIGINT
                AS nalpha,
              ((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(toks, 'data') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(toks, 'value') THEN 1 ELSE 0 END))::BIGINT
                AS nstop
            FROM base),
      r AS (SELECT doc_id, n_words,
              round(CASE WHEN n_words >= 1
                    THEN sumlen::DOUBLE / n_words::DOUBLE ELSE 0.0 END, 4)
                AS mean_word_len,
              round(CASE WHEN n_words >= 1
                    THEN (nhash + nell)::DOUBLE / n_words::DOUBLE ELSE 0.0 END, 4)
                AS symbol_ratio,
              (n_words >= 30 AND n_words <= 100000) AS r_wordcount,
              (n_words >= 1 AND sumlen::DOUBLE / n_words::DOUBLE >= 3.0
                AND sumlen::DOUBLE / n_words::DOUBLE <= 10.0) AS r_wordlen,
              (n_words >= 1
                AND (nhash + nell)::DOUBLE <= 0.1::DOUBLE * n_words::DOUBLE)
                AS r_symbol,
              (nbullet::DOUBLE <= 0.9::DOUBLE * n_lines::DOUBLE) AS r_bullet,
              (nellend::DOUBLE <= 0.3::DOUBLE * n_lines::DOUBLE) AS r_ellipsis,
              (n_words >= 1
                AND nalpha::DOUBLE >= 0.8::DOUBLE * n_words::DOUBLE) AS r_alpha,
              (nstop >= 2) AS r_stop
            FROM m)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, r_wordcount,
             r_wordlen, r_symbol, r_bullet, r_ellipsis, r_alpha, r_stop,
             (r_wordcount AND r_wordlen AND r_symbol AND r_bullet
               AND r_ellipsis AND r_alpha AND r_stop) AS keep
      FROM r ORDER BY doc_id""",

    // PageRank: same md5 link synthesis, same contribution weights, the
    // same left-associated update formula with (1.0 - 0.85) computed so
    // both engines hold the identical IEEE constant; 3 unrolled
    // iterations, rounded to 10 dp
    "q21_unpivot" -> """
      WITH w AS (
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f_qty,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o_qty
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'F' AS l_linestatus, f_qty AS qty FROM w
      UNION ALL
      SELECT l_returnflag, 'O' AS l_linestatus, o_qty AS qty FROM w
      ORDER BY l_returnflag, l_linestatus""",

    "q20_pivot" -> """
      SELECT l_returnflag,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
             round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // LPA unrolled: round 1 labels are the neighbor ids themselves; both
    // argmax picks ordered (count DESC, label ASC) like the min-struct agg
    "t50_label_prop" -> """
      WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      ed AS (SELECT doc_id AS a,
               ((('0x' || substr(md5('lpa:' || doc_id || ':' || j), 1, 16))::UBIGINT
                 % 1000000000)::BIGINT % n) AS b
             FROM documents, nn, (VALUES (0), (1)) t(j)),
      e AS (SELECT a, b FROM ed WHERE a <> b),
      und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      l0 AS (SELECT DISTINCT a AS id FROM und),
      c1 AS (SELECT u.a, u.b AS nl, count(*) AS c FROM und u GROUP BY u.a, u.b),
      r1 AS (SELECT a, nl, row_number() OVER (PARTITION BY a
               ORDER BY c DESC, nl) AS rn FROM c1),
      l1 AS (SELECT a AS id, nl AS lbl FROM r1 WHERE rn = 1),
      c2 AS (SELECT u.a, l1.lbl AS nl, count(*) AS c
             FROM und u JOIN l1 ON u.b = l1.id GROUP BY u.a, l1.lbl),
      r2 AS (SELECT a, nl, row_number() OVER (PARTITION BY a
               ORDER BY c DESC, nl) AS rn FROM c2),
      l2 AS (SELECT a AS id, nl AS lbl FROM r2 WHERE rn = 1)
      SELECT id AS node, lbl AS label FROM l2 ORDER BY node""",

    "t44_pagerank" -> """
      WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
      e AS (SELECT doc_id AS src,
              ((('0x' || substr(md5('lnk:' || doc_id || ':' || j), 1, 16))::UBIGINT
                % 1000000000)::BIGINT % n) AS dst
            FROM documents, nn, (VALUES (0), (1), (2)) t(j)),
      deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
      c AS (SELECT src, dst, 1.0::DOUBLE / deg::DOUBLE AS w
            FROM e JOIN deg USING (src)),
      nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      r0 AS (SELECT id, 1.0::DOUBLE / n::DOUBLE AS r FROM nodes, nn),
      d1 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r0
             WHERE id NOT IN (SELECT src FROM e)),
      i1 AS (SELECT dst, sum(r * w) AS inr FROM c JOIN r0 ON r0.id = c.src
             GROUP BY dst),
      r1 AS (SELECT id, (1.0 - 0.85) / n::DOUBLE
               + 0.85 * coalesce(inr, 0.0) + 0.85 * dm / n::DOUBLE AS r
             FROM nodes LEFT JOIN i1 ON i1.dst = nodes.id, nn, d1),
      d2 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r1
             WHERE id NOT IN (SELECT src FROM e)),
      i2 AS (SELECT dst, sum(r * w) AS inr FROM c JOIN r1 ON r1.id = c.src
             GROUP BY dst),
      r2 AS (SELECT id, (1.0 - 0.85) / n::DOUBLE
               + 0.85 * coalesce(inr, 0.0) + 0.85 * dm / n::DOUBLE AS r
             FROM nodes LEFT JOIN i2 ON i2.dst = nodes.id, nn, d2),
      d3 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r2
             WHERE id NOT IN (SELECT src FROM e)),
      i3 AS (SELECT dst, sum(r * w) AS inr FROM c JOIN r2 ON r2.id = c.src
             GROUP BY dst),
      r3 AS (SELECT id, (1.0 - 0.85) / n::DOUBLE
               + 0.85 * coalesce(inr, 0.0) + 0.85 * dm / n::DOUBLE AS r
             FROM nodes LEFT JOIN i3 ON i3.dst = nodes.id, nn, d3)
      SELECT id AS doc_id, round(r, 10) AS pagerank
      FROM r3 ORDER BY doc_id""",

    // retention: same integer week index off the ns epoch
    "q18_retention" -> """
      WITH e AS (SELECT DISTINCT user_id,
                   epoch_ns(ts) // 604800000000000 AS wk
                 FROM events),
      f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
      sz AS (SELECT cohort_wk, count(*)::BIGINT AS cohort_size
             FROM f GROUP BY cohort_wk),
      a AS (SELECT f.cohort_wk, e.wk - f.cohort_wk AS "offset",
              count(*)::BIGINT AS n_active
            FROM e JOIN f USING (user_id)
            GROUP BY f.cohort_wk, e.wk - f.cohort_wk)
      SELECT a.cohort_wk, a."offset", a.n_active, sz.cohort_size,
             round(a.n_active::DOUBLE / sz.cohort_size::DOUBLE, 4) AS retention
      FROM a JOIN sz USING (cohort_wk)
      ORDER BY cohort_wk, "offset"""",

    // rate anomaly: same week index, same population stddev, same
    // sigma=0 convention
    "q19_rate_anomaly" -> """
      WITH c AS (SELECT event_type,
                   epoch_ns(ts) // 604800000000000 AS wk,
                   count(*)::BIGINT AS n
                 FROM events GROUP BY event_type, wk),
      st AS (SELECT event_type, avg(n::DOUBLE) AS mu,
               stddev_pop(n::DOUBLE) AS sigma
             FROM c GROUP BY event_type)
      SELECT c.event_type, c.wk, c.n,
             round(mu, 4) AS mu,
             round(CASE WHEN sigma = 0.0 THEN 0.0
                        ELSE (c.n::DOUBLE - mu) / sigma END, 4) AS z,
             abs(round(CASE WHEN sigma = 0.0 THEN 0.0
                       ELSE (c.n::DOUBLE - mu) / sigma END, 4)) > 2.0 AS anomaly
      FROM c JOIN st USING (event_type)
      ORDER BY event_type, wk""",

    // same html synthesis, same RE2-safe regexp chain (g flag), same
    // entity decode order (after tag stripping)
    "t46_html_extract" -> """
      WITH h AS (SELECT doc_id,
              '<html><head><title>T</title><style>p{color:red}</style></head>'
              || '<body><script>var x=1;</script><h1>' || source
              || '</h1><p>' || text
              || ' A &amp; B &lt;x&gt;</p></body></html>' AS html
            FROM documents),
      t2 AS (SELECT doc_id, html,
               regexp_replace(html,
                 '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>',
                 ' ', 'g') AS s
             FROM h),
      t3 AS (SELECT doc_id, html,
               replace(replace(replace(replace(replace(s,
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', '''') AS s
             FROM t2),
      x AS (SELECT doc_id, html,
              trim(regexp_replace(s, '\s+', ' ', 'g')) AS text FROM t3)
      SELECT doc_id, length(html)::BIGINT AS html_len,
             length(text)::BIGINT AS text_len,
             round(1.0::DOUBLE - length(text)::DOUBLE / length(html)::DOUBLE, 4)
               AS markup_ratio,
             md5(text) AS text_hash
      FROM x ORDER BY doc_id""",

    // C4 filters: same line synthesis, same keep predicate, same page
    // rules; md5 witnesses the rebuilt page
    "t47_c4_filters" -> s"""
      WITH a0 AS (SELECT doc_id, $docToks AS toks FROM documents),
      a AS (SELECT * FROM a0 WHERE len(toks) >= 1),
      raw AS (SELECT doc_id, j::BIGINT AS idx,
                array_to_string(toks[(j * 6 + 1)::INT : (j * 6 + 6)::INT], ' ') AS l,
                (('0x' || substr(md5('l:' || doc_id || ':' || j), 1, 16))::UBIGINT
                  % 10)::BIGINT AS r
              FROM a, LATERAL unnest(range(0, (len(toks) - 1) // 6 + 1)) t(j)),
      ln AS (SELECT doc_id, idx,
               CASE WHEN r <= 6 THEN l || '.'
                    WHEN r = 7 THEN l
                    WHEN r = 8 THEN l || ' {x}.'
                    ELSE l || ' javascript error.' END AS line
             FROM raw),
      pg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
             FROM ln GROUP BY doc_id),
      k AS (SELECT doc_id, text, string_split(text, chr(10)) AS lines,
              list_filter(string_split(text, chr(10)), l ->
                (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
                  OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '."')
                  OR ends_with(rtrim(l), '!"') OR ends_with(rtrim(l), '?"'))
                AND len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
            FROM pg),
      o AS (SELECT doc_id,
              len(lines)::BIGINT AS n_lines, len(kept)::BIGINT AS n_kept,
              coalesce(array_to_string(kept, chr(10)), '') AS new_text,
              contains(text, '{') AS has_brace,
              contains(lower(text), 'lorem ipsum') AS has_blocked
            FROM k)
      SELECT doc_id, n_lines, n_kept,
             (length(new_text) - length(translate(new_text, '.!?', '')))::BIGINT
               AS n_sentences,
             has_brace, has_blocked,
             ((length(new_text) - length(translate(new_text, '.!?', ''))) >= 3
               AND NOT has_brace AND NOT has_blocked) AS keep,
             md5(new_text) AS new_hash
      FROM o ORDER BY doc_id""",

    // DSIR: same tokenizer, same unigram+bigram stream, same md5 bucket
    // hash, same add-1 arithmetic as ln(x) - ln(y)
    "t45_dsir_weights" -> s"""
      WITH a AS (SELECT doc_id, source = 'src0' AS tgt, $docToks AS toks
                 FROM documents),
      uni AS (SELECT doc_id, tgt, unnest(toks) AS g FROM a),
      big AS (SELECT doc_id, tgt, toks[i::INT] || ' ' || toks[i::INT + 1] AS g
              FROM a, LATERAL unnest(range(1, len(toks))) t(i)
              WHERE len(toks) >= 2),
      f AS (SELECT doc_id, tgt,
              (('0x' || substr(md5(g), 1, 16))::UBIGINT % 256)::BIGINT AS b
            FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
      dist AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct,
                 count(*)::BIGINT AS cr
               FROM f GROUP BY b),
      tot AS (SELECT sum(ct)::DOUBLE AS tt, sum(cr)::DOUBLE AS rt FROM dist),
      lw AS (SELECT b,
               ln((ct::DOUBLE + 1.0) / (tt + 256.0))
                 - ln((cr::DOUBLE + 1.0) / (rt + 256.0)) AS lw
             FROM dist, tot),
      sc AS (SELECT doc_id, count(*)::BIGINT AS n_feats,
               round(sum(lw), 4) AS log_weight
             FROM f JOIN lw USING (b) GROUP BY doc_id)
      SELECT doc_id, n_feats, log_weight, log_weight >= 0.0 AS keep
      FROM sc ORDER BY doc_id""",

    "t28_ccnet_buckets" -> s"""
      WITH tk AS (SELECT doc_id, lang, len($docToks)::BIGINT AS n_tokens
                  FROM documents),
      b AS (SELECT lang, n_tokens,
              ntile(3) OVER (PARTITION BY lang
                ORDER BY n_tokens DESC, doc_id) AS bi
            FROM tk)
      SELECT lang,
             CASE WHEN bi = 1 THEN 'head' WHEN bi = 3 THEN 'tail'
                  ELSE 'middle' END AS bucket,
             count(*)::BIGINT AS n_docs, min(n_tokens) AS min_tokens,
             max(n_tokens) AS max_tokens, round(avg(n_tokens), 2) AS avg_tokens
      FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",

    "t27_surprisal" -> """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                    FROM documents),
      tk AS (SELECT doc_id, w FROM toks WHERE length(w) > 0),
      freq AS (SELECT w, count(*)::BIGINT AS cnt FROM tk GROUP BY w),
      tot AS (SELECT sum(cnt) AS total FROM freq),
      j AS (SELECT doc_id, -ln(cnt::DOUBLE / total::DOUBLE) AS sup
            FROM tk JOIN freq USING (w), tot)
      SELECT doc_id, count(*)::BIGINT AS n_toks, round(avg(sup), 4) AS surprisal
      FROM j GROUP BY doc_id ORDER BY doc_id""",

    "t23_canonical_pick" -> s"""
      WITH RECURSIVE $minhashCtes,
      prs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
      e AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION SELECT id_b, id_a FROM prs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             FROM reach GROUP BY a),
      r AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
              row_number() OVER (PARTITION BY cl.cluster_id
                ORDER BY d.n_chars DESC, cl.doc_id) AS rnk,
              count(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
            FROM cl JOIN documents d USING (doc_id))
      SELECT cluster_id, doc_id AS kept_doc, n_chars AS kept_chars,
             n_docs::BIGINT AS n_docs
      FROM r WHERE rnk = 1 ORDER BY cluster_id""",

    // bloom delta dedup: contract oracle — the sketch is not SQL-
    // reproducible, but the planted-copy recall (bloom's no-false-negative
    // guarantee) and fp budget are; n_incoming counts src0 + 20 plants
    "t30_delta_bloom" -> """
      SELECT (SELECT count(*) FROM documents WHERE source = 'src0')::BIGINT
               + 20 AS n_incoming,
             20::BIGINT AS n_planted,
             20::BIGINT AS planted_flagged,
             true AS no_false_neg,
             true AS fp_ok""",

    "t24_delta_dedup" -> """
      WITH starts AS (
        SELECT doc_id, source, text,
               unnest(range(0, greatest(length(text), 1), 150)) AS start0
        FROM documents),
      ch AS (SELECT doc_id, source,
                    md5(substr(text, start0 + 1, 200)) AS h
             FROM starts),
      cor AS (SELECT DISTINCT h FROM ch WHERE source <> 'src0'),
      f AS (SELECT ch.doc_id, count(*) AS n_chunks,
                   sum(CASE WHEN cor.h IS NOT NULL THEN 1 ELSE 0 END) AS n_dup_chunks
            FROM ch LEFT JOIN cor ON ch.h = cor.h
            WHERE ch.source = 'src0'
            GROUP BY ch.doc_id)
      SELECT doc_id, n_chunks::BIGINT AS n_chunks,
             n_dup_chunks::BIGINT AS n_dup_chunks,
             (CASE WHEN n_dup_chunks = 0 THEN 1 ELSE 0 END)::BIGINT AS kept
      FROM f ORDER BY doc_id""",

    "t22_chunk_dedup" -> """
      WITH starts AS (
        SELECT doc_id, text,
               unnest(range(0, greatest(length(text), 1), 150)) AS start0
        FROM documents),
      c AS (
        SELECT doc_id, md5(substr(text, start0 + 1, 200)) AS chunk_hash
        FROM starts)
      SELECT chunk_hash,
             count(DISTINCT doc_id)::BIGINT AS n_docs,
             count(*)::BIGINT AS n_occurrences,
             min(doc_id) AS first_doc
      FROM c GROUP BY chunk_hash
      HAVING count(DISTINCT doc_id) > 1
      ORDER BY n_docs DESC, chunk_hash""",

    "t19_tfidf" -> s"""
      WITH words AS (
        SELECT source, doc_id, w
        FROM (SELECT source, doc_id, unnest($docToks) AS w FROM documents)),
      tf AS (SELECT source, w, count(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
      dfreq AS (SELECT w, count(DISTINCT doc_id) AS dfreq FROM words GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM documents),
      scored AS (
        SELECT tf.source, tf.w, tf.tf,
               round(tf.tf * ln(n.n_docs / dfreq.dfreq), 4) AS tfidf
        FROM tf JOIN dfreq USING (w) CROSS JOIN n),
      r AS (SELECT source, w, tf, tfidf,
              row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, w)
                AS rnk
            FROM scored)
      SELECT source, rnk::BIGINT AS rnk, w AS term, tf, tfidf
      FROM r WHERE rnk <= 5 ORDER BY source, rnk""",

    "t20_profile" -> """
      SELECT source, count(*)::BIGINT AS n_docs,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             round(avg(n_chars), 2) AS avg_chars,
             round(quantile_cont(n_chars, 0.25), 2) AS p25,
             round(quantile_cont(n_chars, 0.5), 2) AS p50,
             round(quantile_cont(n_chars, 0.75), 2) AS p75,
             count(DISTINCT lang)::BIGINT AS n_langs
      FROM documents GROUP BY source ORDER BY source""",

    "t21_pii_redact" -> """
      WITH raw AS (
        SELECT doc_id,
               'user' || doc_id || '@' || source || '.example.com tel 555-' ||
               lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' ip 10.0.' ||
               (doc_id % 256)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR ||
               ' ' || substr(text, 1, 40) AS raw
        FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
             len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b'))::BIGINT AS n_phone,
             len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ip,
             regexp_replace(regexp_replace(regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
      FROM raw ORDER BY doc_id""",

    "t14_sequence_packing" -> s"""
      WITH d AS (SELECT doc_id, source, len($docToks)::BIGINT AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
      SELECT source, ((cum - 1) // 2048)::BIGINT AS pack_id,
             count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
      FROM c
      GROUP BY source, pack_id
      ORDER BY source, pack_id""",

    "t11_hash_split" -> s"""
      WITH b AS (
        SELECT doc_id, text,
               ('0x' || substr(md5(text), 1, 16))::UBIGINT % 100 AS bucket
        FROM documents),
      s AS (SELECT doc_id, text,
                   CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
            FROM b),
      q AS (SELECT s.split, s.doc_id, m.ml, s.text AS text,
                   len(list_filter(regexp_split_to_array(s.text, '\\s+'), x -> x <> '')) AS ntok
            FROM s JOIN ($meanLenCte) m ON s.doc_id = m.doc_id)
      SELECT split, count(*) AS n_docs,
             round(avg($qualityExpr), 4) AS avg_quality,
             CAST(sum(ntok) AS BIGINT) AS total_tokens
      FROM q GROUP BY split ORDER BY split""",

    "t09_fingerprint" -> """
      WITH g AS (
        SELECT doc_id,
               CASE WHEN length(text) >= 8 THEN substr(text, i::INT, 8) ELSE text END AS gram
        FROM documents, LATERAL unnest(range(1, greatest(2, length(text) - 6))) t(i)),
      h AS (SELECT doc_id, min(('0x' || substr(md5(gram), 1, 16))::UBIGINT) AS fpu FROM g
            GROUP BY doc_id)
      SELECT d.doc_id,
        CASE WHEN fpu >= 9223372036854775808::UBIGINT
             THEN (fpu::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT
             ELSE fpu::BIGINT END AS fp
      FROM documents d JOIN h ON d.doc_id = h.doc_id
      ORDER BY d.doc_id""",

    "m02_image_resize" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 4 + L % 29 AS w, 4 + (L * 31) % 25 AS h,
                   CASE L % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c FROM m),
      o AS (SELECT doc_id, L, w, h, c,
                   (w * 12) // greatest(w, h) AS ow,
                   (h * 12) // greatest(w, h) AS oh FROM d)
      SELECT doc_id, ow::BIGINT AS out_w, oh::BIGINT AS out_h,
             (ow * oh * c)::BIGINT AS out_bytes,
             list_sum(flatten(list_transform(range(0, oh), j ->
               flatten(list_transform(range(0, ow), i ->
                 list_transform(range(0, c), b ->
                   (((i * w) // ow) * 31 + ((j * h) // oh) * 17 + b * 7 + L)
                     % 256))))))::BIGINT AS out_sum
      FROM o ORDER BY doc_id""",

    "g30_utm" -> s"""
      WITH p AS (SELECT c_custkey, cx / 5000.0 + 15.0 AS lon, cy / 20.0 - 25.0 AS lat
                 FROM ($custPts)),
      k AS (SELECT c_custkey, lon, lat, radians(lat) AS phi, radians(lon) AS lam,
                   radians(15.0) AS lam0, 1.0 / 298.257223563 AS f FROM p),
      q1 AS (SELECT *, f * (2.0 - f) AS e2 FROM k),
      q2 AS (SELECT *, e2 / (1.0 - e2) AS ep2, e2 * e2 AS e4, (e2 * e2) * e2 AS e6,
                    sin(phi) AS sphi, cos(phi) AS cphi, tan(phi) AS tphi FROM q1),
      q3 AS (SELECT *, 6378137.0 / sqrt(1.0 - e2 * sphi * sphi) AS n,
                    tphi * tphi AS t, ep2 * cphi * cphi AS c,
                    (lam - lam0) * cphi AS aa FROM q2),
      q4 AS (SELECT *, 6378137.0 * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                    - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * sin(2.0 * phi)
                    + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * sin(4.0 * phi)
                    - (35.0 * e6 / 3072.0) * sin(6.0 * phi)) AS m FROM q3),
      q5 AS (SELECT *,
               0.9996 * n * (aa + (1.0 - t + c) * aa * aa * aa / 6.0
                 + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * pow(aa, 5) / 120.0)
                 + 500000.0 AS mx,
               0.9996 * (m + n * tphi * (aa * aa / 2.0
                 + (5.0 - t + 9.0 * c + 4.0 * c * c) * pow(aa, 4) / 24.0
                 + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2)
                   * pow(aa, 6) / 720.0)) AS my
             FROM q4)
      SELECT c_custkey, round(mx, 3) AS mx_utm, round(my, 3) AS my_utm,
             round(lon, 6) AS lon2, round(lat, 6) AS lat2
      FROM q5 ORDER BY c_custkey""",

    // brute-force nearest within the radius; rank() keeps distance ties,
    // mirroring the Spark rank window over the grid-join candidates
    // unbounded nearest: global rank over the full cross join (ties kept)
    "g70_sjoin_nearest_expand" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM c)
      SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
      FROM k WHERE rk = 1
      ORDER BY c_custkey, s_suppkey""",

    // indexed broadcast nearest (r10): same unbounded-nearest semantics as
    // g70, different physical plan (STR-tree branch-and-bound, no grid)
    "g74_sjoin_nearest_bcast" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM c)
      SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
      FROM k WHERE rk = 1
      ORDER BY c_custkey, s_suppkey""",

    // distributed expanding-ring kNN: same oracle as the broadcast kNN —
    // global rank over the cross join, rank<=3 keeps k-th ties
    "g81_closest_point" -> s"""
      WITH p AS (SELECT c_custkey, cx / 500.0 AS px,
                   abs(cy) / 100.0 + 1.0 AS py FROM ($custPts)),
      m AS (SELECT c_custkey, greatest(0.0, least(10.0, px)) AS qx, px, py FROM p)
      SELECT c_custkey, round(qx, 6) AS qx, 0.0::DOUBLE AS qy,
        round(sqrt((px - qx) * (px - qx) + py * py), 6) AS d
      FROM m ORDER BY c_custkey""",

    "g80_split" -> s"""
      WITH p AS (SELECT c_custkey, abs(cx) + 1.0 AS hx, abs(cy) + 1.0 AS hy
                 FROM ($custPts))
      SELECT c_custkey,
        2::BIGINT AS np, round(hx, 6) AS p0, round(hy, 6) AS p1,
        2::BIGINT AS nl, round(hx / 2, 6) AS l0, round(hx / 2 + hy, 6) AS l1,
        2::BIGINT AS pn, round(hx * hy, 6) AS pa_sum, 0.0::DOUBLE AS pa_diff
      FROM p ORDER BY c_custkey""",

    "g79_linesubstring_azimuth" -> s"""
      WITH p AS (SELECT c_custkey, abs(cx) + 1.0 AS hx, abs(cy) + 1.0 AS hy
                 FROM ($custPts)),
      m AS (SELECT c_custkey, hx, hy, hx + hy AS t,
              0.25 * (hx + hy) AS s0, 0.75 * (hx + hy) AS s1 FROM p)
      SELECT c_custkey,
        round(s1 - s0, 6) AS sub_len,
        round(CASE WHEN s0 <= hx THEN s0 ELSE hx END, 6) AS sx,
        round(CASE WHEN s0 <= hx THEN 0.0 ELSE s0 - hx END, 6) AS sy,
        round(CASE WHEN s1 <= hx THEN s1 ELSE hx END, 6) AS ex,
        round(CASE WHEN s1 <= hx THEN 0.0 ELSE s1 - hx END, 6) AS ey,
        round(atan2(hx, hy), 6) AS az
      FROM m ORDER BY c_custkey""",

    "g78_intersection_all" -> """
      WITH b AS (SELECT s_nationkey,
          (s_nationkey * 100)::DOUBLE + (s_suppkey % 5)::DOUBLE * 0.5 AS bx,
          (s_nationkey * 50)::DOUBLE + (s_suppkey % 3)::DOUBLE * 0.5 AS by,
          1.5 + (s_suppkey % 13)::DOUBLE AS h
        FROM supplier)
      SELECT s_nationkey, count(*)::BIGINT AS n_boxes,
        round((min(bx + h) - max(bx - h)) * (min(by + h) - max(by - h)), 4) AS inter_area,
        round(max(bx - h), 4) AS xmin, round(max(by - h), 4) AS ymin,
        round(min(bx + h), 4) AS xmax, round(min(by + h), 4) AS ymax
      FROM b GROUP BY s_nationkey ORDER BY s_nationkey""",

    "g77_sjoin_knn_expand" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM c)
      SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
      FROM k WHERE rk <= 3
      ORDER BY c_custkey, s_suppkey""",

    // kNN join: global rank over the cross join, rank<=3 keeps k-th ties
    "g76_sjoin_knn" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM c)
      SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
      FROM k WHERE rk <= 3
      ORDER BY c_custkey, s_suppkey""",

    // nearest how=left at a tight radius: customers with no supplier in
    // range keep one null-padded row
    "g68_sjoin_nearest_left" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      f AS (SELECT * FROM c WHERE dist <= 40.0),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM f),
      nn AS (SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
             FROM k WHERE rk = 1)
      SELECT l.c_custkey, nn.s_suppkey, nn.dist
      FROM l LEFT JOIN nn ON l.c_custkey = nn.c_custkey
      ORDER BY l.c_custkey, nn.s_suppkey""",

    "g40_sjoin_nearest" -> s"""
      WITH l AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      r AS (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy
            FROM supplier),
      c AS (SELECT c_custkey, s_suppkey,
              sqrt((cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)) AS dist
            FROM l CROSS JOIN r),
      f AS (SELECT * FROM c WHERE dist <= 300.0),
      k AS (SELECT *, rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM f)
      SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
      FROM k WHERE rk = 1
      ORDER BY c_custkey, s_suppkey""",

    // mirrors Crs.AlbersConic / Crs.LambertConic forward math term by term
    // (Snyder eqs 14-1..14-11 / 15-1..15-11, GRS80); roundtrip columns are
    // the original lon/lat (the Spark side must invert to 1e-6 deg)
    "g39_conic" -> s"""
      WITH p AS (SELECT c_custkey, cx / 500.0 - 95.0 AS lon, cy / 40.0 + 25.0 AS lat
                 FROM ($custPts)),
      e0 AS (SELECT f * (2.0 - f) AS e2, sqrt(f * (2.0 - f)) AS e
             FROM (SELECT 1.0 / 298.257222101 AS f)),
      a1 AS (SELECT e2, e,
               cos(29.5 / 180.0 * pi()) / sqrt(1.0 - e2 * sin(29.5 / 180.0 * pi()) * sin(29.5 / 180.0 * pi())) AS m1,
               cos(45.5 / 180.0 * pi()) / sqrt(1.0 - e2 * sin(45.5 / 180.0 * pi()) * sin(45.5 / 180.0 * pi())) AS m2,
               (1.0 - e2) * (sin(29.5 / 180.0 * pi()) / (1.0 - e2 * sin(29.5 / 180.0 * pi()) * sin(29.5 / 180.0 * pi()))
                 - (1.0 / (2.0 * e)) * ln((1.0 - e * sin(29.5 / 180.0 * pi())) / (1.0 + e * sin(29.5 / 180.0 * pi())))) AS qq1,
               (1.0 - e2) * (sin(45.5 / 180.0 * pi()) / (1.0 - e2 * sin(45.5 / 180.0 * pi()) * sin(45.5 / 180.0 * pi()))
                 - (1.0 / (2.0 * e)) * ln((1.0 - e * sin(45.5 / 180.0 * pi())) / (1.0 + e * sin(45.5 / 180.0 * pi())))) AS qq2,
               (1.0 - e2) * (sin(23.0 / 180.0 * pi()) / (1.0 - e2 * sin(23.0 / 180.0 * pi()) * sin(23.0 / 180.0 * pi()))
                 - (1.0 / (2.0 * e)) * ln((1.0 - e * sin(23.0 / 180.0 * pi())) / (1.0 + e * sin(23.0 / 180.0 * pi())))) AS qq0
             FROM e0),
      a2 AS (SELECT *, (m1 * m1 - m2 * m2) / (qq2 - qq1) AS an FROM a1),
      a3 AS (SELECT *, m1 * m1 + an * qq1 AS ac FROM a2),
      a4 AS (SELECT *, 6378137.0 * sqrt(ac - an * qq0) / an AS arho0 FROM a3),
      l1 AS (SELECT e2 AS le2, e AS le,
               cos(49.0 / 180.0 * pi()) / sqrt(1.0 - e2 * sin(49.0 / 180.0 * pi()) * sin(49.0 / 180.0 * pi())) AS lm1,
               cos(77.0 / 180.0 * pi()) / sqrt(1.0 - e2 * sin(77.0 / 180.0 * pi()) * sin(77.0 / 180.0 * pi())) AS lm2,
               tan(pi() / 4.0 - (49.0 / 180.0 * pi()) / 2.0) / pow((1.0 - e * sin(49.0 / 180.0 * pi())) / (1.0 + e * sin(49.0 / 180.0 * pi())), e / 2.0) AS lt1,
               tan(pi() / 4.0 - (77.0 / 180.0 * pi()) / 2.0) / pow((1.0 - e * sin(77.0 / 180.0 * pi())) / (1.0 + e * sin(77.0 / 180.0 * pi())), e / 2.0) AS lt2,
               tan(pi() / 4.0 - (63.390675 / 180.0 * pi()) / 2.0) / pow((1.0 - e * sin(63.390675 / 180.0 * pi())) / (1.0 + e * sin(63.390675 / 180.0 * pi())), e / 2.0) AS lt0
             FROM e0),
      l2 AS (SELECT *, (ln(lm1) - ln(lm2)) / (ln(lt1) - ln(lt2)) AS lnn FROM l1),
      l3 AS (SELECT *, lm1 / (lnn * pow(lt1, lnn)) AS lff FROM l2),
      l4 AS (SELECT *, 6378137.0 * lff * pow(lt0, lnn) AS lrho0 FROM l3),
      pt AS (SELECT c_custkey, lon, lat,
               sin(lat / 180.0 * pi()) AS s, an, ac, arho0, lnn, lff, lrho0, e2, e, le, lt0,
               an * (lon / 180.0 * pi() - (-96.0) / 180.0 * pi()) AS ath,
               lnn * (lon / 180.0 * pi() - (-(91.0 + 52.0 / 60.0)) / 180.0 * pi()) AS lth
             FROM p, a4, l4),
      pq AS (SELECT *,
               (1.0 - e2) * (s / (1.0 - e2 * s * s)
                 - (1.0 / (2.0 * e)) * ln((1.0 - e * s) / (1.0 + e * s))) AS qp,
               tan(pi() / 4.0 - (lat / 180.0 * pi()) / 2.0)
                 / pow((1.0 - le * s) / (1.0 + le * s), le / 2.0) AS tp
             FROM pt),
      pr AS (SELECT *, 6378137.0 * sqrt(ac - an * qp) / an AS ar,
               6378137.0 * lff * pow(tp, lnn) AS lr FROM pq)
      SELECT c_custkey,
             round(ar * sin(ath), 3) AS ax,
             round(arho0 - ar * cos(ath), 3) AS ay,
             round(6200000.0 + lr * sin(lth), 3) AS lx,
             round(3000000.0 + lrho0 - lr * cos(lth), 3) AS ly,
             round(lon, 6) AS alon2, round(lat, 6) AS alat2,
             round(lon, 6) AS llon2, round(lat, 6) AS llat2
      FROM pr ORDER BY c_custkey""",

    // EPSG-table grids: TM forward on Airy 1830 (27700, incl. M0/k0/FN)
    // and LCC 2SP forward on GRS80 (2154) mirrored term by term; the
    // roundtrip-delta columns are exactly 0 at 5 dp (inverse validation)
    "g44_epsg_grids" -> s"""
      WITH p AS (SELECT c_custkey,
                   cx / 2000.0 - 3.0 AS blon, cy / 400.0 + 49.2 AS blat,
                   cx / 2000.0 + 2.5 AS flon, cy / 200.0 + 43.0 AS flat
                 FROM ($custPts)),
      be AS (SELECT 6377563.396 AS ba, f * (2.0 - f) AS be2,
               f * (2.0 - f) / (1.0 - f * (2.0 - f)) AS bep2,
               0.9996012717 AS bk0
             FROM (SELECT 1.0 / 299.3249646 AS f)),
      be2 AS (SELECT *, be2 * be2 AS be4, be2 * be2 * be2 AS be6 FROM be),
      bm0 AS (SELECT *,
               ba * ((1.0 - be2 / 4.0 - 3.0 * be4 / 64.0 - 5.0 * be6 / 256.0) * radians(49.0)
                 - (3.0 * be2 / 8.0 + 3.0 * be4 / 32.0 + 45.0 * be6 / 1024.0) * sin(2.0 * radians(49.0))
                 + (15.0 * be4 / 256.0 + 45.0 * be6 / 1024.0) * sin(4.0 * radians(49.0))
                 - (35.0 * be6 / 3072.0) * sin(6.0 * radians(49.0))) AS m0
             FROM be2),
      le AS (SELECT f * (2.0 - f) AS le2, sqrt(f * (2.0 - f)) AS le
             FROM (SELECT 1.0 / 298.257222101 AS f)),
      l1 AS (SELECT le2, le,
               cos(radians(49.0)) / sqrt(1.0 - le2 * sin(radians(49.0)) * sin(radians(49.0))) AS lm1,
               cos(radians(44.0)) / sqrt(1.0 - le2 * sin(radians(44.0)) * sin(radians(44.0))) AS lm2,
               tan(pi() / 4.0 - radians(49.0) / 2.0) / pow((1.0 - le * sin(radians(49.0))) / (1.0 + le * sin(radians(49.0))), le / 2.0) AS lt1,
               tan(pi() / 4.0 - radians(44.0) / 2.0) / pow((1.0 - le * sin(radians(44.0))) / (1.0 + le * sin(radians(44.0))), le / 2.0) AS lt2,
               tan(pi() / 4.0 - radians(46.5) / 2.0) / pow((1.0 - le * sin(radians(46.5))) / (1.0 + le * sin(radians(46.5))), le / 2.0) AS lt0
             FROM le),
      l2 AS (SELECT *, (ln(lm1) - ln(lm2)) / (ln(lt1) - ln(lt2)) AS lnn FROM l1),
      l3 AS (SELECT *, lm1 / (lnn * pow(lt1, lnn)) AS lff FROM l2),
      l4 AS (SELECT *, 6378137.0 * lff * pow(lt0, lnn) AS lrho0 FROM l3),
      -- WGS84 -> OSGB36 Helmert (EPSG 9606 position-vector, the OS
      -- published 7 params), mirrored op-for-op against Crs.Helmert:
      -- geodetic->geocentric on WGS84, transform, 6 fixed atan2 iterations
      -- back to geodetic on Airy 1830
      hh AS (SELECT c_custkey, blon, blat, flon, flat,
               radians(-0.1502 / 3600.0) AS hrx,
               radians(-0.2470 / 3600.0) AS hry,
               radians(-0.8421 / 3600.0) AS hrz,
               1.0 + 20.4894 * 1e-6 AS hm,
               (1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563) AS we2
             FROM p),
      hg AS (SELECT *,
               (6378137.0 / sqrt(1.0 - we2 * sin(radians(blat)) * sin(radians(blat))))
                 * cos(radians(blat)) * cos(radians(blon)) AS gx,
               (6378137.0 / sqrt(1.0 - we2 * sin(radians(blat)) * sin(radians(blat))))
                 * cos(radians(blat)) * sin(radians(blon)) AS gy,
               (6378137.0 / sqrt(1.0 - we2 * sin(radians(blat)) * sin(radians(blat))))
                 * (1.0 - we2) * sin(radians(blat)) AS gz
             FROM hh),
      ht AS (SELECT *,
               -446.448 + hm * (gx - hrz * gy + hry * gz) AS ax,
               125.157 + hm * (hrz * gx + gy - hrx * gz) AS ay,
               -542.060 + hm * (-hry * gx + hrx * gy + gz) AS az
             FROM hg),
      bt0 AS (SELECT ht.*, ba, be2, bep2, be4, be6, bk0, m0, le2, le, lnn, lff, lrho0,
                sqrt(ax * ax + ay * ay) AS hp
              FROM ht, bm0, l4),
      bi1 AS (SELECT *, atan2(az, hp * (1.0 - be2)) AS f0 FROM bt0),
      bi2 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f0) * sin(f0))) * sin(f0), hp) AS f1 FROM bi1),
      bi3 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f1) * sin(f1))) * sin(f1), hp) AS f2 FROM bi2),
      bi4 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f2) * sin(f2))) * sin(f2), hp) AS f3 FROM bi3),
      bi5 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f3) * sin(f3))) * sin(f3), hp) AS f4 FROM bi4),
      bi6 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f4) * sin(f4))) * sin(f4), hp) AS f5 FROM bi5),
      bi7 AS (SELECT *, atan2(az + be2 * (ba / sqrt(1.0 - be2 * sin(f5) * sin(f5))) * sin(f5), hp) AS f6 FROM bi6),
      bhl AS (SELECT *, degrees(f6) AS blat2, degrees(atan2(ay, ax)) AS blon2 FROM bi7),
      bt AS (SELECT c_custkey, blon2, blat2, flon, flat,
               sin(radians(blat2)) AS bs, cos(radians(blat2)) AS bc, tan(radians(blat2)) AS btn,
               ba, be2, bep2, be4, be6, bk0, m0, le2, le, lnn, lff, lrho0
             FROM bhl),
      bu AS (SELECT *,
               ba / sqrt(1.0 - be2 * bs * bs) AS bn,
               btn * btn AS btt,
               bep2 * bc * bc AS bcc,
               (radians(blon2) - radians(-2.0)) * bc AS baa,
               ba * ((1.0 - be2 / 4.0 - 3.0 * be4 / 64.0 - 5.0 * be6 / 256.0) * radians(blat2)
                 - (3.0 * be2 / 8.0 + 3.0 * be4 / 32.0 + 45.0 * be6 / 1024.0) * sin(2.0 * radians(blat2))
                 + (15.0 * be4 / 256.0 + 45.0 * be6 / 1024.0) * sin(4.0 * radians(blat2))
                 - (35.0 * be6 / 3072.0) * sin(6.0 * radians(blat2))) AS bm
             FROM bt),
      bv AS (SELECT *,
               bk0 * bn * (baa + (1.0 - btt + bcc) * baa * baa * baa / 6.0
                 + (5.0 - 18.0 * btt + btt * btt + 72.0 * bcc - 58.0 * bep2) * pow(baa, 5) / 120.0) + 400000.0 AS bxv,
               -100000.0 + bk0 * (bm - m0 + bn * btn * (baa * baa / 2.0
                 + (5.0 - btt + 9.0 * bcc + 4.0 * bcc * bcc) * pow(baa, 4) / 24.0
                 + (61.0 - 58.0 * btt + btt * btt + 600.0 * bcc - 330.0 * bep2) * pow(baa, 6) / 720.0)) AS byv,
               lnn * (radians(flon) - radians(3.0)) AS lth,
               tan(pi() / 4.0 - radians(flat) / 2.0)
                 / pow((1.0 - le * sin(radians(flat))) / (1.0 + le * sin(radians(flat))), le / 2.0) AS ltp
             FROM bu),
      bw AS (SELECT *, 6378137.0 * lff * pow(ltp, lnn) AS lr FROM bv)
      SELECT c_custkey,
             round(bxv, 3) AS bx, round(byv, 3) AS by,
             round(700000.0 + lr * sin(lth), 3) AS fx,
             round(6600000.0 + lrho0 - lr * cos(lth), 3) AS fy,
             0.0::DOUBLE AS b_dlon, 0.0::DOUBLE AS b_dlat,
             0.0::DOUBLE AS f_dlon, 0.0::DOUBLE AS f_dlat,
             0.0::DOUBLE AS e_dlon, 0.0::DOUBLE AS e_dlat,
             0.0::DOUBLE AS l_dlon, 0.0::DOUBLE AS l_dlat
      FROM bw ORDER BY c_custkey""",

    // disjoint right strips make intersection areas additive: closed-form
    // axis-aligned overlap per (square, strip) pair; diff = (2h)^2 - sum
    // composed overlay closed forms over disjoint squares vs disjoint
    // strips: pairwise rectangle clamps give every piece area exactly;
    // union rows = inter pieces + left-diff (square minus its strip
    // overlaps) + right-diff (strip minus ITS square overlaps, valid
    // because the squares are lattice-disjoint)
    "g66_overlay_union" -> """
      WITH l AS (SELECT s_suppkey,
               (s_suppkey % 53)::DOUBLE * 40.0 AS sx,
               (s_suppkey % 41)::DOUBLE * 30.0 AS sy,
               ((s_suppkey % 10) + 1)::DOUBLE AS h FROM supplier),
      r AS (SELECT r_regionkey, r_regionkey * 2500.0 - 1000.0 AS bx0,
              r_regionkey * 2500.0 + 1490.0 AS bx1 FROM region),
      p AS (SELECT s_suppkey, r_regionkey, h,
              greatest(0.0, least(sx + h, bx1) - greatest(sx - h, bx0)) *
              greatest(0.0, least(sy + h, 1000.0) - greatest(sy - h, 0.0)) AS ia
            FROM l CROSS JOIN r),
      inter AS (SELECT count(*)::BIGINT AS n, sum(ia) AS area
                FROM p WHERE ia > 0),
      ld AS (SELECT l.s_suppkey, 4.0 * max(l.h) * max(l.h) - sum(p.ia) AS rest
             FROM l JOIN p ON l.s_suppkey = p.s_suppkey GROUP BY l.s_suppkey),
      ldx AS (SELECT count(*)::BIGINT AS n, sum(rest) AS area
              FROM ld WHERE rest > 0),
      rd AS (SELECT r.r_regionkey, 2490.0 * 1000.0 - sum(p.ia) AS rest
             FROM r JOIN p ON r.r_regionkey = p.r_regionkey GROUP BY r.r_regionkey),
      rdx AS (SELECT count(*)::BIGINT AS n, sum(rest) AS area
              FROM rd WHERE rest > 0),
      sides AS (
        SELECT 'union' AS how, 'inter' AS side, n, area FROM inter
        UNION ALL SELECT 'union', 'left', n, area FROM ldx
        UNION ALL SELECT 'union', 'right', n, area FROM rdx
        UNION ALL SELECT 'symmetric_difference', 'left', n, area FROM ldx
        UNION ALL SELECT 'symmetric_difference', 'right', n, area FROM rdx
        UNION ALL SELECT 'identity', 'inter', n, area FROM inter
        UNION ALL SELECT 'identity', 'left', n, area FROM ldx)
      SELECT how, side, n, round(area, 4) AS area
      FROM sides ORDER BY how, side""",

    "g42_overlay" -> """
      WITH l AS (SELECT s_suppkey, s_acctbal AS x0,
               (s_suppkey % 100)::DOUBLE * 10.0 AS y0,
               ((s_suppkey % 10) + 1)::DOUBLE AS h FROM supplier),
      r AS (SELECT r_regionkey, r_regionkey * 2500.0 - 1000.0 AS bx0,
              r_regionkey * 2500.0 + 1490.0 AS bx1 FROM region),
      p AS (SELECT s_suppkey, h,
              greatest(0.0, least(x0 + h, bx1) - greatest(x0 - h, bx0)) *
              greatest(0.0, least(y0 + h, 1000.0) - greatest(y0 - h, 0.0)) AS ia
            FROM l CROSS JOIN r),
      a AS (SELECT s_suppkey, max(h) AS h,
              sum(CASE WHEN ia > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hits,
              sum(CASE WHEN ia > 0 THEN ia ELSE 0.0 END) AS isum
            FROM p GROUP BY s_suppkey)
      SELECT s_suppkey, n_hits, round(isum, 4) AS inter_area,
             -- + 0.0 normalizes the -0.0 that an ulp-negative residual
             -- rounds to
             round((2.0 * h) * (2.0 * h) - isum, 4) + 0.0 AS diff_area
      FROM a
      -- geopandas overlay(difference) drops fully-erased rows (r8 default)
      WHERE round((2.0 * h) * (2.0 * h) - isum, 4) > 0.0
      ORDER BY s_suppkey""",

    "g46_geopackage" -> """
      SELECT (i + 1)::BIGINT AS fid, i::BIGINT AS s_suppkey,
             'sup_' || i AS s_name,
             (i * 0.5 - 25.0)::DOUBLE AS weight,
             CASE WHEN i % 7 = 0 THEN NULL ELSE 'note_' || (i % 13) END AS note,
             (i * 3.25 - 100.0)::DOUBLE AS x, (i % 100)::DOUBLE * 7.5 AS y
      FROM (SELECT unnest(range(0, 500)) AS i) ORDER BY fid""",

    // spatialite fixture closed forms: null geometry every 50th row, the
    // (0,0,200,300) window holds exactly i in 31..40 -> n_in_box = 10
    "g118_spatialite" -> """
      SELECT (i + 1)::BIGINT AS pk, i::BIGINT AS s_suppkey,
             'sup_' || i AS s_name,
             (i * 0.5 - 25.0)::DOUBLE AS weight,
             CASE WHEN i % 7 = 0 THEN NULL ELSE 'note_' || (i % 13) END AS note,
             CASE WHEN i % 50 = 49 THEN NULL ELSE (i * 3.25 - 100.0)::DOUBLE END AS x,
             CASE WHEN i % 50 = 49 THEN NULL ELSE (i % 100)::DOUBLE * 7.5 END AS y,
             NULL::BIGINT AS n_in_box
      FROM (SELECT unnest(range(0, 500)) AS i)
      UNION ALL
      SELECT -1::BIGINT, NULL, NULL, NULL, NULL, NULL, NULL, 10::BIGINT
      ORDER BY pk""",

    // labeled rows + off-grid bounds + decimal-exact sum (see the g120
    // contract-hardening note in SparkEntry): x = acctbal (0.01 grid),
    // y = (suppkey%100)*10 (grid 10) — 0.005-widened bounds admit exactly
    // the same rows while absorbing any FGDB decode drift (≤ ~1e-9)
    "g120_filegdb_sql" -> """
      WITH agg AS (
        SELECT count(*)::DOUBLE AS n_total,
               sum(CASE WHEN s_acctbal BETWEEN -0.005 AND 5000.005
                         AND (s_suppkey % 100) * 10.0 BETWEEN -0.005 AND 400.005
                    THEN 1 ELSE 0 END)::DOUBLE AS n_in_box,
               CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM supplier)
      SELECT 'n_total' AS metric, n_total AS value FROM agg
      UNION ALL SELECT 'n_in_box', n_in_box FROM agg
      UNION ALL SELECT 'sum_bal', sum_bal FROM agg
      UNION ALL SELECT 'n_total_meta', n_total FROM agg
      ORDER BY metric""",

    // GDB_Items discovery: layer names/flags are write-determined; row
    // counts come from the source tables
    "g123_gdb_items" -> """
      SELECT 'nations' AS layer, true AS is_fc,
             (SELECT count(*) FROM nation)::BIGINT AS n_rows
      UNION ALL
      SELECT 'suppliers', true, (SELECT count(*) FROM supplier)::BIGINT
      ORDER BY layer""",

    // spatialite write roundtrip: both read paths surface the same
    // synthetic supplier coordinates (x2 = x by construction)
    "g122_spatialite_write" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, s_name, s_acctbal AS bal,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y,
             s_acctbal AS x2
      FROM supplier ORDER BY s_suppkey""",

    // spatialite DSv2 window: same closed forms as g118's pruned leg
    "g121_spatialite_sql" -> """
      SELECT (i + 1)::BIGINT AS pk, i::BIGINT AS s_suppkey,
             (i * 3.25 - 100.0)::DOUBLE AS x, (i % 100)::DOUBLE * 7.5 AS y
      FROM (SELECT unnest(range(0, 500)) AS i)
      WHERE i % 50 <> 49
        AND i * 3.25 - 100.0 BETWEEN 0 AND 200
        AND (i % 100) * 7.5 BETWEEN 0 AND 300
      ORDER BY pk""",

    // missing-values closed forms: every 7th geometry null -> flagged,
    // empty after the default fill, x=-1 after the point fill
    // streaming windowed extent: tumbling 6h windows, bounds = min/max
    "t55_stream_extent" -> """
      WITH e AS (SELECT epoch_ns(ts) AS tns, value AS x,
                        (user_id % 100)::DOUBLE AS y FROM events)
      SELECT (tns // 21600000000000) * 21600 AS wstart,
             round(min(x), 6) AS xmin, round(min(y), 6) AS ymin,
             round(max(x), 6) AS xmax, round(max(y), 6) AS ymax,
             count(*) AS n
      FROM e GROUP BY 1 ORDER BY wstart""",

    "g119_fillna" -> """
      SELECT s_suppkey,
             (s_suppkey % 7 = 0) AS was_na,
             (s_suppkey % 7 = 0) AS empty_after,
             CASE WHEN s_suppkey % 7 = 0 THEN -1.0 ELSE s_acctbal END::DOUBLE
               AS x_after
      FROM supplier ORDER BY s_suppkey""",

    "g47_geopackage_write" -> """
      SELECT s_suppkey::BIGINT AS fid, s_name, s_acctbal AS bal,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY fid""",

    "g50_geoarrow_polygon" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 10) + 1)::DOUBLE AS h FROM supplier)
      SELECT s_suppkey,
        round((2.0 * h) * (2.0 * h), 4) AS area,
        round(8.0 * h, 4) AS perim
      FROM p ORDER BY s_suppkey""",

    "g52_geojson_fc" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, s_name, s_acctbal AS bal,
             CASE WHEN s_suppkey % 7 = 0 THEN NULL
                  ELSE 'n_' || (s_suppkey % 13) END AS note,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY s_suppkey""",

    "g53_line_edit_ops" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 9) + 1)::DOUBLE * 2.0 AS len
                 FROM supplier)
      SELECT s_suppkey,
        4 AS n_raw,
        3 AS n_dedup,
        (2 * len + 1)::INTEGER AS n_seg,
        round(2 * len, 6) AS seg_len,
        3 AS n_uniq,
        len AS rev_x, len AS rev_y,
        false AS still_z
      FROM p ORDER BY s_suppkey""",

    "g54_mbc_mrr" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 1)::DOUBLE AS w,
                   ((s_suppkey % 7) + 1)::DOUBLE AS h
                 FROM supplier)
      SELECT s_suppkey,
        round(w * h, 6) AS mrr_area,
        round(sqrt(w * w + h * h) / 2, 6) AS mbr
      FROM p ORDER BY s_suppkey""",

    "g55_shortest_haus_merge" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 9) + 1)::DOUBLE AS dy,
                   (s_suppkey % 4)::DOUBLE AS off,
                   ((s_suppkey % 5) + 1)::DOUBLE AS a,
                   ((s_suppkey % 3) + 1)::DOUBLE AS b
                 FROM supplier)
      SELECT s_suppkey,
        round(dy, 6) AS sl_len,
        round(sqrt((off + 5) * (off + 5) + dy * dy), 6) AS haus,
        2 AS n_merged,
        5 AS n_pts,
        round(a + b + 1, 6) AS len_merged
      FROM p ORDER BY s_suppkey""",

    "g57_delaunay_frechet_offset" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h,
                   (s_suppkey % 4)::DOUBLE AS off,
                   ((s_suppkey % 9) + 1)::DOUBLE AS dy,
                   ((s_suppkey % 5) + 2)::DOUBLE AS a,
                   ((s_suppkey % 3) + 2)::DOUBLE AS b
                 FROM supplier)
      SELECT s_suppkey,
        4 AS n_tri,
        round(w * h, 6) AS tri_area,
        round(sqrt(off * off + dy * dy), 6) AS frechet,
        round(a + b - 1.0, 6) AS off_left_len,
        round(a + b + 1.0, 6) AS off_right_len,
        round(a - 0.5, 6) AS off_end_x,
        round(b, 6) AS off_end_y,
        8 AS n_samp,
        true AS inside,
        true AS determ
      FROM p ORDER BY s_suppkey""",

    // polar stereographic variant B forward (Snyder 21-30..21-37 on
    // WGS84) mirrored term by term: t at the (mirrored-for-south)
    // latitude, rho = a*mc*t/tc, x = fe + rho*sin(dlam),
    // y = fn + sgn*rho*cos(dlam) with sgn = +1 south / -1 north
    "g65_polar_stereo" -> s"""
      WITH g AS (SELECT * FROM (VALUES
          ('EPSG:3413', 1.0, 70.0, -45.0, -1.0),
          ('EPSG:3031', -1.0, 71.0, 0.0, 1.0))
        AS t(code, hemi, absts, lon0, sgn)),
      p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      e0 AS (SELECT f * (2.0 - f) AS e2, sqrt(f * (2.0 - f)) AS e
             FROM (SELECT 1.0 / 298.257223563 AS f)),
      x1 AS (SELECT c_custkey, code, hemi, lon0, sgn, e2, e,
               cx / 40.0 - 100.0 AS lon,
               hemi * (cy / 50.0 + 60.0) AS lat,
               radians(absts) AS phits
             FROM p CROSS JOIN g, e0),
      x2 AS (SELECT *,
               radians(abs(lat)) AS phi,
               radians(lon) - radians(lon0) AS dlam,
               cos(phits) / sqrt(1.0 - e2 * sin(phits) * sin(phits)) AS mc,
               tan(pi() / 4.0 - phits / 2.0)
                 / pow((1.0 - e * sin(phits)) / (1.0 + e * sin(phits)), e / 2.0) AS tc
             FROM x1),
      x3 AS (SELECT *,
               tan(pi() / 4.0 - phi / 2.0)
                 / pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0) AS t
             FROM x2),
      x4 AS (SELECT *, 6378137.0 * mc * t / tc AS rho FROM x3)
      SELECT c_custkey, code,
             round(rho * sin(dlam), 3) AS gx,
             round(sgn * rho * cos(dlam), 3) AS gy,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM x4 ORDER BY c_custkey, code""",

    // r11 long-tail families mirrored term by term with the SAME double
    // expression structure as the Scala kernels (association matters for
    // bit-identical rounding): ellipsoidal sinusoidal (Snyder 25-16/3-21),
    // Miller cylindrical, spherical gnomonic. Roundtrip deltas are 0 at
    // 5 dp (mill/gnom machine-exact; sinu inverse series ~7e-8 deg).
    "g82_to_crs_longtail" -> s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      b AS (SELECT c_custkey,
              cx / 100.0 - 50.0 AS lon, cy / 25.0 + 10.0 AS lat FROM p),
      e0 AS (SELECT f * (2.0 - f) AS e2 FROM (SELECT 1.0 / 298.257223563 AS f)),
      e1 AS (SELECT e2, e2 * e2 AS e4, e2 * e2 * e2 AS e6 FROM e0),
      s1 AS (SELECT c_custkey, lon, lat, e2, e4, e6,
               radians(lon) AS lam, radians(lat) AS phi FROM b, e1),
      sinu AS (SELECT c_custkey, '+proj=sinu +lon_0=10 +ellps=WGS84' AS code,
          6378137.0 * radians(lon - 10.0) * cos(phi)
            / sqrt(1.0 - e2 * sin(phi) * sin(phi)) AS gx,
          6378137.0 * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
            - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * sin(2.0 * phi)
            + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * sin(4.0 * phi)
            - (35.0 * e6 / 3072.0) * sin(6.0 * phi)) AS gy
        FROM s1),
      mill AS (SELECT c_custkey, '+proj=mill +lon_0=-30' AS code,
          6378137.0 * radians(lon + 30.0) AS gx,
          6378137.0 * ln(tan(pi() / 4.0 + 0.4 * phi)) / 0.8 AS gy
        FROM s1),
      gno AS (SELECT c_custkey, '+proj=gnom +lat_0=30 +lon_0=0' AS code,
          6378137.0 * cos(phi) * sin(lam)
            / (sin(radians(30.0)) * sin(phi)
               + cos(radians(30.0)) * cos(phi) * cos(lam)) AS gx,
          6378137.0 * (cos(radians(30.0)) * sin(phi)
               - sin(radians(30.0)) * cos(phi) * cos(lam))
            / (sin(radians(30.0)) * sin(phi)
               + cos(radians(30.0)) * cos(phi) * cos(lam)) AS gy
        FROM s1)
      SELECT c_custkey, code, round(gx, 3) AS gx, round(gy, 3) AS gy,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM (SELECT * FROM sinu UNION ALL SELECT * FROM mill
            UNION ALL SELECT * FROM gno)
      ORDER BY c_custkey, code""",

    // r11 Equal Earth forward mirrored with the kernel's exact double
    // expression structure (A-coefficients, closed-form theta, shared t2/t6
    // powers); roundtrip deltas 0 at 6 dp
    "g84_equal_earth" -> s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      b AS (SELECT c_custkey,
              radians((cx / 30.0 - 170.0) - 12.0) AS dlam,
              radians(cy / 6.0 - 83.0) AS phi FROM p),
      t AS (SELECT c_custkey, dlam,
              asin(sqrt(3.0) / 2.0 * sin(phi)) AS th FROM b),
      q0 AS (SELECT c_custkey, dlam, th, th * th AS t2 FROM t),
      q AS (SELECT c_custkey, dlam, th, t2, t2 * t2 * t2 AS t6 FROM q0)
      SELECT c_custkey,
        round(6378137.0 * dlam * cos(th)
          / (sqrt(3.0) / 2.0 * (1.340264 + 3.0 * -0.081106 * t2
             + t6 * (7.0 * 0.000893 + 9.0 * 0.003796 * t2))), 3) AS gx,
        round(6378137.0 * (th * (1.340264 + -0.081106 * t2
             + t6 * (0.000893 + 0.003796 * t2))), 3) AS gy,
        0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM q ORDER BY c_custkey""",

    // r11 ellipsoidal area/perimeter: the Spark side divides by the SAME
    // closed forms, so the ratios are exactly 1.0 at 4 dp
    "g85_geography_area" -> s"""
      SELECT s_suppkey, 1.0::DOUBLE AS area_ratio, 1.0::DOUBLE AS perim_ratio
      FROM supplier ORDER BY s_suppkey""",

    // r11 conic/pseudoconic forwards mirrored term by term (Snyder series
    // with the kernels' exact double association; shared e2/e4/e6 CTE and
    // the 3-21 meridian-arc macro). Roundtrip deltas 0 at 5 dp.
    "g86_to_crs_conics" -> {
      def mArcSql(phi: String): String =
        s"6378137.0 * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * ($phi) " +
          s"- (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * sin(2.0 * ($phi)) " +
          s"+ (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * sin(4.0 * ($phi)) " +
          s"- (35.0 * e6 / 3072.0) * sin(6.0 * ($phi)))"
      def mSql(phi: String): String =
        s"cos($phi) / sqrt(1.0 - e2 * sin($phi) * sin($phi))"
      s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      e0 AS (SELECT f * (2.0 - f) AS e2 FROM (SELECT 1.0 / 298.257223563 AS f)),
      e1 AS (SELECT e2, e2 * e2 AS e4, e2 * e2 * e2 AS e6 FROM e0),
      -- Cassini-Soldner (lat0 10, lon0 -61.5): Snyder 13-7/13-8
      ca AS (SELECT c_custkey, '+proj=cass +lat_0=10 +lon_0=-61.5' AS code, gx, gy
        FROM (SELECT c_custkey,
            6378137.0 / sqrt(1.0 - e2 * sin(phi) * sin(phi)) * aa *
              (1.0 - t * aa * aa / 6.0
               - (8.0 - t + 8.0 * cc) * t * aa * aa * aa * aa / 120.0) AS gx,
            ${mArcSql("phi")} - m0 +
              6378137.0 / sqrt(1.0 - e2 * sin(phi) * sin(phi)) *
                (sin(phi) / cos(phi)) * (aa * aa / 2.0
                  + (5.0 - t + 6.0 * cc) * aa * aa * aa * aa / 24.0) AS gy
          FROM (SELECT c_custkey, e2, e4, e6, phi,
                  (lam - radians(-61.5)) * cos(phi) AS aa,
                  (sin(phi) / cos(phi)) * (sin(phi) / cos(phi)) AS t,
                  e2 * cos(phi) * cos(phi) / (1.0 - e2) AS cc,
                  ${mArcSql("radians(10.0)")} AS m0
                FROM (SELECT c_custkey, e2, e4, e6,
                        radians(cx / 4000.0 - 62.8) AS lam,
                        radians(cy / 250.0 + 8.5) AS phi
                      FROM p, e1)))),
      -- Equidistant conic (lat0 23, lon0 -96, SPs 29.5/45.5): Snyder 16-x
      eq AS (SELECT c_custkey,
          '+proj=eqdc +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5' AS code,
          rho * sin(nc * (lam - radians(-96.0))) AS gx,
          rho0 - rho * cos(nc * (lam - radians(-96.0))) AS gy
        FROM (SELECT c_custkey, lam, nc,
                6378137.0 * gg - ${mArcSql("phi")} AS rho,
                6378137.0 * gg - ${mArcSql("radians(23.0)")} AS rho0
          FROM (SELECT c_custkey, e2, e4, e6, lam, phi, nc,
                  ${mSql("radians(29.5)")} / nc + ${mArcSql("radians(29.5)")} / 6378137.0 AS gg
            FROM (SELECT c_custkey, e2, e4, e6, lam, phi,
                    6378137.0 * (${mSql("radians(29.5)")} - ${mSql("radians(45.5)")})
                      / (${mArcSql("radians(45.5)")} - ${mArcSql("radians(29.5)")}) AS nc
                  FROM (SELECT c_custkey, e2, e4, e6,
                          radians(cx / 250.0 - 118.0) AS lam,
                          radians(cy / 40.0 + 22.0) AS phi
                        FROM p, e1))))),
      -- American polyconic (lat0 0, lon0 -54): Snyder 18-12..18-15
      po AS (SELECT c_custkey, '+proj=poly +lat_0=0 +lon_0=-54' AS code,
          6378137.0 / sqrt(1.0 - e2 * sin(phi) * sin(phi)) *
            (cos(phi) / sin(phi)) * sin((lam - radians(-54.0)) * sin(phi)) AS gx,
          ${mArcSql("phi")} - 0.0 +
            6378137.0 / sqrt(1.0 - e2 * sin(phi) * sin(phi)) *
              (cos(phi) / sin(phi)) *
              (1.0 - cos((lam - radians(-54.0)) * sin(phi))) AS gy
        FROM (SELECT c_custkey, e2, e4, e6,
                radians(cx / 1000.0 - 59.0) AS lam,
                radians(cy / 40.0 + 5.0) AS phi
              FROM p, e1)),
      -- Bonne (lat1 45, lon0 10): Snyder 19-1..19-6
      bo AS (SELECT c_custkey, '+proj=bonne +lat_1=45 +lon_0=10' AS code,
          rho * sin(6378137.0 * ${mSql("phi")} * (lam - radians(10.0)) / rho) AS gx,
          cot1 - rho * cos(6378137.0 * ${mSql("phi")} * (lam - radians(10.0)) / rho) AS gy
        FROM (SELECT c_custkey, e2, e4, e6, lam, phi, cot1,
                cot1 + ${mArcSql("radians(45.0)")} - ${mArcSql("phi")} AS rho
          FROM (SELECT c_custkey, e2, e4, e6, lam, phi,
                  6378137.0 * ${mSql("radians(45.0)")} / sin(radians(45.0)) AS cot1
                FROM (SELECT c_custkey, e2, e4, e6,
                        radians(cx / 150.0 - 27.0) AS lam,
                        radians(cy / 25.0 + 12.0) AS phi
                      FROM p, e1))))
      SELECT c_custkey, code, round(gx, 3) AS gx, round(gy, 3) AS gy,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM (SELECT * FROM ca UNION ALL SELECT * FROM eq
            UNION ALL SELECT * FROM po UNION ALL SELECT * FROM bo)
      ORDER BY c_custkey, code"""
    },

    // r12 WKT2 CRS routing: all three spellings (record / WKT1 / WKT2)
    // resolve to the same TM kernel, so the cross-route deltas are exactly
    // 0 and the forward is the g62-style Snyder TM mirror on WGS84
    // PROJJSON route vs proj record are the SAME kernel -> deltas are
    // exactly 0; roundtrip closes at 5 dp
    "g99_projjson_crs" -> s"""
      SELECT c_custkey, 0.0::DOUBLE AS d_json,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM ($custPts) ORDER BY c_custkey""",

    "g88_wkt2_crs" -> s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      x AS (SELECT c_custkey,
              cx / 3000.0 + 13.5 AS lon, cy / 250.0 + 38.0 AS lat,
              radians(cx / 3000.0 + 13.5) AS lam,
              radians(cy / 250.0 + 38.0) AS phi,
              radians(15.0) AS lam0
            FROM p),
      e0 AS (SELECT f * (2.0 - f) AS e2 FROM (SELECT 1.0 / 298.257223563 AS f)),
      e1 AS (SELECT e2, e2 / (1.0 - e2) AS ep2, e2 * e2 AS e4,
                    e2 * e2 * e2 AS e6 FROM e0),
      q1 AS (SELECT x.*, e2, ep2, e4, e6,
               sin(phi) AS sphi, cos(phi) AS cphi, tan(phi) AS tphi
             FROM x, e1),
      q2 AS (SELECT *, 6378137.0 / sqrt(1.0 - e2 * sphi * sphi) AS n,
                    tphi * tphi AS t, ep2 * cphi * cphi AS c,
                    (lam - lam0) * cphi AS aa FROM q1),
      q3 AS (SELECT *, 6378137.0 * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                    - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * sin(2.0 * phi)
                    + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * sin(4.0 * phi)
                    - (35.0 * e6 / 3072.0) * sin(6.0 * phi)) AS m FROM q2),
      q4 AS (SELECT *,
               0.9996 * n * (aa + (1.0 - t + c) * aa * aa * aa / 6.0
                 + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * pow(aa, 5) / 120.0)
                 + 500000.0 AS mx,
               0.9996 * (m + n * tphi * (aa * aa / 2.0
                 + (5.0 - t + 9.0 * c + 4.0 * c * c) * pow(aa, 4) / 24.0
                 + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2)
                   * pow(aa, 6) / 720.0)) AS my
             FROM q3)
      SELECT c_custkey, round(mx, 3) AS gx, round(my, 3) AS gy,
             0.0::DOUBLE AS d_wkt1, 0.0::DOUBLE AS d_rec,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM q4 ORDER BY c_custkey""",

    // r11 geography: haversine on the IUGG mean radius mirrored with the
    // SAME double expression structure as the kernel; the Vincenty columns
    // are contract booleans (flattening-scale agreement, line length ==
    // endpoint geodesic)
    "g83_geography" -> s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      b AS (SELECT c_custkey,
              cx / 100.0 - 50.0 AS lon1, cy / 25.0 + 10.0 AS lat1,
              (cx / 100.0 - 50.0) + 3.0 + (c_custkey % 7)::DOUBLE AS lon2,
              (cy / 25.0 + 10.0) - 5.0 + (c_custkey % 11)::DOUBLE AS lat2
            FROM p),
      h AS (SELECT c_custkey,
              radians(lat1) AS p1, radians(lat2) AS p2,
              radians(lat2) - radians(lat1) AS dp,
              radians(lon2 - lon1) AS dl
            FROM b),
      x AS (SELECT c_custkey,
              sin(dp / 2) * sin(dp / 2) +
                cos(p1) * cos(p2) * sin(dl / 2) * sin(dl / 2) AS hav
            FROM h)
      SELECT c_custkey,
             round(2.0 * 6371008.8 * asin(least(1.0, sqrt(hav))), 3) AS sphere_m,
             true AS spheroid_ok,
             true AS len_eq,
             true AS azimuth_ok
      FROM x ORDER BY c_custkey""",

    // snap-to-grid: identical floor-rounding arithmetic; sliver collapse
    // and the offset-rectangle area are closed form
    "g100_snaptogrid" -> """
      SELECT s_suppkey,
             round(floor((ox / 7.3) / 0.5 + 0.5) * 0.5, 6) AS sx,
             round(floor((oy / 3.1) / 0.5 + 0.5) * 0.5, 6) AS sy,
             round((w + 1.0) * (h + 1.0), 6) AS snap_area,
             true AS sliver_empty
      FROM (SELECT s_suppkey,
              ((s_suppkey % 5) + 2)::DOUBLE AS w,
              ((s_suppkey % 4) + 1)::DOUBLE AS h,
              (s_suppkey % 13)::DOUBLE * 3.0 AS ox,
              (s_suppkey % 11)::DOUBLE * 3.0 AS oy
            FROM supplier)
      ORDER BY s_suppkey""",

    // DBSCAN: the full semantics re-derived in SQL — eps-pairs by the SAME
    // squared-distance compare (60*60 = 3600.0 exact), include-self counts,
    // recursive-CTE closure over core-core edges, min-label borders
    "g101_dbscan" -> """
      WITH RECURSIVE
      pts AS (SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS x,
                     CAST(c_custkey % 1000 AS DOUBLE) AS y FROM customer),
      prs AS (SELECT a.id AS id_a, b.id AS id_b FROM pts a JOIN pts b
              ON a.id < b.id
              AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 3600.0),
      und AS (SELECT id_a AS id, id_b AS nb FROM prs
              UNION ALL SELECT id_b, id_a FROM prs),
      cnt AS (SELECT id, count(*) AS n FROM und GROUP BY id),
      core AS (SELECT p.id, coalesce(cnt.n, 0) + 1 >= 3 AS is_core
               FROM pts p LEFT JOIN cnt ON p.id = cnt.id),
      ce AS (SELECT id_a AS a, id_b AS b FROM prs
             JOIN core ca ON ca.id = prs.id_a AND ca.is_core
             JOIN core cb ON cb.id = prs.id_b AND cb.is_core),
      e AS (SELECT a, b FROM ce UNION SELECT b, a FROM ce),
      reach(a, b) AS (SELECT a, b FROM e
                      UNION SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a),
      lab AS (SELECT a AS id, least(a, min(b)) AS lbl FROM reach GROUP BY a),
      corelab AS (SELECT c.id, coalesce(l.lbl, c.id) AS lbl
                  FROM core c LEFT JOIN lab l ON c.id = l.id WHERE c.is_core),
      brd AS (SELECT u.id, min(cl.lbl) AS lbl FROM und u
              JOIN corelab cl ON u.nb = cl.id
              JOIN core c ON c.id = u.id AND NOT c.is_core
              GROUP BY u.id)
      SELECT CAST(p.id AS BIGINT) AS c_custkey, c.is_core,
             CAST(coalesce(corelab.lbl, brd.lbl) AS BIGINT) AS cluster_id
      FROM pts p JOIN core c ON p.id = c.id
      LEFT JOIN corelab ON p.id = corelab.id
      LEFT JOIN brd ON p.id = brd.id
      ORDER BY c_custkey""",

    // cluster-within: transitive closure over the dwithin pairs (the kernel
    // compares sqrt(dx^2+dy^2) <= d; 70.0 and 4900.0 are exact doubles so
    // the sqrt form mirrors bit-for-bit), min member id as the label
    "g102_cluster_within" -> """
      WITH RECURSIVE
      pts AS (SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS x,
                     CAST(c_custkey % 1000 AS DOUBLE) AS y FROM customer),
      prs AS (SELECT a.id AS id_a, b.id AS id_b FROM pts a JOIN pts b
              ON a.id < b.id
              AND sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) <= 70.0),
      e AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION SELECT id_b, id_a FROM prs),
      reach(a, b) AS (SELECT a, b FROM e
                      UNION SELECT reach.a, e.b FROM reach JOIN e ON reach.b = e.a),
      lab AS (SELECT a AS id, least(a, min(b)) AS lbl FROM reach GROUP BY a)
      SELECT CAST(p.id AS BIGINT) AS c_custkey,
             CAST(coalesce(lab.lbl, p.id) AS BIGINT) AS cluster_id
      FROM pts p LEFT JOIN lab ON p.id = lab.id
      ORDER BY c_custkey""",

    // farthest corner closed form: probe below-left -> opposite corner
    "g108_longest_line" -> """
      SELECT s_suppkey,
             round(sqrt((w + 3.0) * (w + 3.0) + (h + 2.0) * (h + 2.0)), 6) AS maxd,
             ox + w AS fx, oy + h AS fy,
             true AS len_eq,
             round(atan2(w, h) - atan2(-3.0, -2.0), 9) AS ang
      FROM (SELECT s_suppkey,
              ((s_suppkey % 5) + 2)::DOUBLE AS w,
              ((s_suppkey % 4) + 1)::DOUBLE AS h,
              (s_suppkey % 13)::DOUBLE * 3.0 AS ox,
              (s_suppkey % 11)::DOUBLE * 3.0 AS oy
            FROM supplier)
      ORDER BY s_suppkey""",

    // Weiszfeld unrolled: mean start, three weighted updates per group,
    // DISTINCT matching the collect-agg point dedupe
    "g107_geometric_median" -> """
      WITH p AS (SELECT DISTINCT c_custkey % 7 AS grp, c_acctbal::DOUBLE AS x,
                        (c_custkey % 1000)::DOUBLE AS y FROM customer),
      c0 AS (SELECT grp, avg(x) AS cx, avg(y) AS cy, count(*)::BIGINT AS n
             FROM p GROUP BY grp),
      d1 AS (SELECT p.grp, p.x, p.y,
               sqrt((p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy)) AS d
             FROM p JOIN c0 c ON p.grp = c.grp),
      c1 AS (SELECT grp, sum(x/d)/sum(1.0/d) AS cx, sum(y/d)/sum(1.0/d) AS cy
             FROM d1 GROUP BY grp),
      d2 AS (SELECT p.grp, p.x, p.y,
               sqrt((p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy)) AS d
             FROM p JOIN c1 c ON p.grp = c.grp),
      c2 AS (SELECT grp, sum(x/d)/sum(1.0/d) AS cx, sum(y/d)/sum(1.0/d) AS cy
             FROM d2 GROUP BY grp),
      d3 AS (SELECT p.grp, p.x, p.y,
               sqrt((p.x-c.cx)*(p.x-c.cx) + (p.y-c.cy)*(p.y-c.cy)) AS d
             FROM p JOIN c2 c ON p.grp = c.grp),
      c3 AS (SELECT grp, sum(x/d)/sum(1.0/d) AS cx, sum(y/d)/sum(1.0/d) AS cy
             FROM d3 GROUP BY grp)
      SELECT c0.grp, round(c3.cx, 6) AS mx, round(c3.cy, 6) AS my, c0.n AS npts
      FROM c0 JOIN c3 ON c0.grp = c3.grp
      ORDER BY c0.grp""",

    // Chaikin closed forms: corner-triangle area deficit, exact quarter-
    // blend perimeter/length, vertex-count doubling, convex nesting
    "g105_chaikin" -> """
      SELECT s_suppkey,
             9::BIGINT AS n1,
             round(7.0 * w * h / 8.0, 6) AS area1,
             round(w + h + sqrt(w * w + h * h), 6) AS perim1,
             17::BIGINT AS n2,
             true AS nested_ok,
             4::BIGINT AS nl,
             round(0.75 * (w + h) + sqrt(w * w + h * h) / 4.0, 6) AS len1
      FROM (SELECT s_suppkey,
              ((s_suppkey % 5) + 2)::DOUBLE AS w,
              ((s_suppkey % 4) + 1)::DOUBLE AS h
            FROM supplier)
      ORDER BY s_suppkey""",

    // k-means replayed exactly: md5-pinned init, two Lloyd updates on
    // round(.,6) centroids, argmin with (distance, cluster-id) ordering
    "g104_cluster_kmeans" -> """
      WITH p AS (SELECT c_custkey AS id, c_acctbal::DOUBLE AS x,
                        (c_custkey % 1000)::DOUBLE AS y FROM customer),
      h AS (SELECT id, x, y,
              ('0x' || substr(md5('km:' || id::VARCHAR), 1, 16))::UBIGINT
                % 1000000000 AS hk FROM p),
      c0 AS (SELECT (row_number() OVER (ORDER BY hk, id) - 1)::INT AS c,
                    round(x, 6) AS cx, round(y, 6) AS cy
             FROM h ORDER BY hk, id LIMIT 4),
      a1 AS (SELECT id, x, y, c FROM (
               SELECT p.id, p.x, p.y, c0.c,
                      row_number() OVER (PARTITION BY p.id ORDER BY
                        (p.x-c0.cx)*(p.x-c0.cx)+(p.y-c0.cy)*(p.y-c0.cy), c0.c) AS rn
               FROM p CROSS JOIN c0) WHERE rn = 1),
      m1 AS (SELECT c, round(avg(x), 6) AS cx, round(avg(y), 6) AS cy
             FROM a1 GROUP BY c),
      c1 AS (SELECT c0.c AS c, coalesce(m1.cx, c0.cx) AS cx,
                    coalesce(m1.cy, c0.cy) AS cy
             FROM c0 LEFT JOIN m1 ON c0.c = m1.c),
      a2 AS (SELECT id, x, y, c FROM (
               SELECT p.id, p.x, p.y, c1.c,
                      row_number() OVER (PARTITION BY p.id ORDER BY
                        (p.x-c1.cx)*(p.x-c1.cx)+(p.y-c1.cy)*(p.y-c1.cy), c1.c) AS rn
               FROM p CROSS JOIN c1) WHERE rn = 1),
      m2 AS (SELECT c, round(avg(x), 6) AS cx, round(avg(y), 6) AS cy
             FROM a2 GROUP BY c),
      c2 AS (SELECT c1.c AS c, coalesce(m2.cx, c1.cx) AS cx,
                    coalesce(m2.cy, c1.cy) AS cy
             FROM c1 LEFT JOIN m2 ON c1.c = m2.c),
      fin AS (SELECT id, c FROM (
               SELECT p.id, c2.c,
                      row_number() OVER (PARTITION BY p.id ORDER BY
                        (p.x-c2.cx)*(p.x-c2.cx)+(p.y-c2.cy)*(p.y-c2.cy), c2.c) AS rn
               FROM p CROSS JOIN c2) WHERE rn = 1)
      SELECT id AS c_custkey, c AS cluster_id FROM fin
      ORDER BY c_custkey""",

    // geodesic buffer: the ring-at-distance-r value check is closed form
    // from the key (the aeqd construction makes every vertex sit at
    // geodesic distance r, so the rounded mean IS r); vertex count is the
    // 64-gon + closing vertex; the area/containment checks are Spark-side
    // contract booleans
    "g103_buffer_geodesic" -> """
      SELECT c_custkey,
             CAST(50000.0 + (c_custkey % 5) * 10000.0 AS DOUBLE) AS r,
             65::BIGINT AS nvert,
             CAST(50000.0 + (c_custkey % 5) * 10000.0 AS DOUBLE) AS ring_m,
             true AS ring_ok, true AS area_ok, true AS contains_ok
      FROM customer WHERE c_custkey % 37 = 0
      ORDER BY c_custkey""",

    // triangulation: counts and partitioned areas are pure closed form
    "g98_triangulate" -> """
      SELECT s_suppkey,
             2::INT AS n_tri_rect, 8::INT AS n_tri_holed,
             round(w * h, 6) AS area_rect,
             round(6.0 * w * h, 6) AS area_holed
      FROM (SELECT s_suppkey,
              ((s_suppkey % 5) + 2)::DOUBLE AS w,
              ((s_suppkey % 4) + 1)::DOUBLE AS h
            FROM supplier)
      ORDER BY s_suppkey""",

    // closed-form inscribed-circle radii (same arithmetic); the search
    // columns are contract booleans
    "g97_max_inscribed_circle" -> """
      SELECT s_suppkey,
             least(w, h) / 2.0 AS rect_r_exact,
             greatest(least(w / 2.0, h), h / 4.0,
               CASE WHEN w + h / 2.0 - sqrt(w * h) <= h / 2.0
                    THEN w + h / 2.0 - sqrt(w * h) ELSE 0.0 END)
               AS hole_r_exact,
             true AS ok_rect, true AS ok_hole,
             true AS ok_center_rect, true AS ok_center_holed
      FROM (SELECT s_suppkey,
              ((s_suppkey % 5) + 2)::DOUBLE AS w,
              ((s_suppkey % 4) + 1)::DOUBLE AS h
            FROM supplier)
      ORDER BY s_suppkey""",

    // sphere destination mirrored term-by-term (same closed form, same
    // clamp, same wrap); spheroid columns are direct⊣inverse contracts
    "g96_project_geodesic" -> s"""
      WITH p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      b AS (SELECT c_custkey,
              cx / 100.0 - 50.0 AS lon1, cy / 25.0 + 10.0 AS lat1,
              50000.0 + (c_custkey % 97)::DOUBLE * 3000.0 AS d,
              radians((c_custkey % 360)::DOUBLE) AS az
            FROM p),
      s AS (SELECT c_custkey, lon1, az,
              d / 6371008.8 AS dd, radians(lat1) AS p1
            FROM b),
      t AS (SELECT c_custkey, lon1, az, dd, p1,
              sin(p1) * cos(dd) + cos(p1) * sin(dd) * cos(az) AS sp2
            FROM s),
      u AS (SELECT c_custkey,
              asin(greatest(-1.0::DOUBLE, least(1.0::DOUBLE, sp2))) AS phi2,
              radians(lon1)
                + atan2(sin(az) * sin(dd) * cos(p1), cos(dd) - sin(p1) * sp2)
                AS lam2
            FROM t),
      v AS (SELECT c_custkey, degrees(phi2) AS lat2,
              CASE WHEN degrees(lam2) > 180.0 THEN degrees(lam2) - 360.0
                   WHEN degrees(lam2) < -180.0 THEN degrees(lam2) + 360.0
                   ELSE degrees(lam2) END AS lon2
            FROM u)
      SELECT c_custkey, round(lon2, 6) AS s_lon, round(lat2, 6) AS s_lat,
             true AS ok_dist, true AS ok_az, true AS ok_agree
      FROM v ORDER BY c_custkey""",

    // generic TM forward (Snyder 8-9..8-25, GRS80, lat0=0 -> M0=0)
    // mirrored term by term over the same per-code parameter rows the
    // Spark query broadcasts; roundtrip deltas are exactly 0 at 5 dp
    "g62_proj_grids" -> s"""
      WITH g AS (SELECT * FROM (VALUES
          ('EPSG:28355', 147.0, -30.0, 500000.0, 10000000.0),
          ('EPSG:2193', 173.0, -41.0, 1600000.0, 10000000.0),
          ('EPSG:26915', -93.0, 40.0, 500000.0, 0.0),
          ('+proj=tmerc +lon_0=147 +k=0.9996 +x_0=500000 +y_0=10000000 +ellps=GRS80',
            147.0, -30.0, 500000.0, 10000000.0))
        AS t(code, lon0, latc, fe, fn)),
      p AS (SELECT c_custkey, cx, cy FROM ($custPts)),
      x AS (SELECT c_custkey, code, fe, fn,
              lon0 + cx / 3000.0 - 1.5 AS lon,
              latc + cy / 250.0 - 2.0 AS lat,
              radians(lon0 + cx / 3000.0 - 1.5) AS lam,
              radians(latc + cy / 250.0 - 2.0) AS phi,
              radians(lon0) AS lam0
            FROM p CROSS JOIN g),
      e0 AS (SELECT f * (2.0 - f) AS e2 FROM (SELECT 1.0 / 298.257222101 AS f)),
      e1 AS (SELECT e2, e2 / (1.0 - e2) AS ep2, e2 * e2 AS e4,
                    e2 * e2 * e2 AS e6 FROM e0),
      q1 AS (SELECT x.*, e2, ep2, e4, e6,
               sin(phi) AS sphi, cos(phi) AS cphi, tan(phi) AS tphi
             FROM x, e1),
      q2 AS (SELECT *, 6378137.0 / sqrt(1.0 - e2 * sphi * sphi) AS n,
                    tphi * tphi AS t, ep2 * cphi * cphi AS c,
                    (lam - lam0) * cphi AS aa FROM q1),
      q3 AS (SELECT *, 6378137.0 * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
                    - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * sin(2.0 * phi)
                    + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * sin(4.0 * phi)
                    - (35.0 * e6 / 3072.0) * sin(6.0 * phi)) AS m FROM q2),
      q4 AS (SELECT *,
               0.9996 * n * (aa + (1.0 - t + c) * aa * aa * aa / 6.0
                 + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * pow(aa, 5) / 120.0)
                 + fe AS mx,
               fn + 0.9996 * (m + n * tphi * (aa * aa / 2.0
                 + (5.0 - t + 9.0 * c + 4.0 * c * c) * pow(aa, 4) / 24.0
                 + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2)
                   * pow(aa, 6) / 720.0)) AS my
             FROM q3)
      SELECT c_custkey, code, round(mx, 3) AS gx, round(my, 3) AS gy,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat
      FROM q4 ORDER BY c_custkey, code""",

    // trained-IVF recall gate: the oracle asserts the CONTRACT (every
    // fair query keeps >= half its true top-10; aggregate recall >= 90%)
    // rather than re-deriving k-means in SQL — the counts are integers
    // over deterministic neighbor sets, so the compare is exact
    // PQ-retrieve + exact-refine recall gate, same contract style as e06:
    // integer hit counts over deterministic neighbor sets, exact compare
    "e08_ann_pq" -> """
      SELECT count(*)::BIGINT AS n_queries,
             count(*)::BIGINT AS queries_ge_half,
             true AS recall_ge_90
      FROM embeddings WHERE vec_id >= 200 AND vec_id < 210""",

    // streaming serving vs batch IVF-PQ: exact-constant contract (t52
    // style) — n_queries from the static side, pair-identical retrieval
    "e13_stream_ann_ivfpq" -> """
      SELECT count(*)::BIGINT AS n_queries, true AS pairs_match
      FROM embeddings WHERE vec_id >= 400 AND vec_id < 410""",

    // incremental index maintenance: delta sizes are planted constants
    // (10 added + 10 changed, 10 deleted) and the three gates are
    // incremental==full identities the Spark side proves exactly
    "e14_ann_incremental" -> """
      SELECT 20::BIGINT AS n_delta, 10::BIGINT AS n_deleted,
             true AS encode_identical, true AS retrieval_identical,
             true AS deleted_never_returns""",

    // index persistence roundtrip: every output is a structural constant
    // (index shape; exact-roundtrip and identical-retrieval gates)
    "e12_ann_index_roundtrip" -> """
      SELECT 8::BIGINT AS n_centroids, 128::BIGINT AS n_codewords,
             8::BIGINT AS m, true AS roundtrip_exact,
             true AS retrieval_identical""",

    // IVF-PQ-retrieve + exact-refine recall gate, same contract style as
    // e06/e08: integer hit counts over deterministic neighbor sets
    "e11_ann_ivfpq" -> """
      SELECT count(*)::BIGINT AS n_queries,
             count(*)::BIGINT AS queries_ge_half,
             true AS recall_ge_90
      FROM embeddings WHERE vec_id >= 400 AND vec_id < 410""",

    // SQ8-retrieve + exact-refine recall gate, same contract style
    "e09_ann_sq8" -> """
      SELECT count(*)::BIGINT AS n_queries,
             count(*)::BIGINT AS queries_ge_half,
             true AS recall_ge_90
      FROM embeddings WHERE vec_id >= 300 AND vec_id < 310""",

    "e06_ann_ivf_trained" -> """
      SELECT count(*)::BIGINT AS n_queries,
             count(*)::BIGINT AS queries_ge_half,
             true AS recall_ge_90
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 110""",

    // adversarial overlay closed forms: every Spark-side column is a
    // ratio against the exact value (or an exact degenerate measure), so
    // the oracle is arithmetic only — sliver ratios 1.0, the shared-edge
    // intersection has area 0 and length w (ratio 1.0), the shared-vertex
    // intersection has area 0 with touches/intersects both true
    "g63_overlay_adversarial" -> """
      SELECT s_suppkey,
             1.0::DOUBLE AS i_sliver, 1.0::DOUBLE AS u_sliver,
             1.0::DOUBLE AS d_sliver, 0.0::DOUBLE AS itri_area,
             1.0::DOUBLE AS itri_len, true AS tri_touches,
             1.0::DOUBLE AS u_tri, 0.0::DOUBLE AS ivert_area,
             true AS dia_touches, true AS dia_intersects,
             1.0::DOUBLE AS i_col, 1.0::DOUBLE AS sd_col
      FROM supplier ORDER BY s_suppkey""",

    "g61_makevalid_node_precision" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h
                 FROM supplier)
      SELECT s_suppkey,
        4 AS n_noded,
        round(2 * sqrt(w * w + h * h), 6) AS noded_len,
        false AS valid_before,
        'Self-intersection' AS reason17,
        round(w * h / 2, 6) AS mv_area,
        2 AS mv_parts,
        true AS valid_after,
        9.5::DOUBLE AS z3,
        round(w + 0.5, 6) AS sp_x
      FROM p ORDER BY s_suppkey""",

    "g60_polygonize_sharedpaths" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 3)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h
                 FROM supplier)
      SELECT s_suppkey,
        2 AS n_polys,
        round(w * h, 6) AS pz_total,
        round(w * h - 1, 6) AS pz_max,
        2 AS n_faces,
        round(w * h, 6) AS face_total,
        round(w, 6) AS same_len,
        0.0::DOUBLE AS opp_len_b,
        round(w, 6) AS opp_len_c
      FROM p ORDER BY s_suppkey""",

    "g59_voronoi_concave" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h
                 FROM supplier),
           q AS (SELECT *, greatest(w, h) AS m FROM p)
      SELECT s_suppkey,
        4 AS n_cells,
        round((w + 2 * m) * (h + 2 * m), 6) AS vor_total,
        round((w / 2 + m) * (h / 2 + m), 6) AS cell1_area,
        true AS site1_in,
        round((w * h + w + h - 1) / 2, 6) AS cvx_area,
        true AS ch_le,
        true AS ch_covers,
        true AS ch_pos
      FROM q ORDER BY s_suppkey""",

    "g58_normalize_snap_clearance" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2) AS w,
                   ((s_suppkey % 7) + 3) AS h
                 FROM supplier)
      SELECT s_suppkey,
        true AS ccw,
        false AS cw,
        'POLYGON ((0 0, 0 ' || h || ', ' || w || ' ' || h || ', ' ||
          w || ' 0, 0 0))' AS norm_wkt,
        3 AS n_snap,
        0.05::DOUBLE AS snap_y,
        round(h / 10.0, 6) AS mc,
        10.0::DOUBLE AS mc_line
      FROM p ORDER BY s_suppkey""",

    "g56_gml" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, s_name, s_acctbal AS bal,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY s_suppkey""",

    // app-schema GML roundtrip: nested props flatten to dotted keys, the
    // urn-4326 lat/lon axis order swaps out and back — coordinates are the
    // g64 supplier lon/lat anchor, an exact double identity on both engines
    "g111_gml_appschema" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, s_name,
             s_acctbal::DOUBLE AS bal,
             round(s_acctbal / 100.0 - 40.0, 9) AS lon,
             round((s_suppkey % 100)::DOUBLE * 10.0 / 20.0 - 20.0, 9) AS lat
      FROM supplier ORDER BY s_suppkey""",

    // GPX waypoint roundtrip: lon/lat derived from the supplier synthetic
    // anchor; the writer's shortest-exact Double.toString plus the
    // reader's parseDouble are an identity, so 9-dp rounding is exact
    // buffer styles: flat = 2rL; square = 2rL + 4r^2 (half-square per
    // end); right-angle elbow rect union = 4rL - r^2, bevel adds r^2/2,
    // mitre fills the full corner square
    // r12 geodesic dwithin join: full cross-join haversine mirror with the
    // kernel's EXACT double expression structure (p1/p2 radians, dp = p2 -
    // p1, dl = radians(lon2 - lon1), left-associated products,
    // 2*R*asin(least(1, sqrt(h)))) so the 100 km boundary decides
    // identically on both engines
    "g90_sjoin_dwithin_sphere" -> s"""
      WITH c AS (SELECT c_custkey, cx / 200.0 AS lon, 20.0 + cy / 20.0 AS lat
                 FROM ($custPts)),
      s AS (SELECT s_suppkey, s_acctbal / 200.0 AS lon,
              20.0 + ((s_suppkey % 100)::DOUBLE * 10.0) / 20.0 AS lat
            FROM supplier),
      p AS (SELECT c.c_custkey,
              2.0 * 6371008.8 * asin(least(1.0, sqrt(
                sin((radians(s.lat) - radians(c.lat)) / 2.0)
                  * sin((radians(s.lat) - radians(c.lat)) / 2.0)
                + cos(radians(c.lat)) * cos(radians(s.lat))
                  * sin(radians(s.lon - c.lon) / 2.0)
                  * sin(radians(s.lon - c.lon) / 2.0)))) AS dist
            FROM c, s)
      SELECT c_custkey, count(*)::BIGINT AS n_near,
             round(min(dist), 2) AS min_dist_m
      FROM p WHERE dist <= 100000.0
      GROUP BY c_custkey ORDER BY c_custkey""",

    // r12 geodesic nearest (how=left): same haversine mirror as g90 +
    // rank window, radius-misses as null suppliers
    "g91_sjoin_nearest_sphere" -> s"""
      WITH c AS (SELECT c_custkey, cx / 200.0 AS lon, 20.0 + cy / 20.0 AS lat
                 FROM ($custPts)),
      s AS (SELECT s_suppkey, s_acctbal / 200.0 AS lon,
              20.0 + ((s_suppkey % 100)::DOUBLE * 10.0) / 20.0 AS lat
            FROM supplier),
      p AS (SELECT c.c_custkey, s.s_suppkey,
              2.0 * 6371008.8 * asin(least(1.0, sqrt(
                sin((radians(s.lat) - radians(c.lat)) / 2.0)
                  * sin((radians(s.lat) - radians(c.lat)) / 2.0)
                + cos(radians(c.lat)) * cos(radians(s.lat))
                  * sin(radians(s.lon - c.lon) / 2.0)
                  * sin(radians(s.lon - c.lon) / 2.0)))) AS dist
            FROM c, s),
      f AS (SELECT c_custkey, s_suppkey, dist,
              rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
            FROM p WHERE dist <= 300000.0)
      SELECT c.c_custkey, f.s_suppkey, round(f.dist, 2) AS dist_m
      FROM (SELECT DISTINCT c_custkey FROM c) c
      LEFT JOIN (SELECT * FROM f WHERE rk = 1) f USING (c_custkey)
      ORDER BY c_custkey, s_suppkey""",

    // r12 subdivide contract: tiles partition the buffer exactly, respect
    // the vertex cap, and a 97-vertex input at cap 16 must split
    "g89_subdivide" -> """
      SELECT s_suppkey, 1.0::DOUBLE AS area_ratio,
             true AS caps_ok, true AS multi
      FROM supplier ORDER BY s_suppkey""",

    "g73_buffer_styles" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 7) + 10)::DOUBLE AS len,
                   ((s_suppkey % 3) + 1)::DOUBLE AS r
                 FROM supplier)
      SELECT s_suppkey,
             round(2 * r * len, 6) AS flat_area,
             round(2 * r * len + 4 * r * r, 6) AS square_area,
             round(4 * r * len - 0.5 * r * r, 6) AS bevel_area,
             round(4 * r * len, 6) AS mitre_area
      FROM p ORDER BY s_suppkey""",

    // Krovak forward mirrored term-by-term (EPSG GN7-2 formulas, Bessel
    // 1841, EPSG:5514 parameters, East-North = negated southing/westing);
    // roundtrip deltas are identically 0 at 5 dp
    "g71_krovak" -> s"""
      WITH cst AS (
        SELECT 1.0 / 299.1528128 AS fl
      ), c2 AS (
        SELECT fl, fl * (2 - fl) AS e2, sqrt(fl * (2 - fl)) AS e,
               radians(49.5) AS phic, radians(24.0 + 50.0 / 60.0) AS lam0,
               radians(30.0 + 17.0 / 60.0 + 17.3031 / 3600.0) AS alphac,
               radians(78.5) AS phip
        FROM cst
      ), c3 AS (
        SELECT *,
          6377397.155 * sqrt(1 - e2) / (1 - e2 * sin(phic) * sin(phic)) AS biga,
          sqrt(1 + e2 * pow(cos(phic), 4) / (1 - e2)) AS bigb
        FROM c2
      ), c4 AS (
        SELECT *, asin(sin(phic) / bigb) AS gamma0, sin(phip) AS n,
               0.9999 * biga / tan(phip) AS r0
        FROM c3
      ), c5 AS (
        SELECT *,
          tan(pi() / 4 + gamma0 / 2)
            * pow((1 + e * sin(phic)) / (1 - e * sin(phic)), e * bigb / 2)
            / pow(tan(pi() / 4 + phic / 2), bigb) AS t0
        FROM c4
      ), pts AS (
        SELECT c_custkey,
               radians(12.0 + cx / 2000.0) AS lam,
               radians(48.2 + cy / 400.0) AS phi
        FROM ($custPts)
      ), fwd AS (
        SELECT c_custkey, lam, phi, c5.*,
          2 * (atan(t0 * pow(tan(phi / 2 + pi() / 4), bigb)
              / pow((1 + e * sin(phi)) / (1 - e * sin(phi)), e * bigb / 2))
            - pi() / 4) AS u,
          bigb * (lam0 - lam) AS v
        FROM pts CROSS JOIN c5
      ), f2 AS (
        SELECT *, asin(cos(alphac) * sin(u) + sin(alphac) * cos(u) * cos(v)) AS t
        FROM fwd
      ), f3 AS (
        SELECT *, n * asin(cos(u) * sin(v) / cos(t)) AS theta,
          r0 * pow(tan(pi() / 4 + phip / 2), n) / pow(tan(t / 2 + pi() / 4), n) AS r
        FROM f2
      )
      SELECT c_custkey,
             round(-r * sin(theta), 3) AS gx,
             round(-r * cos(theta), 3) AS gy,
             0.0::DOUBLE AS dlon, 0.0::DOUBLE AS dlat,
             0.0::DOUBLE AS kdlon, 0.0::DOUBLE AS kdlat
      FROM f3 ORDER BY c_custkey""",

    // MIF/MID roundtrip: square-with-hole REGION per supplier. Area =
    // 100 - h^2; vertex count = 5 closed outer + 5 closed hole = 10
    // the TAB quad's float attribute column is IEEE double (exact), the
    // coordinates are integral (exact through the 1e6 transform), so the
    // same closed forms as the MIF route apply
    "g109_mapinfo_tab" -> """
      SELECT s_suppkey, s_name, s_acctbal AS bal,
             (s_suppkey % 2 = 0) AS flag,
             round(100.0::DOUBLE - (((s_suppkey % 5) + 1) * ((s_suppkey % 5) + 1))::DOUBLE, 6) AS area,
             10::BIGINT AS npts
      FROM supplier ORDER BY s_suppkey""",

    "g117_filegdb" -> """
      SELECT s_suppkey, s_name, s_acctbal AS bal,
             (s_suppkey % 2 = 0) AS flag,
             round(100.0::DOUBLE - (((s_suppkey % 5) + 1) * ((s_suppkey % 5) + 1))::DOUBLE, 6) AS area,
             10::BIGINT AS npts
      FROM supplier ORDER BY s_suppkey""",

    "g67_mapinfo" -> """
      SELECT s_suppkey, s_name, s_acctbal AS bal,
             (s_suppkey % 2 = 0) AS flag,
             round(100.0::DOUBLE - (((s_suppkey % 5) + 1) * ((s_suppkey % 5) + 1))::DOUBLE, 6) AS area,
             10::BIGINT AS npts
      FROM supplier ORDER BY s_suppkey""",

    "g64_gpx" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, 'waypoints' AS layer,
             (s_suppkey % 500)::DOUBLE AS ele,
             round(s_acctbal / 100.0 - 40.0, 9) AS lon,
             round((s_suppkey % 100)::DOUBLE * 10.0 / 20.0 - 20.0, 9) AS lat
      FROM supplier ORDER BY s_suppkey""",

    "g51_kml" -> """
      SELECT s_suppkey::BIGINT AS s_suppkey, s_name, s_acctbal AS bal,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY s_suppkey""",

    "g49_flatgeobuf" -> """
      SELECT s_suppkey::BIGINT AS fid, s_name, s_acctbal AS bal,
             CASE WHEN s_suppkey % 7 = 0 THEN NULL
                  ELSE 'n_' || (s_suppkey % 13) END AS note,
             s_acctbal AS x, (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY fid""",

    "g43_shapefile" -> """
      SELECT s_suppkey, s_name, s_acctbal AS x,
             (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY s_suppkey""",

    // stream-static sjoin: boundary-inclusive containment mirror of the
    // grid-bucketed streaming join (st_intersects of envelope and point)
    "g115_stream_sjoin" -> s"""
      WITH c AS ($custPts),
      s AS (SELECT s_suppkey, s_acctbal AS x0,
              (s_suppkey % 100)::DOUBLE * 10.0 AS y0 FROM supplier)
      SELECT s_suppkey, count(*) AS n_pts, sum(c_custkey)::BIGINT AS sum_key
      FROM s JOIN c ON cx >= x0 AND cx <= x0 + 50.0
                   AND cy >= y0 AND cy <= y0 + 40.0
      GROUP BY s_suppkey ORDER BY s_suppkey""",

    // coverage simplify: collinear midpoints drop, corners/junctions
    // survive → per-rect 5 points, per-rect area w*h, union 2*w*h (the
    // seam matches exactly, so union = sum)
    "g113_coverage_simplify" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h
                 FROM supplier)
      SELECT s_suppkey,
             round(2.0 * w * h, 6) AS sum_area,
             10::BIGINT AS sum_npts,
             round(2.0 * w * h, 6) AS union_area
      FROM p ORDER BY s_suppkey""",

    // coverage union: seam midpoint drops, 12 boundary vertices remain
    // (13 coords closed), area 2wh, no holes
    "g114_coverage_union" -> """
      WITH p AS (SELECT s_suppkey,
                   ((s_suppkey % 5) + 2)::DOUBLE AS w,
                   ((s_suppkey % 7) + 3)::DOUBLE AS h
                 FROM supplier)
      SELECT s_suppkey,
             round(2.0 * w * h, 6) AS union_area,
             13::BIGINT AS npts,
             0::BIGINT AS nholes
      FROM p ORDER BY s_suppkey""",

    // coverage validation closed forms: key%3==0 valid pair -> 0,
    // key%3==1 overlapping pair -> 2 overlap + 2 T-node = 4,
    // key%3==2 half-height neighbor -> 1 T-node witness
    "g116_coverage_validate" -> """
      SELECT s_suppkey,
             (CASE s_suppkey % 3 WHEN 0 THEN 0 WHEN 1 THEN 4 ELSE 1 END)::BIGINT
               AS n_witnesses
      FROM supplier ORDER BY s_suppkey""",

    // zipped g43 trio through the .zip dispatch — identical rows
    "g112_zip_readfile" -> """
      SELECT s_suppkey, s_name, s_acctbal AS x,
             (s_suppkey % 100)::DOUBLE * 10.0 AS y
      FROM supplier ORDER BY s_suppkey""",

    "g29_negative_buffer" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 10) + 1)::DOUBLE AS h FROM supplier)
      SELECT s_suppkey,
        round(h * h, 4) AS inner_area,
        0.0::DOUBLE AS collapsed_area,
        true AS collapsed_empty
      FROM p ORDER BY s_suppkey""",

    "g31_topo_union" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 5) + 1)::DOUBLE AS w FROM supplier)
      SELECT s_suppkey,
        round((13.0 * w * w / 4.0)::DOUBLE, 4) AS u_area,
        round((8.0 * w)::DOUBLE, 4) AS u_perim,
        1::BIGINT AS u_parts,
        0::BIGINT AS u_holes,
        round((3.0 * w * w / 4.0)::DOUBLE, 4) AS i_area,
        round((9.0 * w * w / 4.0)::DOUBLE, 4) AS d_area,
        round((5.0 * w * w / 2.0)::DOUBLE, 4) AS sd_area
      FROM p ORDER BY s_suppkey""",

    "g32_topo_holes" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 4) + 1)::DOUBLE AS w FROM supplier)
      SELECT s_suppkey,
        round((29.0 * w * w / 4.0)::DOUBLE, 4) AS d_area,
        round((18.0 * w)::DOUBLE, 4) AS d_perim,
        1::BIGINT AS d_parts,
        1::BIGINT AS d_holes,
        round((33.0 * w * w / 4.0)::DOUBLE, 4) AS u_area,
        1::BIGINT AS u_holes,
        round((3.0 * w * w / 4.0)::DOUBLE, 4) AS i_area
      FROM p ORDER BY s_suppkey""",

    "g36_feather_roundtrip" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    "g45_geoarrow_feather" -> s"""
      SELECT c_custkey, cx, cy FROM ($custPts)
      WHERE cx BETWEEN 1000 AND 5000 AND cy BETWEEN 200 AND 800
      ORDER BY c_custkey""",

    // exact pair set of the hot-cell two-level grid dwithin join: same
    // skewed coordinate formulas, plain cross-join distance filter — any
    // double-emit or drop across the cold/fine union breaks the hash
    "g110_sjoin_hotcell" -> """
      WITH c AS (SELECT c_custkey,
          CASE WHEN c_custkey % 5 < 2 THEN (c_custkey % 89)::DOUBLE * 0.4
               ELSE ((c_custkey * 7) % 9000)::DOUBLE + 100.0 END AS cx,
          CASE WHEN c_custkey % 5 < 2 THEN (c_custkey % 97)::DOUBLE * 0.4
               ELSE ((c_custkey * 13) % 9000)::DOUBLE + 100.0 END AS cy
        FROM customer),
      s AS (SELECT s_suppkey,
          CASE WHEN s_suppkey % 5 < 2 THEN (s_suppkey % 83)::DOUBLE * 0.4
               ELSE ((s_suppkey * 11) % 9000)::DOUBLE + 100.0 END AS sx,
          CASE WHEN s_suppkey % 5 < 2 THEN (s_suppkey % 79)::DOUBLE * 0.4
               ELSE ((s_suppkey * 17) % 9000)::DOUBLE + 100.0 END AS sy
        FROM supplier)
      SELECT c_custkey, s_suppkey::BIGINT AS s_suppkey
      FROM c CROSS JOIN s
      WHERE sqrt((cx - sx)*(cx - sx) + (cy - sy)*(cy - sy)) <= 0.5
      ORDER BY c_custkey, s_suppkey""",

    "g37_dwithin_join" -> s"""
      SELECT c_custkey, s_suppkey::BIGINT AS s_suppkey
      FROM ($custPts) CROSS JOIN
           (SELECT s_suppkey, s_acctbal AS sx, (s_suppkey % 1000)::DOUBLE AS sy FROM supplier)
      WHERE sqrt((cx - sx)*(cx - sx) + (cy - sy)*(cy - sy)) <= 50.0
      ORDER BY c_custkey, s_suppkey""",

    "g34_touch_intersection" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 10) + 1)::DOUBLE AS h FROM supplier)
      SELECT s_suppkey,
        'LineString' AS itype,
        round(2.0 * least(h, 2.0), 4) AS ilen,
        'Point' AS ptype,
        (0.0)::DOUBLE AS iarea
      FROM p ORDER BY s_suppkey""",

    "g35_multipart_erosion" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 5) + 1)::DOUBLE AS w FROM supplier)
      SELECT s_suppkey,
        round(3.0 * w * w, 4) AS inner_area,
        true AS collapsed_empty
      FROM p ORDER BY s_suppkey""",

    "g33_csv_wkt" -> """
      SELECT c_custkey::BIGINT AS c_custkey, c_acctbal AS x, (c_custkey % 1000)::DOUBLE AS y
      FROM customer ORDER BY c_custkey""",

    "g38_geojson_roundtrip" -> """
      SELECT c_custkey::BIGINT AS c_custkey, c_acctbal AS x, (c_custkey % 1000)::DOUBLE AS y
      FROM customer ORDER BY c_custkey""",

    "g28_accessors" -> """
      WITH p AS (SELECT s_suppkey, ((s_suppkey % 5) + 3) * 10 AS w FROM supplier)
      SELECT s_suppkey,
        1::BIGINT AS n_holes, 5::BIGINT AS hole_pts,
        round((w * w - 100)::DOUBLE, 4) AS area,
        10::BIGINT AS n_points, 10::BIGINT AS n_dump,
        w::DOUBLE AS bxmax,
        s_suppkey::DOUBLE AS z,
        w::DOUBLE AS gn_x,
        true AS valid
      FROM p ORDER BY s_suppkey""",

    "m03_meta_batched" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 4 + L % 29 AS w, 4 + (L * 31) % 25 AS h,
                   CASE L % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c FROM m)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, c::BIGINT AS channels,
             list_sum(flatten(list_transform(range(0, h), y ->
               flatten(list_transform(range(0, w), x ->
                 list_transform(range(0, c), b ->
                   (x * 31 + y * 17 + b * 7 + L) % 256))))))::BIGINT AS pixel_sum
      FROM d ORDER BY doc_id""",

    "t01_token_stats" -> s"""
      SELECT doc_id, len($docToks)::BIGINT AS n_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))::BIGINT
               AS n_bpe_tokens,
             length(text)::BIGINT AS n_chars
      FROM documents ORDER BY doc_id""",

    // decontamination: 8-gram md5s rebuilt with a DuckDB list
    // comprehension; corpus docs too short for one gram survive the
    // unnest through the all_docs left join
    "t58_decontaminate" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN [md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)]
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE source <> 'src0'),
      stats AS (SELECT c.doc_id, count(*) AS n_grams,
                       sum(CASE WHEN b.gr IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
                FROM c LEFT JOIN b ON c.gr = b.gr GROUP BY 1)
      SELECT a.doc_id, COALESCE(s.n_grams, 0)::BIGINT AS n_grams,
             COALESCE(s.n_hit, 0)::BIGINT AS n_hit,
             (COALESCE(s.n_hit, 0) > 0) AS contaminated
      FROM (SELECT doc_id FROM tok WHERE source <> 'src0') a
      LEFT JOIN stats s USING (doc_id) ORDER BY doc_id""",

    // streaming decontamination: same gram comprehension as t58, with
    // 0-based positions (Spark posexplode) zipped via parallel unnest;
    // only docs with >= 1 colliding position appear
    "t59_stream_decontaminate" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN [md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)]
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr,
                   unnest(range(0, len(gs))) AS pos
            FROM g WHERE source <> 'src0'),
      h AS (SELECT c.doc_id, c.pos, c.gr FROM c JOIN b ON c.gr = b.gr)
      SELECT doc_id, count(*)::BIGINT AS n_hit_pos,
             count(DISTINCT gr)::BIGINT AS n_hit_grams,
             min(pos)::BIGINT AS first_pos
      FROM h GROUP BY doc_id ORDER BY doc_id""",

    // contamination report: DISTINCT grams per doc (list_distinct), left
    // join keeps zero-gram docs as clean; frac is one double division of
    // the same integers in both engines (bit-identical)
    "t60_contamination_report" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN list_distinct([md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)])
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE source <> 'src0'),
      stats AS (SELECT c.doc_id, count(*) AS ng,
                       sum(CASE WHEN b.gr IS NOT NULL THEN 1 ELSE 0 END) AS nh
                FROM c LEFT JOIN b ON c.gr = b.gr GROUP BY 1)
      SELECT a.doc_id,
             COALESCE(s.ng, 0)::BIGINT AS n_grams_distinct,
             COALESCE(s.nh, 0)::BIGINT AS n_hit_distinct,
             round(CASE WHEN COALESCE(s.ng, 0) > 0
               THEN s.nh::DOUBLE / s.ng::DOUBLE ELSE 0.0 END, 6) AS dirty_frac,
             CASE WHEN COALESCE(s.nh, 0) = 0 THEN 'clean'
                  WHEN s.nh::DOUBLE / s.ng::DOUBLE >= 0.5 THEN 'dirty'
                  ELSE 'partial' END AS class
      FROM (SELECT doc_id FROM tok WHERE source <> 'src0') a
      LEFT JOIN stats s USING (doc_id) ORDER BY doc_id""",

    // contaminated spans: hit positions via the same parallel-unnest gram
    // mirror, then the lag/running-sum span merge (break when the next
    // hit window starts past prev + 8)
    "t61_contamination_spans" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN [md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)]
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr,
                   unnest(range(0, len(gs))) AS pos
            FROM g WHERE source <> 'src0'),
      hit AS (SELECT c.doc_id, c.pos FROM c JOIN b ON c.gr = b.gr),
      m AS (SELECT doc_id, pos,
              CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     > 8
                THEN 1 ELSE 0 END AS brk
            FROM hit),
      s AS (SELECT doc_id, pos,
              sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span
            FROM m)
      SELECT doc_id, min(pos)::BIGINT AS span_start,
             (max(pos) + 8)::BIGINT AS span_end,
             count(*)::BIGINT AS n_windows
      FROM s GROUP BY doc_id, span ORDER BY doc_id, span_start""",

    // span-excision rewrite: t61's span derivation, then each doc rebuilt
    // from the tokens NOT covered by any of its spans (list comprehension
    // over token indices); md5 witnesses the rebuilt text byte-for-byte
    "t62_decontaminate_rewrite" -> rewriteOracleSql,

    // streaming span-excision rewrite: per-doc output is arrival-order
    // invariant, so the batch t62 oracle applies verbatim
    "t64_stream_decontaminate_rewrite" -> rewriteOracleSql,

    // multi-benchmark report: per-(doc, bench) hit counts over DISTINCT
    // doc grams vs the labeled distinct (bench, gram) table; clean pairs
    // omitted on BOTH sides (inner join), denominator = the doc's own
    // distinct-gram count
    "t65_multi_benchmark_decontamination" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN list_distinct([md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)])
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT source AS bench, unnest(gs) AS gr
            FROM g WHERE source IN ('src0', 'src1')),
      c AS (SELECT doc_id, unnest(gs) AS gr
            FROM g WHERE source NOT IN ('src0', 'src1')),
      tot AS (SELECT doc_id, count(*)::BIGINT AS ng FROM c GROUP BY 1),
      hits AS (SELECT c.doc_id, b.bench, count(*)::BIGINT AS nh
               FROM c JOIN b ON c.gr = b.gr GROUP BY 1, 2)
      SELECT h.doc_id, h.bench,
             t.ng AS n_grams_distinct,
             h.nh AS n_hit_distinct,
             round(h.nh::DOUBLE / t.ng::DOUBLE, 6) AS dirty_frac,
             CASE WHEN h.nh::DOUBLE / t.ng::DOUBLE >= 0.5
                  THEN 'dirty' ELSE 'partial' END AS class
      FROM hits h JOIN tot t USING (doc_id)
      ORDER BY doc_id, bench""",

    // one-call corpus dedup: the t23 pipeline (minhash all-pairs + CC +
    // canonical rank) inverted to the SURVIVOR set, md5-witnessing every
    // surviving document byte-exact. Docs outside any cluster survive as
    // their own singleton cluster. Ranking key is length(text) — the
    // operator is generic over any text column, so it cannot assume the
    // n_chars convenience column t23 uses (equal on this testdata).
    "t68_dedup_corpus" -> s"""
      WITH RECURSIVE $minhashCtes,
      prs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
      e AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION SELECT id_b, id_a FROM prs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             FROM reach GROUP BY a),
      r AS (SELECT cl.cluster_id, cl.doc_id,
              row_number() OVER (PARTITION BY cl.cluster_id
                ORDER BY length(dd.text) DESC, cl.doc_id) AS rnk,
              count(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
            FROM cl JOIN documents dd USING (doc_id))
      SELECT d.doc_id,
             coalesce(r.cluster_id, d.doc_id) AS cluster_id,
             coalesce(r.n_docs, 1)::BIGINT AS n_cluster_docs,
             md5(d.text) AS text_md5
      FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
      WHERE r.rnk IS NULL OR r.rnk = 1
      ORDER BY d.doc_id""",

    // WordPiece greedy longest-match, replayed EXACTLY as a recursive
    // CTE: each recursion step emits one piece (the longest vocab piece
    // matching at the current position — max_by over length is
    // deterministic because a prefix of a given length is unique); a
    // position with no match, or a word over 16 chars, renders the whole
    // word '[UNK]' (acc is wholly replaced and pos jumps past the end,
    // mirroring TextKernel.wordpiece). Vocab VALUES are generated from
    // SparkEntry.t67Vocab — one definition, no drift.
    "t67_wordpiece_encode" -> s"""
      WITH RECURSIVE vocab(p) AS (VALUES ${SparkEntry.t67Vocab
        .map(p => s"('$p')").mkString(", ")}),
      tok AS (SELECT doc_id, $docToks AS toks FROM documents),
      words AS (
        SELECT doc_id, w_idx, toks[w_idx] AS word
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS w_idx
              FROM tok)
      ),
      steps AS (
        SELECT doc_id, w_idx, word,
               CASE WHEN len(word) > 16 THEN len(word) + 1 ELSE 1 END AS pos,
               CASE WHEN len(word) > 16 THEN '[UNK]' ELSE '' END AS acc,
               CASE WHEN len(word) > 16 THEN 1 ELSE 0 END AS np
        FROM words
        UNION ALL
        SELECT doc_id, w_idx, word,
               CASE WHEN best IS NULL THEN len(word) + 1 ELSE pos + blen END,
               CASE WHEN best IS NULL THEN '[UNK]'
                    WHEN acc = '' THEN best
                    ELSE acc || ' ' || best END,
               CASE WHEN best IS NULL THEN 1 ELSE np + 1 END
        FROM (
          SELECT s.doc_id, s.w_idx, s.word, s.pos, s.acc, s.np,
                 max_by(v.p, len(v.p)) AS best,
                 coalesce(max(CASE WHEN s.pos = 1 THEN len(v.p)
                                   ELSE len(v.p) - 2 END), 0) AS blen
          FROM steps s LEFT JOIN vocab v
            ON (s.pos = 1 AND v.p NOT LIKE '##%'
                AND v.p = substr(s.word, 1, len(v.p)))
            OR (s.pos > 1 AND v.p LIKE '##%' AND len(v.p) > 2
                AND substr(v.p, 3) = substr(s.word, s.pos, len(v.p) - 2))
          WHERE s.pos <= len(s.word) AND s.acc <> '[UNK]'
          GROUP BY ALL
        )
      ),
      done AS (SELECT doc_id, w_idx, acc, np FROM steps WHERE pos > len(word)),
      perdoc AS (
        SELECT doc_id, string_agg(acc, ' ' ORDER BY w_idx) AS alltoks,
               sum(np)::BIGINT AS n_pieces,
               sum(CASE WHEN acc = '[UNK]' THEN 1 ELSE 0 END)::BIGINT AS n_unk
        FROM done GROUP BY doc_id)
      SELECT d.doc_id, coalesce(p.n_pieces, 0)::BIGINT AS n_pieces,
             coalesce(p.n_unk, 0)::BIGINT AS n_unk,
             md5(coalesce(p.alltoks, '')) AS pieces_md5
      FROM documents d LEFT JOIN perdoc p USING (doc_id)
      ORDER BY d.doc_id""",

    // trained-vocab contract gates (see the t70 query comment): the BPE
    // merge loop is driver-side and not SQL-replayable, so the oracle
    // pins the contract booleans + the exact zero-UNK count
    "t70_trained_vocab" -> """
      SELECT true AS deterministic, true AS vocab_bounded,
             0::BIGINT AS n_unk_total, true AS compresses,
             true AS top_word_single_piece""",

    // WARC->WET end-to-end: the WET payload is exactly the t46
    // extraction of the wrapped page, witnessed through two warc
    // container roundtrips — same CTE pipeline as t46, reduced to
    // (len, md5)
    "t69_warc_to_wet" -> """
      WITH h AS (SELECT doc_id,
              '<html><head><title>T</title><style>p{color:red}</style></head>'
              || '<body><script>var x=1;</script><h1>' || source
              || '</h1><p>' || text
              || ' A &amp; B &lt;x&gt;</p></body></html>' AS html
            FROM documents),
      t2 AS (SELECT doc_id,
               regexp_replace(html,
                 '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<[^>]+>',
                 ' ', 'g') AS s
             FROM h),
      t3 AS (SELECT doc_id,
               replace(replace(replace(replace(replace(s,
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&#39;', '''') AS s
             FROM t2),
      x AS (SELECT doc_id, trim(regexp_replace(s, '\s+', ' ', 'g')) AS text
            FROM t3)
      SELECT doc_id, 'conversion' AS warc_type,
             strlen(text)::BIGINT AS text_len, md5(text) AS text_md5
      FROM x ORDER BY doc_id""",

    // WARC roundtrip: the reader must hand back byte-exact payloads, so
    // every derived column is a pure function of the source text
    "t66_warc_roundtrip" -> """
      SELECT doc_id,
             'conversion' AS warc_type,
             strlen(text)::BIGINT AS content_length,
             md5(text) AS payload_md5
      FROM documents
      ORDER BY doc_id""",

    // streaming contamination report: per-doc classification is
    // arrival-order invariant (each doc's grams ride its own row), so the
    // batch t60 oracle applies VERBATIM to the two-batch streaming run
    "t63_stream_contamination_report" -> s"""
      WITH tok AS (SELECT doc_id, source, $docToks AS toks FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(toks) >= 8
                THEN list_distinct([md5(array_to_string(toks[i:i+7], ' '))
                      FOR i IN range(1, len(toks) - 6)])
                ELSE [] END AS gs
            FROM tok),
      b AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source = 'src0'),
      c AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE source <> 'src0'),
      stats AS (SELECT c.doc_id, count(*) AS ng,
                       sum(CASE WHEN b.gr IS NOT NULL THEN 1 ELSE 0 END) AS nh
                FROM c LEFT JOIN b ON c.gr = b.gr GROUP BY 1)
      SELECT a.doc_id,
             COALESCE(s.ng, 0)::BIGINT AS n_grams_distinct,
             COALESCE(s.nh, 0)::BIGINT AS n_hit_distinct,
             round(CASE WHEN COALESCE(s.ng, 0) > 0
               THEN s.nh::DOUBLE / s.ng::DOUBLE ELSE 0.0 END, 6) AS dirty_frac,
             CASE WHEN COALESCE(s.nh, 0) = 0 THEN 'clean'
                  WHEN s.nh::DOUBLE / s.ng::DOUBLE >= 0.5 THEN 'dirty'
                  ELSE 'partial' END AS class
      FROM (SELECT doc_id FROM tok WHERE source <> 'src0') a
      LEFT JOIN stats s USING (doc_id) ORDER BY doc_id""",

    // shard packing: the oracle uses the global window the op avoids —
    // exclusive prefix sum over doc_id order, floor-divided by the budget
    "t56_shard_pack" -> s"""
      WITH d AS (SELECT doc_id, len($docToks)::BIGINT AS t FROM documents),
      c AS (SELECT doc_id, t,
              COALESCE(sum(t) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
            FROM d)
      SELECT (cb // 2000)::BIGINT AS shard_id, count(*) AS n_docs,
             sum(t)::BIGINT AS sum_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM c GROUP BY 1 ORDER BY shard_id""",

    // streaming dedup: whichever arrival survives, identical text gives
    // identical length — DISTINCT (source, text) is the exact mirror
    "t57_stream_dedup" -> """
      SELECT source, count(*) AS n_uniq,
             sum(length(text))::BIGINT AS sum_chars
      FROM (SELECT DISTINCT source, text FROM documents)
      GROUP BY source ORDER BY source""",

    "t02_exact_dedup" -> """
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY text) AS canonical_id,
             count(*) OVER (PARTITION BY text) AS group_size
      FROM documents ORDER BY doc_id""",

    "t03_quality" -> s"""
      SELECT doc_id, round($qualityExpr, 4) AS quality
      FROM ($meanLenCte)
      ORDER BY doc_id""",

    "t04_langid" -> s"""
      SELECT doc_id, pred FROM ($langIdCte) ORDER BY doc_id""",

    "t15_curation_funnel" -> s"""
      WITH m AS (
        SELECT doc_id, text, lang,
          CASE WHEN len($docToks) = 0 THEN 0.0
               ELSE list_sum(list_transform($docToks, x -> length(x)))::DOUBLE / len($docToks)
          END AS ml
        FROM documents),
      flags AS (
        SELECT m.doc_id, m.lang, lid.pred,
               round($qualityExpr, 4) AS q,
               min(m.doc_id) OVER (PARTITION BY m.text) AS canon,
               ('0x' || substr(md5(m.text), 1, 16))::UBIGINT % 100 AS bucket
        FROM m JOIN ($langIdCte) lid ON lid.doc_id = m.doc_id)
      SELECT count(*)::BIGINT AS n_total,
        sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)::BIGINT AS n_lang,
        sum(CASE WHEN pred = lang AND q >= 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_quality,
        sum(CASE WHEN pred = lang AND q >= 0.5 AND canon = doc_id
            THEN 1 ELSE 0 END)::BIGINT AS n_unique,
        sum(CASE WHEN pred = lang AND q >= 0.5 AND canon = doc_id AND bucket < 90
            THEN 1 ELSE 0 END)::BIGINT AS n_train
      FROM flags""",

    "t06_ngram_jaccard" -> """
      WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 0),
      g AS (SELECT DISTINCT doc_id, lang, substr(text, i::INT, 3) AS gram
            FROM d, LATERAL unnest(range(1, length(text) - 1)) AS t(i)),
      sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                FROM g a JOIN g b ON a.lang = b.lang AND a.gram = b.gram
                     AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      j AS (SELECT id_a, id_b, i::DOUBLE / (sa.sz + sb.sz - i) AS jac
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b)
      SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j
      WHERE jac >= 0.3
      ORDER BY id_a, id_b""",

    "t07_simhash" -> """
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        FROM documents),
      th AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
      bits AS (SELECT doc_id, b.b AS b,
                      sum(CASE WHEN ((h >> b.b::INT) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
               FROM th, (SELECT unnest(range(0, 64)) AS b) AS b
               GROUP BY doc_id, b.b),
      sh AS (SELECT doc_id,
                    CAST(sum(CASE WHEN cnt > 0 THEN
                      CASE WHEN b = 63 THEN -9223372036854775808
                           ELSE (1::BIGINT << b::INT) END
                      ELSE 0 END) AS BIGINT) AS simhash
             FROM bits GROUP BY doc_id)
      SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
      FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
      ORDER BY d.doc_id""",

    // replicates the MD5-lane minhash exactly: shingles -> two 64-bit MD5
    // lanes -> 64 affine hashes (h1 + (42+k)*h2 mod 2^63) -> per-lane min ->
    // 16 bands of 4 -> candidate = band-slice collision -> signature
    // estimate >= threshold
    "t05_minhash_pairs" -> s"""
      WITH $minhashCtes
      SELECT id_a, id_b, round(est, 4) AS est_jaccard
      FROM est WHERE est >= 0.35
      ORDER BY id_a, id_b""",

    // duplicate clusters over the t05 pair graph: cluster_id = minimum
    // reachable doc_id (transitive closure via recursive CTE)
    "t10_dedup_clusters" -> s"""
      WITH RECURSIVE $minhashCtes,
      prs AS (SELECT id_a, id_b FROM est WHERE est >= 0.5),
      e AS (SELECT id_a AS a, id_b AS b FROM prs
            UNION SELECT id_b, id_a FROM prs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
      ORDER BY doc_id""",

    // replicates the MD5-derived Rademacher hyperplanes: bucket = 8 sign
    // bits of plane dot products; probes = bucket + each single-bit flip;
    // rerank candidates by cosine rounded to 4, ties by neighbor id
    "e02_ann_lsh" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      pl AS (SELECT b.b AS b,
                    list(CASE WHEN (('0x' || substr(md5('lsh:7:' || b.b::VARCHAR || ':' || j.j::VARCHAR), 1, 16))::UBIGINT & 1::UBIGINT) = 1::UBIGINT
                         THEN 1.0 ELSE -1.0 END ORDER BY j.j) AS pv
             FROM (SELECT unnest(range(0, 8)) AS b) b,
                  (SELECT unnest(range(0, 64)) AS j) j
             GROUP BY b.b),
      bk AS (SELECT vec_id,
                    CAST(sum(CASE WHEN list_dot_product(n.v, pl.pv) >= 0
                             THEN (1::BIGINT << pl.b::INT) ELSE 0 END) AS BIGINT) AS bucket
             FROM n CROSS JOIN pl GROUP BY vec_id),
      q AS (SELECT n.vec_id AS query_id, n.v AS qv, n.nrm AS qn, bk.bucket AS qb
            FROM n JOIN bk USING (vec_id) WHERE vec_id < 10),
      probes AS (SELECT query_id, qv, qn, xor(qb, p.p) AS probe
                 FROM q, (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS p) p),
      c AS (SELECT n.vec_id AS neighbor_id, n.v AS cv, n.nrm AS cn, bk.bucket
            FROM n JOIN bk USING (vec_id)),
      cand AS (SELECT query_id, neighbor_id,
                      round(CASE WHEN qn = 0 OR cn = 0 THEN 0.0
                            ELSE list_dot_product(qv, cv) / (qn * cn) END, 4) AS cosine
               FROM probes JOIN c ON probe = bucket AND query_id <> neighbor_id),
      r AS (SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM cand)
      SELECT query_id, neighbor_id, cosine FROM r WHERE rank <= 5
      ORDER BY query_id, cosine DESC, neighbor_id""",

    // replicates IVF: centroids = 16 lowest-id vectors; assignment = argmax
    // cosine (ties -> lowest centroid position); probes = top-4 centroids
    // per query; rerank by cosine rounded to 4, ties by neighbor id
    "e03_ann_ivf" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv, nrm AS cn
                FROM n WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)),
      cc AS (SELECT n.vec_id, n.v, n.nrm, cents.cidx,
                    CASE WHEN n.nrm = 0 OR cents.cn = 0 THEN 0.0
                         ELSE list_dot_product(n.v, cents.cv) / (n.nrm * cents.cn) END AS ccos
             FROM n CROSS JOIN cents),
      asg AS (SELECT vec_id AS neighbor_id, v AS cvv, nrm AS cnn, cidx
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY ccos DESC, cidx ASC) AS rn FROM cc)
              WHERE rn = 1),
      prb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cidx
              FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY ccos DESC, cidx ASC) AS rn
                    FROM cc WHERE vec_id < 10)
              WHERE rn <= 4),
      cand AS (SELECT query_id, neighbor_id,
                      round(CASE WHEN qn = 0 OR cnn = 0 THEN 0.0
                            ELSE list_dot_product(qv, cvv) / (qn * cnn) END, 4) AS cosine
               FROM prb JOIN asg ON prb.cidx = asg.cidx AND query_id <> neighbor_id),
      r AS (SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM cand)
      SELECT query_id, neighbor_id, cosine FROM r WHERE rank <= 5
      ORDER BY query_id, cosine DESC, neighbor_id""",

    "e01_cosine_topk" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN 0.0
                         ELSE list_dot_product(q.v, c.v) / (q.nrm * c.nrm) END, 4) AS cosine
            FROM n q CROSS JOIN n c
            WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
      r AS (SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM s)
      SELECT query_id, neighbor_id, cosine, rank::BIGINT AS rank
      FROM r WHERE rank <= 5
      ORDER BY query_id, rank""",

    // PCA: the trace and covariance entries are recomputed EXACTLY in SQL;
    // the Spark side reconstructs them from its eigendecomposition
    // (C^T diag(lambda) C), so the hash match proves the fit end to end.
    // The projection/whitening variance checks are Spark-side contracts.
    "e10_pca" -> """
      WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      d AS (SELECT unnest(v) AS x, unnest(range(1, 65)) AS i FROM e),
      vr AS (SELECT i, var_pop(x) AS vx FROM d GROUP BY i)
      SELECT (SELECT count(*) FROM e)::BIGINT AS n,
             64::BIGINT AS dim,
             round((SELECT sum(vx) FROM vr), 4) AS trace,
             round((SELECT covar_pop(v[1], v[2]) FROM e), 4) AS cov_0_1,
             round((SELECT covar_pop(v[4], v[8]) FROM e), 4) AS cov_3_7,
             true AS eig_sorted_ok, true AS orth_ok,
             true AS proj_var_ok, true AS whiten_var_ok""",

    "e05_label_centroids" -> """
      WITH dims AS (
        SELECT label, i - 1 AS pos, avg(embedding[i]::DOUBLE) AS m
        FROM (SELECT label, embedding,
                     unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)
        GROUP BY label, pos),
      cent AS (
        SELECT label AS c_label,
               CAST(CAST(list(round(m, 4) ORDER BY pos) AS FLOAT[]) AS DOUBLE[]) AS cv
        FROM dims GROUP BY label),
      n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s AS (SELECT n.vec_id, n.label, c.c_label,
                   round(CASE WHEN sqrt(list_dot_product(n.v, n.v)) = 0
                              OR sqrt(list_dot_product(c.cv, c.cv)) = 0 THEN 0.0
                         ELSE list_dot_product(n.v, c.cv)
                              / (sqrt(list_dot_product(n.v, n.v))
                                 * sqrt(list_dot_product(c.cv, c.cv)))
                         END, 4) AS cos
            FROM n CROSS JOIN cent c),
      r AS (SELECT vec_id, label, c_label, cos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, c_label) AS rnk
            FROM s)
      SELECT label, c_label, count(*)::BIGINT AS n
      FROM r WHERE rnk = 1 GROUP BY label, c_label ORDER BY label, c_label""",

    // exact pair count computed in SQL; the invariant booleans assert the
    // Spark side's per-pair cosine verification (precision) and the
    // measured recall floor of the k-means clustering
    "e07_semantic_dedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                 WHERE vec_id % 4 = 0),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
                         ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END, 4) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id)
      SELECT count(*)::BIGINT AS n_bf_pairs, true AS precision_ok,
             true AS recall_ge_80
      FROM p WHERE cosine >= 0.3""",

    "e04_embed_neardup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                 WHERE vec_id % 4 = 0),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN 0.0
                         ELSE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) END, 4) AS cosine
            FROM n a JOIN n b ON a.vec_id < b.vec_id)
      SELECT id_a, id_b, cosine FROM p
      WHERE cosine >= 0.3
      ORDER BY id_a, id_b""",

    // aHash bits recomputed closed-form from the PNG synth formula; pairs
    // verified by BRUTE-FORCE all-pairs hamming over the unpacked bits
    // (no 64-bit packing — 1<<63 overflows DuckDB BIGINT), so the oracle
    // independently checks the pigeonhole blocking's recall
    "m07_image_phash_dedup" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 4 + L % 29 AS w, 4 + (L * 31) % 25 AS h,
              CASE L % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c FROM m),
      cg AS (SELECT doc_id, i,
               list_sum(list_transform(range(0, c), b ->
                 (((i % 8) * w // 8) * 31 + ((i // 8) * h // 8) * 17 + b * 7 + L) % 256)) AS cell
             FROM (SELECT doc_id, L, w, h, c, unnest(range(0, 64)) AS i FROM d)),
      tot AS (SELECT doc_id, sum(cell) AS total FROM cg GROUP BY doc_id),
      bits AS (SELECT cg.doc_id, cg.i,
                 CASE WHEN cg.cell * 64 > t.total THEN 1 ELSE 0 END AS bit
               FROM cg JOIN tot t USING (doc_id)),
      ham AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
              FROM bits a JOIN bits b ON a.i = b.i AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
      SELECT id_a, id_b, hamming::BIGINT AS hamming
      FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b""",

    // dHash mirror: same 9x8 NN downsample index map, same pixel
    // synthesis formula, integer right-neighbor comparisons
    "m09_image_dhash_dedup" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 4 + L % 29 AS w, 4 + (L * 31) % 25 AS h,
              CASE L % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c FROM m),
      cg AS (SELECT doc_id, x, y,
               list_sum(list_transform(range(0, c), b ->
                 ((x * w // 9) * 31 + (y * h // 8) * 17 + b * 7 + L) % 256)) AS cell
             FROM (SELECT doc_id, L, w, h, c,
                     unnest(range(0, 9)) AS x FROM d),
                  LATERAL unnest(range(0, 8)) t(y)),
      bits AS (SELECT a.doc_id, a.y * 8 + a.x AS i,
                 CASE WHEN b.cell > a.cell THEN 1 ELSE 0 END AS bit
               FROM cg a JOIN cg b
                 ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
               WHERE a.x < 8),
      ham AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
              FROM bits a JOIN bits b ON a.i = b.i AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
      SELECT id_a, id_b, hamming::BIGINT AS hamming
      FROM ham WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "m06_audio_energy" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 500 + (L * 13) % 2000 AS n FROM m),
      s AS (SELECT doc_id, L, n, unnest(range(0, n)) AS i FROM d)
      SELECT doc_id, ((i * 8) // n)::BIGINT AS win,
             sum(abs(((i * 2654435761 + L) % 65536) - 32768))::BIGINT AS energy
      FROM s GROUP BY doc_id, win ORDER BY doc_id, win""",

    "m05_audio_meta" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L,
              CASE L % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                         WHEN 2 THEN 22050 ELSE 44100 END AS rate,
              500 + (L * 13) % 2000 AS n FROM m)
      SELECT doc_id, rate::BIGINT AS sample_rate, 1::BIGINT AS channels,
             n::BIGINT AS n_samples,
             list_sum(list_transform(range(0, n), i ->
               ((i * 2654435761 + L) % 65536) - 32768))::BIGINT AS sample_sum
      FROM d ORDER BY doc_id""",

    "m04_frame_sample" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      d AS (SELECT doc_id, (1000 + (n * 7) % 59000) AS dur, (12 + n % 19) AS fps FROM m),
      f AS (SELECT doc_id, (dur * fps) // 1000 AS frames FROM d),
      s AS (SELECT doc_id, frames, greatest(1, frames // 8) AS step FROM f)
      SELECT doc_id, frames::BIGINT AS n_frames,
             (((frames - 1) // step) + 1)::BIGINT AS n_sampled,
             0::BIGINT AS first_idx,
             (((frames - 1) // step) * step)::BIGINT AS last_idx
      FROM s ORDER BY doc_id""",

    "m01_image_meta" -> """
      WITH m AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
      d AS (SELECT doc_id, L, 4 + L % 29 AS w, 4 + (L * 31) % 25 AS h,
                   CASE L % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c FROM m)
      SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, c::BIGINT AS channels,
             list_sum(flatten(list_transform(range(0, h), y ->
               flatten(list_transform(range(0, w), x ->
                 list_transform(range(0, c), b ->
                   (x * 31 + y * 17 + b * 7 + L) % 256))))))::BIGINT AS pixel_sum
      FROM d ORDER BY doc_id""",

    "t08_lang_profile" -> s"""
      WITH base AS (
        SELECT d.doc_id, d.text, m.ml,
          len(list_filter(list_transform(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''), x -> lower(x)),
              x -> x IN ('the','and','of','to','is','in','that','it'))) AS en,
          len(list_filter(list_transform(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''), x -> lower(x)),
              x -> x IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de,
          len(list_filter(list_transform(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''), x -> lower(x)),
              x -> x IN ('le','la','les','et','est','un','une','dans'))) AS fr,
          len(list_filter(list_transform(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''), x -> lower(x)),
              x -> x IN ('el','los','las','es','un','una','que','por'))) AS es,
          len(list_filter(list_transform(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> ''), x -> lower(x)),
              x -> x IN ('的','是','在','了','和','有','我','不'))) AS zh
        FROM documents d
        JOIN ($meanLenCte) m ON d.doc_id = m.doc_id),
      ann AS (
        SELECT doc_id, text,
          CASE
            WHEN en > 0 AND en >= de AND en >= fr AND en >= es AND en >= zh THEN 'en'
            WHEN de > 0 AND de > en AND de >= fr AND de >= es AND de >= zh THEN 'de'
            WHEN fr > 0 AND fr > en AND fr > de AND fr >= es AND fr >= zh THEN 'fr'
            WHEN es > 0 AND es > en AND es > de AND es > fr AND es >= zh THEN 'es'
            WHEN zh > 0 AND zh > en AND zh > de AND zh > fr AND zh > es THEN 'zh'
            ELSE 'und' END AS pred,
          len($docToks)::BIGINT AS n_tokens,
          $qualityExpr AS quality
        FROM base)
      SELECT pred AS lang_pred, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             round(avg(quality), 4) AS avg_quality
      FROM ann GROUP BY pred ORDER BY pred"""
  )
}
