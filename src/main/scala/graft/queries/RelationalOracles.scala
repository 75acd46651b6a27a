package graft.queries

/** DuckDB oracle SQL for [[Relational]] — one entry per query, same column
  * names/aliases as the Spark side (the driver sorts columns by name and
  * hashes values). Doubles are rounded identically in both engines.
  * Timestamp arithmetic uses floor(epoch(ts)) to match Spark's
  * cast(timestamp AS long) truncation.
  */
object RelationalOracles {
  val all: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)/100 AS DECIMAL(18,2))
        |           * (1 - CAST(floor(l_discount*100 + 0.5)/100 AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(floor(l_quantity*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(floor(l_discount*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    // The Spark side salts this join (SkewJoin.saltedJoin); the oracle is
    // the plain join — result-set equality IS the correctness claim.
    "q_salted_join" ->
      """SELECT event_id, user_id, c_name, c_nationkey
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'view') AS n_view,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'error') AS n_error
        |FROM events GROUP BY 1""".stripMargin,

    "q_analytics" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(10) OVER w AS decile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,

    // MinCount sketch mirror: identical 52-bit md5-prefix fractions, same
    // left-to-right addition order, floor-truncated estimate.
    // CMS cells/estimates mirror Sketches.cmsFrequencies exactly — the
    // bucket function is the same salted md5 52-bit prefix mod w
    "q_cms_freq" -> {
      def b(c: String, salt: Int, w: Int) =
        s"(('0x' || substr(md5('$salt:' || $c), 1, 13))::BIGINT) % $w"
      val flatStructs = (0 until 4).map(i =>
        s"{'row_i': $i, 'bucket': ${b("event_type", i, 64)}}").mkString(", ")
      s"""WITH flat AS (
         |  SELECT u.row_i AS row_i, u.bucket AS bucket FROM (
         |    SELECT unnest([$flatStructs]) AS u FROM events) t),
         |cells AS (SELECT row_i, bucket, count(*) AS cell_n FROM flat GROUP BY 1, 2),
         |probes AS (
         |  SELECT key, u.row_i AS row_i, u.bucket AS bucket FROM (
         |    SELECT event_type AS key,
         |      unnest([${(0 until 4).map(i => s"{'row_i': $i, 'bucket': ${b("event_type", i, 64)}}").mkString(", ")}]) AS u
         |    FROM (SELECT DISTINCT event_type FROM events) d) t),
         |est AS (
         |  SELECT p.key, min(c.cell_n) AS cms_est
         |  FROM probes p JOIN cells c ON c.row_i = p.row_i AND c.bucket = p.bucket
         |  GROUP BY 1),
         |exact AS (SELECT event_type AS key, count(*) AS exact_n FROM events GROUP BY 1)
         |SELECT est.key, cms_est, exact_n, cms_est >= exact_n AS never_underestimates
         |FROM est JOIN exact ON exact.key = est.key""".stripMargin
    },

    // bloom bits mirror Sketches.bloomBits (salts 100..102, m=1024)
    "q_bloom_filter" -> {
      def b(c: String, salt: Int) =
        s"(('0x' || substr(md5('$salt:' || $c), 1, 13))::BIGINT) % 1024"
      val bitArms = (0 until 3).map(i => b("user_id", 100 + i)).mkString(", ")
      val candConds = (0 until 3)
        .map(i => s"(${b("k.key", 100 + i)}) IN (SELECT bit FROM bits)")
        .mkString(" AND ")
      s"""WITH bits AS (
         |  SELECT DISTINCT unnest([$bitArms]) AS bit
         |  FROM events WHERE event_type = 'purchase'),
         |keys AS (SELECT DISTINCT user_id AS key FROM events),
         |members AS (SELECT DISTINCT user_id AS key FROM events WHERE event_type = 'purchase'),
         |cand AS (
         |  SELECT k.key, $candConds AS candidate FROM keys k)
         |SELECT c.key, c.candidate, (m.key IS NOT NULL) AS member
         |FROM cand c LEFT JOIN members m ON m.key = c.key""".stripMargin
    },

    "q_kmv_distinct" -> {
      val mins = (0 until 8).map { i =>
        s"min((('0x' || substr(md5('$i:' || user_id), 1, 13))::BIGINT)::DOUBLE" +
          s" / 4503599627370496.0) AS m$i"
      }.mkString(",\n    ")
      val sum = (0 until 8).map(i => s"m$i").mkString(" + ")
      s"""WITH m AS (
         |  SELECT event_type,
         |    $mins,
         |    count(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT event_type, n_exact,
         |  floor((8.0 / ($sum) - 1) * 100) / 100 AS est_distinct
         |FROM m""".stripMargin
    },

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)/100 AS DECIMAL(18,2))
        |           * (1 - CAST(floor(l_discount*100 + 0.5)/100 AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)/100 AS DECIMAL(18,2))
        |           * (1 - CAST(floor(l_discount*100 + 0.5)/100 AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin,

    "q_running_sum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(floor(value*100 + 0.5)/100 AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "q_event_gaps" ->
      """SELECT user_id, event_id,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |    - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
        |                                     ORDER BY ts ASC, event_id ASC))) AS BIGINT) AS gap_s
        |FROM events""".stripMargin,

    // r14 SCD2: change points via lag, intervals via lead over the
    // change relation; Spark's cast(ts AS long) == floor(epoch(ts))
    "q_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts ASC, event_id ASC) AS prev_type
        |  FROM events),
        |chg AS (SELECT user_id, event_id, ts, event_type FROM o
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS valid_to_s
        |FROM chg
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_session FROM g),
        |s AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    // Morton curve key for z-order clustering — the bit-interleave SQL is
    // GENERATED from the same bit positions the Spark expression uses
    // (PartitionedLake.zValueSql), so the curve is identical by construction
    "q_zorder" ->
      s"""WITH dims AS (
         |  SELECT event_id,
         |    user_id % 65536 AS zx,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 65536 AS zy
         |  FROM events)
         |SELECT event_id, zx, zy,
         |  ${graft.operators.PartitionedLake.zValueSql("zx", "zy")} AS zval
         |FROM dims""".stripMargin,

    // MERGE/upsert row algebra: updates override base by key, the rest of
    // base survives, new keys insert (1000.0 is exactly representable, so
    // the adjusted double is bit-identical cross-engine)
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, 'base' AS src
        |  FROM orders WHERE o_orderkey % 4 <> 0),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice, 'upd' AS src
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT o_orderkey, o_custkey, o_totalprice, src FROM upd
        |UNION ALL
        |SELECT b.o_orderkey, b.o_custkey, b.o_totalprice, b.src FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)""".stripMargin,

    // cohort retention triangle; week = floor(epoch_seconds / 604800),
    // exact in both engines (integer-valued doubles « 2^53)
    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
        |SELECT c.cohort_week, ev.week - c.cohort_week AS week_offset,
        |  count(DISTINCT ev.user_id) AS n_users, count(*) AS n_events
        |FROM ev JOIN c ON ev.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_hourly_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // the estimate itself is engine-specific; the oracle checks the exact
    // count and the 5%-accuracy claim (TRUE from exact counts — Spark's
    // boolean flips, and the compare fails, if its HLL drifts past 5%)
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
        |FROM events GROUP BY 1""".stripMargin,

    "q_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |errs AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT 'both' AS set_kind, user_id FROM
        |  (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errs) t1
        |UNION ALL
        |SELECT 'purchase_only' AS set_kind, user_id FROM
        |  (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errs) t2""".stripMargin,

    "q_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "q_scalar_fns" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  substring(o_orderstatus, 1, 1) AS status_c,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  CAST(CAST(floor(o_totalprice*100 + 0.5)/100 AS DECIMAL(18,2)) * 0.1 AS DOUBLE) AS tithe,
        |  CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket
        |FROM orders""".stripMargin,

    // The Spark side bins this into an equi-join (RangeJoin.pointInInterval);
    // the oracle is the plain theta join — result-set equality verifies the
    // binning replication/dedup logic with an independent engine.
    "q_range_join" ->
      """SELECT o_orderkey, count(*) AS n_ship,
        |  CAST(sum(l_quantity) AS BIGINT) AS qty_sum
        |FROM orders o JOIN lineitem l
        |  ON floor(epoch(l.l_shipdate)) >= floor(epoch(o.o_orderdate))
        | AND floor(epoch(l.l_shipdate)) < floor(epoch(o.o_orderdate)) + 2*86400
        |WHERE o.o_orderpriority = '1-URGENT' AND l.l_returnflag = 'R'
        |GROUP BY 1""".stripMargin,

    // json_extract mirrors both Spark extraction APIs; json_object emits
    // the same compact serialization as Spark's to_json
    // honest mirror of the Spark semantics (not a shortcut that happens to
    // match today's generator): apis_agree is NULL-SAFE equality, and
    // packed drops the k field entirely when NULL — exactly what Spark's
    // to_json does with a null struct field.
    "q_json_fns" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
        |  FROM events)
        |SELECT event_id, k_path, k_typed,
        |  (k_path IS NOT DISTINCT FROM k_typed) AS apis_agree,
        |  k_path % 10 AS k_mod,
        |  CASE WHEN k_typed IS NULL
        |       THEN CAST(json_object('event_id', event_id) AS VARCHAR)
        |       ELSE CAST(json_object('event_id', event_id, 'k', k_typed) AS VARCHAR)
        |  END AS packed
        |FROM t""".stripMargin,

    // same representation-proof integer-moment discipline as q_stats, over
    // a window: z_micro = floor(1e6*(n*x - sx) / isqrt(n*sxx - sx^2)),
    // every term exact HUGEINT; the double sqrt only SEEDS the integer
    // Newton step, the candidate scan lands the exact floor.
    "q_zscore" ->
      """WITH s AS (
        |  SELECT event_id, event_type, cents,
        |    count(*) OVER w AS n, sum(cents) OVER w AS sx,
        |    sum(cents*cents) OVER w AS sxx
        |  FROM (SELECT event_id, event_type,
        |          CAST(floor(value * 100) AS BIGINT) AS cents FROM events) t
        |  WINDOW w AS (PARTITION BY event_type)),
        |m AS (
        |  SELECT event_id, event_type,
        |    CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS m2,
        |    1000000*(CAST(n AS HUGEINT)*cents - sx) AS znum
        |  FROM s),
        |g AS (SELECT *, GREATEST(CAST(floor(sqrt(CAST(m2 AS DOUBLE))) AS HUGEINT), 1) AS g0 FROM m),
        |h AS (SELECT *, (g0 + m2 // g0) // 2 AS g1 FROM g),
        |i AS (SELECT event_id, event_type, znum,
        |    CASE WHEN (g1+2)*(g1+2) <= m2 THEN g1+2
        |         WHEN (g1+1)*(g1+1) <= m2 THEN g1+1
        |         WHEN g1*g1         <= m2 THEN g1
        |         WHEN (g1-1)*(g1-1) <= m2 THEN g1-1
        |         WHEN (g1-2)*(g1-2) <= m2 THEN g1-2
        |         ELSE 0 END AS den
        |  FROM h)
        |SELECT event_id, event_type,
        |  CASE WHEN den = 0 THEN NULL
        |       ELSE CAST((znum - ((znum % den) + den) % den) // den AS BIGINT)
        |  END AS z_micro
        |FROM i""".stripMargin,

    // moments as exact integers END-TO-END (r4 lesson: truncated doubles
    // derived from exact sums still fail across environments — FMA/libm
    // last-bit differences cross floor boundaries). All arithmetic in
    // HUGEINT (int128, = Spark DECIMAL(38,0)); floor-div via explicit
    // positive-mod subtraction so negative covariances floor identically
    // in both engines; isqrt = double-seeded integer Newton + exact scan.
    "q_stats" ->
      """WITH s AS (
        |  SELECT o_orderpriority, count(*) AS n,
        |    sum(x) AS sx, sum(x*x) AS sxx, sum(y) AS sy,
        |    sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM (SELECT o_orderpriority,
        |          CAST(floor(o_totalprice / 100) AS BIGINT) AS x,
        |          o_custkey AS y
        |        FROM orders) t
        |  GROUP BY 1),
        |m AS (
        |  SELECT o_orderpriority, n, sx,
        |    CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS m2x,
        |    CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS m2y,
        |    CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS cxy,
        |    CAST(n AS HUGEINT)*n AS n2
        |  FROM s),
        |sq AS (  -- isqrt((1e12*m2x) // n2) for std_micro_x
        |  SELECT *, (1000000000000*m2x) // n2 AS sv FROM m),
        |sg AS (SELECT *, GREATEST(CAST(floor(sqrt(CAST(sv AS DOUBLE))) AS HUGEINT), 1) AS sg0 FROM sq),
        |sh AS (SELECT *, (sg0 + sv // sg0) // 2 AS sg1 FROM sg),
        |si AS (SELECT *,
        |    CASE WHEN (sg1+2)*(sg1+2) <= sv THEN sg1+2
        |         WHEN (sg1+1)*(sg1+1) <= sv THEN sg1+1
        |         WHEN sg1*sg1         <= sv THEN sg1
        |         WHEN (sg1-1)*(sg1-1) <= sv THEN sg1-1
        |         WHEN (sg1-2)*(sg1-2) <= sv THEN sg1-2
        |         ELSE 0 END AS std_micro,
        |    m2x*m2y AS dp
        |  FROM sh),
        |cg AS (SELECT *, GREATEST(CAST(floor(sqrt(CAST(dp AS DOUBLE))) AS HUGEINT), 1) AS cg0 FROM si),
        |ch AS (SELECT *, (cg0 + dp // cg0) // 2 AS cg1 FROM cg),
        |ci AS (SELECT *,
        |    CASE WHEN (cg1+2)*(cg1+2) <= dp THEN cg1+2
        |         WHEN (cg1+1)*(cg1+1) <= dp THEN cg1+1
        |         WHEN cg1*cg1         <= dp THEN cg1
        |         WHEN (cg1-1)*(cg1-1) <= dp THEN cg1-1
        |         WHEN (cg1-2)*(cg1-2) <= dp THEN cg1-2
        |         ELSE 0 END AS corr_den
        |  FROM ch)
        |SELECT o_orderpriority, n, CAST(sx AS BIGINT) AS sx,
        |  CAST((1000000*m2x - ((1000000*m2x % n2) + n2) % n2) // n2 AS BIGINT) AS var_micro_x,
        |  CAST(std_micro AS BIGINT) AS std_micro_x,
        |  CAST((1000000*cxy - ((1000000*cxy % n2) + n2) % n2) // n2 AS BIGINT) AS cov_micro_xy,
        |  CASE WHEN corr_den = 0 THEN NULL
        |       ELSE CAST((1000000*cxy - ((1000000*cxy % corr_den) + corr_den) % corr_den) // corr_den AS BIGINT)
        |  END AS corr_micro_xy
        |FROM ci""".stripMargin,

    // overlap of half-open 1-hour windows == |tc - tp| < 3600
    "q_interval_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purch_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND floor(epoch(c.ts)) < floor(epoch(p.ts)) + 3600
        | AND floor(epoch(p.ts)) < floor(epoch(c.ts)) + 3600
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,

    "q_asof_join" ->
      """WITH merged AS (
        |  SELECT user_id AS k, ts, event_id, 1 AS side, NULL::BIGINT AS o_orderkey
        |  FROM events
        |  UNION ALL
        |  SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ts,
        |    NULL::BIGINT AS event_id, 0 AS side, o_orderkey
        |  FROM orders),
        |marked AS (
        |  SELECT *, last_value(o_orderkey IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY ts ASC, side ASC, o_orderkey DESC NULLS LAST
        |    ROWS UNBOUNDED PRECEDING) AS asof_orderkey
        |  FROM merged)
        |SELECT event_id, k AS user_id, asof_orderkey FROM marked WHERE side = 1""".stripMargin,

    "q_asof_fwd" ->
      """WITH merged AS (
        |  SELECT user_id AS k, ts, event_id, 0 AS side, NULL::BIGINT AS p_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id AS k, ts, NULL::BIGINT AS event_id, 1 AS side,
        |    event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'),
        |marked AS (
        |  SELECT *, first_value(p_id IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY ts ASC, side ASC, p_id ASC
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_id
        |  FROM merged)
        |SELECT event_id, k AS user_id, next_purchase_id
        |FROM marked WHERE side = 0""".stripMargin,

    "q_funnel" ->
      """SELECT user_id,
        |  min(CASE WHEN event_type = 'signup'
        |           THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS first_signup,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signups,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |  coalesce(
        |    max(CASE WHEN event_type = 'purchase'
        |             THEN CAST(floor(epoch(ts)) AS BIGINT) END)
        |      >= min(CASE WHEN event_type = 'signup'
        |              THEN CAST(floor(epoch(ts)) AS BIGINT) END),
        |    false) AS converted_after_signup
        |FROM events GROUP BY 1""".stripMargin,

    "q_string_fns" ->
      """SELECT p_partkey,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
        |  translate(p_type, ' ', '_') AS type_snake,
        |  levenshtein(p_brand, p_type) AS brand_type_dist,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        |  trim('  ' || p_brand || '  ') AS brand_trim,
        |  repeat('*', CAST(p_size % 5 AS INT)) AS stars,
        |  reverse(p_brand) AS brand_rev,
        |  concat_ws('/', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,

    "q_date_fns" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
        |  datediff('day', o_orderdate, DATE '1998-12-31') AS days_to_eoy
        |FROM orders""".stripMargin,

    "q_range_frame" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_hour_cents
        |FROM events""".stripMargin,

    "q_first_last" ->
      """SELECT user_id, event_id,
        |  first_value(event_id) OVER w AS first_ev,
        |  last_value(event_id) OVER w AS last_ev,
        |  nth_value(event_id, 2) OVER w AS second_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_cube" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,

    // the sketch estimate is engine-specific; the oracle checks the exact
    // median and the 5%-accuracy claim (TRUE from exact values — Spark's
    // boolean flips if its sketch drifts past 5%)
    "q_approx_percentile" ->
      """SELECT o_orderpriority,
        |  quantile_cont(cents, 0.5) AS p50_exact,
        |  TRUE AS within_5pct
        |FROM (SELECT o_orderpriority,
        |        CAST(CAST(floor(o_totalprice*100 + 0.5)/100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders) t
        |GROUP BY 1""".stripMargin,

    // the literal same SQL text the Spark side executes via spark.sql —
    // the strongest possible front-door parity statement
    "q_sql_q6" -> graft.queries.Relational.SqlQ6,
    "q_sql_exists" -> graft.queries.Relational.SqlExists,
    "q_sql_q4" -> graft.queries.Relational.SqlQ4,
    "q_sql_q7" -> graft.queries.Relational.SqlQ7,
    "q_sql_q8" -> graft.queries.Relational.SqlQ8,
    "q_sql_q10" -> graft.queries.Relational.SqlQ10,
    "q_sql_q13" -> graft.queries.Relational.SqlQ13,
    "q_sql_q14" -> graft.queries.Relational.SqlQ14,
    "q_sql_q15" -> graft.queries.Relational.SqlQ15,
    "q_sql_q17" -> graft.queries.Relational.SqlQ17,
    "q_sql_q18" -> graft.queries.Relational.SqlQ18,
    "q_sql_q9" -> graft.queries.Relational.SqlQ9,
    "q_sql_q12" -> graft.queries.Relational.SqlQ12,
    "q_sql_q19" -> graft.queries.Relational.SqlQ19,
    "q_sql_q21" -> graft.queries.Relational.SqlQ21,
    "q_sql_q22" -> graft.queries.Relational.SqlQ22,
    "q_sql_q2" -> graft.queries.Relational.SqlQ2,
    "q_sql_q11" -> graft.queries.Relational.SqlQ11,
    "q_sql_q16" -> graft.queries.Relational.SqlQ16,
    "q_sql_q20" -> graft.queries.Relational.SqlQ20,
    "q_sql_recursive" -> graft.queries.Relational.SqlRecursive,
    "q_sql_rollup" -> graft.queries.Relational.SqlRollup,
    "q_sql_cube" -> graft.queries.Relational.SqlCube,
    "q_sql_filter" -> graft.queries.Relational.SqlFilter,
    "q_sql_pivot" -> graft.queries.Relational.SqlPivot,
    "q_sql_gsets" -> graft.queries.Relational.SqlGsets,
    "q_sql_setops" -> graft.queries.Relational.SqlSetops,
    "q_sql_window" -> graft.queries.Relational.SqlWindow,
    "q_sql_lateral" -> graft.queries.Relational.SqlLateral,

    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n_rows,
        |    count(DISTINCT l_partkey) AS n_parts,
        |    count(DISTINCT l_suppkey) AS n_supps
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM a
        |UNION ALL SELECT l_returnflag, 'n_parts', n_parts FROM a
        |UNION ALL SELECT l_returnflag, 'n_supps', n_supps FROM a""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT bin, n,
        |  floor(CAST(n AS DOUBLE) / sum(n) OVER () * 1000000) / 1000000 AS share
        |FROM b""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(cents, 0.25) AS p25,
        |  quantile_cont(cents, 0.5) AS p50,
        |  quantile_cont(cents, 0.75) AS p75,
        |  count(*) AS n
        |FROM (SELECT o_orderpriority,
        |        CAST(CAST(floor(o_totalprice*100 + 0.5)/100 AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |      FROM orders) t
        |GROUP BY 1""".stripMargin,

    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |JOIN (SELECT o_custkey AS ck, avg(o_totalprice) AS avg_price
        |      FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
        |WHERE o_totalprice > avg_price""".stripMargin,
  )
}
