package graft.queries

import graft.Tables
import graft.operators.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.7/§2.8).
  *
  * The reference has no SQL engine; this module is the declared relational
  * surface our Spark engine exposes over the same data shapes: grouped
  * aggregation, hash/broadcast/semi/anti joins, window functions, top-k,
  * set ops, rollup/cube, sorts/limits. Each query has a DuckDB oracle in
  * [[Oracles.relational]].
  *
  * Scale notes (100 TB design stance):
  *  - dims (region/nation/customer/supplier/part) are broadcast; only the
  *    fact tables (lineitem/orders/events) ever shuffle.
  *  - aggregates are expressed on grouped columns so Catalyst plans
  *    partial (map-side) aggregation before the exchange.
  *  - double-typed aggregates are rounded in BOTH engines so results are
  *    insensitive to summation order (floating addition is
  *    non-associative; a 1000-executor sum has no fixed order).
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Money arithmetic in exact DECIMAL, surfaced as double. Double sums are
    * order-dependent (a 1000-executor sum has no fixed order) and the two
    * engines' round() disagree on half-way values; summing an exact decimal
    * and casting once to double is deterministic in both.
    *
    * The `floor(x*100 + 0.5)/100` step before the cast normalizes inputs
    * with >2 decimal places identically in both engines (pure IEEE double
    * ops — same bits both sides), so the final double→decimal cast never
    * sees a representable halfway value (e.g. 0.125), where Spark's
    * HALF_UP and DuckDB's cast rounding could differ. On 2-dp inputs it is
    * the identity. Mirrored in RelationalOracles. */
  private def dec(c: Column): Column =
    (floor(c * 100 + lit(0.5)) / 100).cast("decimal(18,2)")
  private def sumMoney(c: Column): Column = sum(dec(c)).cast("double")
  private def avgMoney(c: Column): Column = (sum(dec(c)).cast("double") / count(lit(1)))
  /** extendedprice * (1 - discount), exact. */
  private def discPrice: Column =
    dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** TPC-H Q1-style pricing summary: groupBy with map-side partial agg. */
  val q1Agg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Filtered join fact⋈fact with a broadcast dim: shuffle only on o_orderkey. */
  val q3Join: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** Multi-way join through the dim chain region→nation→customer→orders→lineitem.
    * All dims broadcast; the only exchange is lineitem⋈orders on orderkey. */
  val q5Join: Q = (s, d) => {
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** Left-semi join = EXISTS: customers with at least one open order. */
  val qSemiJoin: Q = (s, d) => {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
    Tables.customer(s, d)
      .join(open, col("c_custkey") === open("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** Left-anti join = NOT EXISTS: customers with no orders at all. */
  val qAntiJoin: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** Window ranking + frame: top-3 orders by price per customer. */
  val qTopkWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
  }

  /** Running-sum frame over event time per user (unbounded preceding → current). */
  val qRunningSum: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
  }

  /** MERGE/upsert semantics over orders (base = keys with o_orderkey%4≠0,
    * update batch = even keys with a price adjustment): updates override,
    * non-colliding base rows survive, new keys insert. The relational
    * statement of [[graft.operators.PartitionedLake.merged]] — the lake's
    * partition-scoped copy-on-write applies THIS semantics physically
    * (LakeSpec proves the files; this oracle proves the row algebra). */
  val qMergeUpsert: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val base = orders.filter(pmod(col("o_orderkey"), lit(4L)) =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), lit("base").as("src"))
    val upd = orders.filter(pmod(col("o_orderkey"), lit(2L)) === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + lit(1000.0)).as("o_totalprice"), lit("upd").as("src"))
    graft.operators.PartitionedLake.merged(base, upd, Seq("o_orderkey"))
  }

  /** Z-order clustering key over (user, event-day) — the layout primitive
    * behind [[graft.operators.PartitionedLake.zorderWrite]], exposed as a
    * query so the curve arithmetic itself is oracle-gated bit-for-bit
    * (LakeSpec separately proves the layout concentrates 2-D box matches
    * into few files). Pure codegen'd bit math, zero shuffle. */
  val qZorder: Q = (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        pmod(datediff(col("ts"), lit("1970-01-01")).cast("long"), lit(65536L)).as("zy"))
      .withColumn("zval", graft.operators.PartitionedLake.zValue(col("zx"), col("zy")))

  /** lag/lead: inter-event gap seconds per user. */
  val qEventGaps: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_s", col("ts").cast("long") - col("prev_ts").cast("long"))
      .select("user_id", "event_id", "gap_s")
  }

  /** Sessionization: 30-min inactivity gap starts a new session (batch form
    * of the streaming session_window — same semantics, oracle-checkable). */
  /** R14: SCD Type-2 dimension build from the event log — per user,
    * each event_type CHANGE opens a new validity interval; valid_to is
    * the next change's start (NULL = current row). The warehouse-classic
    * change-capture shape: one lag to find change points, one
    * lead/row_number pass over the (much smaller) change relation.
    * Windows partition on user_id — per-user partitions stay
    * interaction-history sized at any corpus scale, never a global
    * funnel. Seconds are exact BIGINTs (cast-truncation = the oracle's
    * floor(epoch)). */
  val qScd2: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("valid_from_s"),
        row_number().over(w).cast("long").as("version"),
        lead(col("ts").cast("long"), 1).over(w).as("valid_to_s"))
  }

  val qSessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("session_value"))
  }

  /** Cohort retention: users bucketed by first-event week, activity
    * counted per (cohort_week, week_offset) cell — the classic retention
    * triangle. Two shuffles on the SAME key (per-user min, then the
    * events⋈cohorts equi-join), so the exchange is reused; the distinct
    * count is Spark's two-phase expand — no per-cell row explosion
    * survives the partial agg. Week = floor(epoch_seconds / 604800):
    * integer-valued doubles « 2^53, so the floor is exact in both
    * engines. */
  val qRetention: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"),
      floor(col("ts").cast("long") / 604800L).cast("long").as("week"))
    val cohorts = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
  }

  /** Tumbling event-time window (batch equivalent of streaming window()).
    * The bucket is emitted as a formatted string so the oracle compare is
    * independent of timestamp physical precision (ns vs µs). */
  val qHourlyWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("total_value"))

  /** Exact distinct + grouped distinct counts. */
  val qDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  /** Set ops: users seen in purchases UNION/INTERSECT/EXCEPT errors. */
  val qSetOps: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val buyers = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
    val errorers = ev.filter(col("event_type") === "error").select("user_id").distinct()
    buyers.intersect(errorers).withColumn("set_kind", lit("both"))
      .unionByName(buyers.except(errorers).withColumn("set_kind", lit("purchase_only")))
      .select("set_kind", "user_id")
  }

  /** ROLLUP aggregation over the nation→mktsegment hierarchy. */
  val qRollup: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), sumMoney(col("c_acctbal")).as("total_bal"))
  }

  /** Sort + limit (global top-k without a window): most expensive orders. */
  val qSortLimit: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Scalar function battery over one table: string/date/math builtins used
    * by the collector projections (SURVEY §2.7 "scalar functions"). */
  val qScalarFns: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderstatus"), 1, 1).as("status_c"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        (dec(col("o_totalprice")) * lit(new java.math.BigDecimal("0.1"))).cast("double").as("tithe"),
        when(col("o_totalprice") > 200000, "big").otherwise("small").as("bucket"))

  /** As-of join (reference lacks it; DuckDB has ASOF JOIN): latest order at
    * or before each event's timestamp for the matching user/custkey.
    * Implemented shuffle-once: union-tag both sides, one sort per key, and
    * a last_value window carries the most recent order forward — the
    * classic piecewise merge that scales linearly (no O(n·m) range join). */
  val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id").as("k"), col("ts"), col("event_id"))
      .withColumn("side", lit(1))
      .withColumn("o_orderkey", lit(null).cast("long"))
    val ordPrep = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("ts"),
        lit(null).cast("long").as("event_id"), lit(0).as("side"), col("o_orderkey"))
    val merged = ev.select("k", "ts", "event_id", "side", "o_orderkey")
      .unionByName(ordPrep)
    // Within (k, ts) order: orders sort before events at equal ts (side 0<1),
    // ties among orders broken by o_orderkey desc so the max key wins.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc, col("o_orderkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("asof_orderkey"))
  }

  /** Forward as-of join — the other direction of [[qAsofJoin]]: for each
    * click, the NEXT purchase by the same user at or after it
    * (time-to-conversion). Same shuffle-once piecewise merge, mirrored:
    * a min-key first_value over the FOLLOWING frame carries the nearest
    * upcoming purchase backward — no O(n·m) range join, one sort per
    * user. */
  val qAsofFwd: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("ts"), col("event_id"),
        lit(0).as("side"), lit(null).cast("long").as("p_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts"),
        lit(null).cast("long").as("event_id"), lit(1).as("side"),
        col("event_id").as("p_id"))
    // clicks sort before purchases at equal ts (side 0<1) so a purchase
    // AT the click's own timestamp is eligible; purchase ties break by
    // event_id ASC so the MIN id wins (first_value scans forward)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("side").asc, col("p_id").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(purch)
      .withColumn("next_purchase_id", first(col("p_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("event_id"), col("k").as("user_id"), col("next_purchase_id"))
  }

  /** Funnel/conversion: per user, first signup and the first purchase at
    * or after it — conditional min aggregation, one shuffle on user_id. */
  val qFunnel: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts").cast("long"))).as("first_signup"),
        count(when(col("event_type") === "signup", 1)).as("n_signups"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        max(when(col("event_type") === "purchase", col("ts").cast("long"))).as("last_purchase"))
      .select(
        col("user_id"), col("first_signup"), col("n_signups"), col("n_purchases"),
        coalesce(col("last_purchase") >= col("first_signup"), lit(false))
          .as("converted_after_signup"))

  /** String-function battery over part (SURVEY §2.7 scalar coverage):
    * pad/translate/levenshtein/position/trim/repeat — integer or
    * string-valued, so parity is exact. */
  val qStringFns: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
        translate(col("p_type"), " ", "_").as("type_snake"),
        levenshtein(col("p_brand"), col("p_type")).as("brand_type_dist"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        repeat(lit("*"), (col("p_size") % 5).cast("int")).as("stars"),
        reverse(col("p_brand")).as("brand_rev"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))

  /** Date-function battery over orders: truncation, component extraction,
    * day arithmetic, month boundaries. Only constructs with identical
    * cross-engine semantics (no week-of-year / weekday numbering). */
  val qDateFns: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate")).as("days_to_eoy"))

  /** RANGE frame: per-user trailing-hour event value (exact integer
    * cents — bounded-frame double sums associate differently across
    * engines, integers don't care). */
  val qRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    Tables.events(s, d)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("trailing_hour_cents", sum("cents").over(w))
      .select("user_id", "event_id", "trailing_hour_cents")
  }

  /** first/last/nth over the full partition frame. */
  val qFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(
        col("user_id"), col("event_id"),
        first("event_id").over(w).as("first_ev"),
        last("event_id").over(w).as("last_ev"),
        nth_value(col("event_id"), 2).over(w).as("second_ev"))
  }

  /** CUBE over nation × segment (all four grouping combinations). */
  val qCube: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    cust.join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
  }

  /** GROUPING SETS via the SQL surface (DataFrame API has cube/rollup
    * only) — also exercises spark.sql + temp views. */
  val qGroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin)
  }

  /** Exact interpolated percentiles per priority class. Quantile points
    * are binary-exact (k/4) and values are integer cents, so the linear
    * interpolation is exact in both engines regardless of the formula's
    * association (SURVEY §8.8 cross-engine float rules). */
  val qPercentiles: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("cents", (dec(col("o_totalprice")) * 100).cast("long"))
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(cents, 0.25)").as("p25"),
        expr("percentile(cents, 0.5)").as("p50"),
        expr("percentile(cents, 0.75)").as("p75"),
        count(lit(1)).as("n"))

  /** HLL approximate distinct. The raw estimate is implementation-
    * specific (engines hash differently), so the oracle-checked output
    * is the exact count plus the CLAIM the sketch exists to make —
    * `within_5pct` — computed in-plan against an exact distinct; the
    * DuckDB oracle derives the same row from exact counts (the boolean
    * is literally true there). A wildly-off HLL flips the boolean and
    * fails the hash compare, so the estimate quality itself is now
    * oracle-gated (it was rows-only through r3). The raw estimate stays
    * a RelationalSpec assertion. */
  val qApproxDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("est"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")).cast("double") / col("exact_users")
          <= 0.05).as("within_5pct"))

  /** Sketch-based approximate percentile. Like [[qApproxDistinct]], the
    * raw sketch output is engine-specific, so the oracle-checked columns
    * are the exact median (provably cross-engine: binary-exact quantile
    * point, integer cents) and the in-plan claim that the sketch lands
    * within 5% of it; the oracle derives the same row from exact values
    * alone. A drifting sketch flips the boolean and fails the compare. */
  val qApproxPercentile: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("cents", (dec(col("o_totalprice")) * 100).cast("long"))
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(cents, 0.5)").as("p50_exact"),
        expr("approx_percentile(cents, 0.5, 10000)").as("est"))
      .select(col("o_orderpriority"), col("p50_exact"),
        (abs(col("est") - col("p50_exact")) / col("p50_exact") <= 0.05)
          .as("within_5pct"))

  /** Wide-to-long unpivot (the inverse of q_pivot): per-flag aggregate
    * columns melted into (metric, value) rows. Integer metrics only —
    * exact cross-engine. Spark's native `unpivot` (Expand underneath:
    * one pass, no join/union re-scan). */
  val qUnpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("n_rows"), col("n_parts"), col("n_supps")),
        "metric", "value")

  /** Value histogram: fixed-width integer binning of order totals (the
    * floor-based bin index is exact in both engines), bin counts +
    * per-bin share of total via a window over the aggregate. */
  val qHistogram: Q = (s, d) => {
    val w = Window.partitionBy()
    Tables.orders(s, d)
      .withColumn("bin", floor(col("o_totalprice") / 25000).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        TextOps.trunc(col("n").cast("double") / sum("n").over(w), 6))
      .select("bin", "n", "share")
  }

  /** ONE SQL text that runs unchanged on Spark and DuckDB — exercised
    * through the engine's SQL front door (`spark.sql` over the registered
    * catalog). TPC-H Q6 shape; money math in DECIMAL per the shared
    * cross-engine discipline (dec()), cast to double once. */
  private[queries] val SqlQ6 =
    """SELECT
      |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5)/100 AS DECIMAL(18,2)) *
      |           CAST(floor(l_discount*100 + 0.5)/100 AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** The SQL front door: users of the library query the registered views
    * with plain SQL; Catalyst plans it identically to the DataFrame API
    * (pushed filters + partial agg — one scan, one exchange). */
  val qSqlQ6: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(SqlQ6)
  }

  /** Correlated EXISTS through the SQL front door — ONE text, both
    * engines. Catalyst decorrelates the subquery into a left-semi join
    * (the plan a user gets writing idiomatic SQL against the catalog). */
  private[queries] val SqlExists =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F')""".stripMargin

  val qSqlExists: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlExists)
  }

  // ---- the TPC-H long tail expressible on this schema subset ----------
  // One SQL text per query, executed verbatim by BOTH Spark and the
  // DuckDB oracle — the strongest front-door parity statement (the SqlQ6
  // precedent). The synthetic tables omit partsupp, l_commitdate /
  // l_receiptdate / l_shipmode / l_shipinstruct / c_phone; the
  // partsupp-dependent Q2 / Q11 / Q16 / Q20 run against the
  // deterministic [[PartsuppCte]] synthesis (r14), and the remaining
  // absent-column queries (Q4 / Q9 / Q12 / Q19 / Q21 / Q22, Q13/Q14's
  // filter classes) are adapted to existing columns (noted per query).
  // Money math follows the engine-wide float discipline: cent-rounded
  // DECIMAL(18,2) products summed exactly, ONE cast to double in the
  // final select; quantity comparisons stay in BIGINT (the q17 avg
  // threshold is cross-multiplied to integers).

  /** `CAST(floor(c*100+0.5)/100 AS DECIMAL(18,2))` — the cent-exact
    * money spelling both engines agree on (SqlQ6 precedent). */
  private def cents(c: String): String =
    s"CAST(floor($c*100 + 0.5)/100 AS DECIMAL(18,2))"
  private def revenueExpr: String =
    s"${cents("l_extendedprice")} * (1 - ${cents("l_discount")})"

  private def withTpchViews(s: SparkSession, d: String)(sql: String) = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(sql)
  }

  /** Q4 (adapted): order-priority checking. The reference predicate is
    * `l_commitdate < l_receiptdate` (columns absent here); the adapted
    * lateness witness is a line shipped strictly after the order date.
    * Catalyst decorrelates the EXISTS into a left-semi join. */
  private[queries] val SqlQ4 =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q7: volume shipping between two nations by year. */
  private[queries] val SqlQ7 =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(sum(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         EXTRACT(YEAR FROM l_shipdate) AS l_year,
       |         $revenueExpr AS volume
       |  FROM lineitem
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 (adapted): national market share inside a region for one part
    * type ('ECONOMY' stands in for the reference's 'ECONOMY ANODIZED
    * STEEL'). The share divides two EXACT decimal sums — both engines
    | cast the identical decimals to double, then do one IEEE division. */
  private[queries] val SqlQ8 =
    s"""SELECT o_year,
       |  CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
       |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
       |  CAST(sum(volume) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       |         $revenueExpr AS volume,
       |         n2.n_name AS nation
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n1.n_regionkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
       |GROUP BY o_year""".stripMargin

  /** Q10: returned-item revenue ranking. Deterministic top-20: the tie
    * break on c_custkey pins the LIMIT boundary in both engines. */
  private[queries] val SqlQ10 =
    s"""SELECT c_custkey, c_name,
       |  CAST(sum($revenueExpr) AS DOUBLE) AS revenue,
       |  CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents, n_name
       |FROM customer
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Q13 (adapted): customer order-count distribution. The reference
    * excludes '%special%requests%' comments (column absent); the adapted
    * class exclusion drops '5-LOW' priority orders. */
  private[queries] val SqlQ13 =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON o_custkey = c_custkey
      |                  AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  /** Q14 (adapted): promo revenue share; 'ECONOMY' is the promo class.
    * The x100 scaling happens in DECIMAL (exact) before the one double
    * division. */
  private[queries] val SqlQ14 =
    s"""SELECT
       |  CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN volume
       |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100 /
       |  CAST(sum(volume) AS DOUBLE) AS promo_revenue
       |FROM (
       |  SELECT p_type, $revenueExpr AS volume
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') pr""".stripMargin

  /** Q15: top supplier by quarterly revenue (the view inlined as a CTE;
    * the scalar-subquery max keeps ties — reference semantics). */
  private[queries] val SqlQ15 =
    s"""WITH revenue0 AS (
       |  SELECT l_suppkey AS supplier_no,
       |         CAST(sum($revenueExpr) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)""".stripMargin

  /** Q17 (adapted): small-quantity-order revenue for one brand (the
    * container filter's column is absent). The `< 0.2 * avg` threshold
    * is cross-multiplied into exact BIGINT arithmetic:
    * `q < 0.2 * (tq/cnt)  ⟺  5*q*cnt < tq`. */
  private[queries] val SqlQ17 =
    s"""SELECT CAST(CAST(sum(${cents("l_extendedprice")}) AS DOUBLE) /
       |       CAST(7 AS DOUBLE) AS DOUBLE) AS avg_yearly
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN (SELECT l_partkey AS agg_pk,
       |             sum(CAST(l_quantity AS BIGINT)) AS tq,
       |             count(*) AS cnt
       |      FROM lineitem GROUP BY l_partkey) agg ON agg_pk = l_partkey
       |WHERE p_brand = 'Brand#23'
       |  AND 5 * CAST(l_quantity AS BIGINT) * cnt < tq""".stripMargin

  /** Q18: large-volume customers (quantity threshold tuned to this
    * corpus — max order quantity is 458 at sf0.01). */
  private[queries] val SqlQ18 =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_cents,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
      |HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 300""".stripMargin

  /** Q9 (adapted): product-type profit by nation and year. The
    * reference's `ps_supplycost` lives in the absent partsupp table;
    * the adapted cost is 1% of retail price per unit — same shape
    * (revenue minus a quantity-scaled cost), exact DECIMAL arithmetic,
    * one double cast at the end. */
  private[queries] val SqlQ9 =
    s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       |    $revenueExpr - ${cents("p_retailprice")} *
       |      CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.01 AS DECIMAL(4,2)) AS amount
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE p_name LIKE '%red%') profit
       |GROUP BY nation, o_year""".stripMargin

  /** Q12 (adapted): shipping-priority accounting. `l_shipmode` is
    * absent; the return flag partitions the lines the same way, and the
    * late-receipt predicate becomes ship-after-order (the SqlQ4
    * lateness witness). count(CASE) keeps both engines on BIGINT. */
  private[queries] val SqlQ12 =
    """SELECT l_returnflag,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS low_line_count
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag IN ('A', 'R')
      |  AND l_shipdate > o_orderdate
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** Q19 (adapted): discounted revenue under disjunctive brand/size/
    * quantity predicates — the classic OR-of-ANDs the optimizer must
    * push into one joined scan, not three. */
  private[queries] val SqlQ19 =
    s"""SELECT CAST(sum($revenueExpr) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity >= 1 AND l_quantity <= 20)
       |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 30
       |       AND l_quantity >= 10 AND l_quantity <= 35)
       |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 50
       |       AND l_quantity >= 20 AND l_quantity <= 50)""".stripMargin

  /** Q21 (adapted): suppliers who kept finished orders waiting — the
    * only supplier in a multi-supplier order whose line shipped > 90
    * days after the order date (the commit/receipt columns are absent;
    * the 90-day ship lag is the lateness witness). The EXISTS /
    * NOT EXISTS pair decorrelates into one semi and one anti join. */
  private[queries] val SqlQ21 =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** Q22 (adapted): the global-sales-opportunity anti-join — customers
    * above the positive-balance average with no RECENT orders (every
    * synthetic customer has some order, so "none since 2000" is the
    * lapsed-customer predicate that keeps the anti-join non-trivial).
    * The market segment stands in for the absent phone country code,
    * and the above-average test CROSS-MULTIPLIES against the exact
    * decimal (sum, count) pair — no float average ever exists, so the
    * boundary cannot flip between engines. */
  private[queries] val SqlQ22 =
    """WITH pos AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS tot,
      |         count(*) AS cnt
      |  FROM customer WHERE c_acctbal > 0.00)
      |SELECT c_mktsegment AS mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT cnt FROM pos)
      |        > (SELECT tot FROM pos)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment""".stripMargin

  /** Deterministic synthetic partsupp (r14): /root/testdata ships no
    * partsupp table, so the Q2/Q11/Q16/Q20 family derives one —
    * IDENTICALLY in both engines, inside the one shared SQL text — from
    * the fact table's own FK pairs: one row per distinct
    * (l_partkey, l_suppkey), exactly the pairs real TPC-H guarantees
    * partsupp covers, with availqty and supplycost as exact-integer
    * multiply-mod functions of the key pair (the m_decode/synthLines
    * oracle-mirrored-synthesis precedent). Cost lives in cents BIGINT so
    * every min/sum/threshold below is exact; 41·Δsupp < 99901 for any
    * two suppliers of one part, so per-part costs never tie and Q2's
    * min-cost winner is unique. */
  private[queries] val PartsuppCte =
    """WITH partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    1 + (ps_partkey * 31 + ps_suppkey * 17) % 9999 AS ps_availqty,
      |    100 + (ps_partkey * 97 + ps_suppkey * 41) % 99901 AS ps_supplycost_cents
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      |        FROM lineitem) pairs)""".stripMargin

  /** Q2 (adapted): minimum-cost supplier per part in a region. p_mfgr
    * and the supplier address/phone/comment columns are absent — p_brand
    * stands in and the contact columns are dropped; acctbal reports as
    * exact cents (the Q10 spelling). The correlated min decorrelates
    * into an aggregate + join; costs are tie-free by construction so the
    * LIMIT boundary is pinned by the full ORDER key. Like q15/q17, the
    * partsupp CTE feeds both the outer block and the decorrelated min,
    * so lineitem's distinct-pair agg runs twice — the shared-SQL-text
    * purity beats a hand-split plan (the q15 precedent). */
  private[queries] val SqlQ2 =
    s"""$PartsuppCte
       |SELECT CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents,
       |  s_name, n_name, p_partkey, p_brand
       |FROM partsupp
       |JOIN part ON p_partkey = ps_partkey
       |JOIN supplier ON s_suppkey = ps_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
       |  AND ps_supplycost_cents = (
       |    SELECT min(ps2.ps_supplycost_cents)
       |    FROM partsupp ps2
       |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
       |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
       |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
       |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
       |ORDER BY acctbal_cents DESC, s_name, n_name, p_partkey
       |LIMIT 100""".stripMargin

  /** Q11 (adapted): important-stock identification — per-part stock
    * value for one nation's suppliers, kept when above a share of the
    * nation's total. The reference's fixed 0.0001/SF fraction is
    * scale-bound; the adapted threshold is 2× the mean per-part share
    * (scale-free, ~14% selectivity at every tested sf) and
    * CROSS-MULTIPLIES — value·n_parts > 2·total — so no float fraction
    * ever exists; sums CAST to BIGINT on both sides keeps DuckDB off
    * HUGEINT. */
  private[queries] val SqlQ11 =
    s"""$PartsuppCte,
       |by_part AS (
       |  SELECT ps_partkey,
       |    CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
       |  FROM partsupp
       |  JOIN supplier ON s_suppkey = ps_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_7'
       |  GROUP BY ps_partkey),
       |tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
       |               CAST(count(*) AS BIGINT) AS n_parts FROM by_part)
       |SELECT ps_partkey, value_cents
       |FROM by_part, tot
       |WHERE value_cents * n_parts > 2 * total_cents""".stripMargin

  /** Q16 (adapted): parts/supplier relationship — distinct suppliers
    * per (brand, type, size) outside one brand/type, over the classic
    * size list. The reference excludes suppliers with complaint
    * comments (s_comment absent); negative account balance is the
    * deterministic complaint surrogate (6% of suppliers). */
  private[queries] val SqlQ16 =
    s"""$PartsuppCte
       |SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM partsupp
       |JOIN part ON p_partkey = ps_partkey
       |WHERE p_brand <> 'Brand#1'
       |  AND p_type NOT LIKE 'MEDIUM%'
       |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.00)
       |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** Q20 (adapted): potential part promotion — suppliers in one nation
    * whose stock of a name-classed part exceeds half of what that
    * (part, supplier) pair actually shipped in 1996 ('red' stands in
    * for 'forest', ship date for the absent l_shipdate-vs-commitdate
    * pair). The half threshold cross-multiplies (availqty*2 > sum);
    * pairs that shipped nothing in the window yield a NULL sum and drop,
    * the reference's own semantics. */
  private[queries] val SqlQ20 =
    s"""$PartsuppCte
       |SELECT s_name, s_suppkey
       |FROM supplier
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE n_name = 'NATION_3'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |      AND ps_availqty * 2 > (
       |        SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |        FROM lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
       |ORDER BY s_name""".stripMargin

  val qSqlQ4: Q = (s, d) => withTpchViews(s, d)(SqlQ4)
  val qSqlQ7: Q = (s, d) => withTpchViews(s, d)(SqlQ7)
  val qSqlQ8: Q = (s, d) => { Tables.region(s, d).createOrReplaceTempView("region"); withTpchViews(s, d)(SqlQ8) }
  val qSqlQ10: Q = (s, d) => withTpchViews(s, d)(SqlQ10)
  val qSqlQ13: Q = (s, d) => withTpchViews(s, d)(SqlQ13)
  val qSqlQ14: Q = (s, d) => withTpchViews(s, d)(SqlQ14)
  val qSqlQ15: Q = (s, d) => withTpchViews(s, d)(SqlQ15)
  val qSqlQ17: Q = (s, d) => withTpchViews(s, d)(SqlQ17)
  val qSqlQ18: Q = (s, d) => withTpchViews(s, d)(SqlQ18)
  val qSqlQ9: Q = (s, d) => withTpchViews(s, d)(SqlQ9)
  val qSqlQ12: Q = (s, d) => withTpchViews(s, d)(SqlQ12)
  val qSqlQ19: Q = (s, d) => withTpchViews(s, d)(SqlQ19)
  val qSqlQ21: Q = (s, d) => withTpchViews(s, d)(SqlQ21)
  val qSqlQ22: Q = (s, d) => withTpchViews(s, d)(SqlQ22)
  /** R14: recursive CTE through the SQL front door — the calendar-spine
    * pattern (generate the month series, LEFT JOIN the monthly revenue
    * so empty months surface as explicit zeros instead of silently
    * missing rows). Spark 4's `WITH RECURSIVE` (UnionLoop execution)
    * and DuckDB run the IDENTICAL text; the spine is a fixed 84-month
    * literal range covering the corpus at every sf (well under Spark's
    * default 100-level recursion limit), revenue is exact cents.
    * Scale shape: the recursion generates 84 driver-side rows; the one
    * corpus pass is the month aggregate; the spine join broadcasts. */
  private[queries] val SqlRecursive =
    """WITH RECURSIVE months(m) AS (
      |  SELECT TIMESTAMP '1995-01-01 00:00:00'
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM months
      |  WHERE m < TIMESTAMP '2001-12-01 00:00:00'
      |),
      |rev AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev_cents,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT months.m AS month_start,
      |  coalesce(rev_cents, 0) AS rev_cents,
      |  coalesce(n_orders, 0) AS n_orders
      |FROM months LEFT JOIN rev ON rev.m = months.m""".stripMargin

  val qSqlRecursive: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlRecursive)
  }

  /** R14: ROLLUP through the SQL front door — subtotal rows at every
    * prefix level plus the grand total, with `grouping()` markers
    * distinguishing a genuine NULL key from a rolled-up one. The same
    * text runs on both engines, so the cross-engine claim covers the
    * NULL-group marker semantics, not just the math; counts and cents
    * are exact BIGINTs. One corpus pass — Spark expands the grouping
    * sets in a single Expand + hash-aggregate, never one pass per
    * level. */
  private[queries] val SqlRollup =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS price_cents,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  val qSqlRollup: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(SqlRollup)
  }

  /** R14 (third closing): CUBE through the SQL front door — every
    * grouping-set combination (both dims, each alone, grand total) with
    * grouping() markers disambiguating real NULL groups from subtotal
    * rows, one identical text on both engines. Like ROLLUP this is ONE
    * Expand + hash-aggregate corpus pass (4 replicas per row), never a
    * pass per grouping set. */
  private[queries] val SqlCube =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS price_cents,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  val qSqlCube: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(SqlCube)
  }

  /** R14 (third closing): the aggregate FILTER clause through the SQL
    * front door — per-group conditional aggregation written the
    * standard way (count/sum FILTER (WHERE ...)), one identical text on
    * both engines; the CASE-WHEN formulation every older query here
    * uses is the workaround this clause replaces. Single corpus pass,
    * map-side combined. */
  private[queries] val SqlFilter =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
      |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
      |    FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted_cents,
      |  CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
      |    AS BIGINT) AS n_return_supps
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin

  val qSqlFilter: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(SqlFilter)
  }

  /** R14 (4th closing): PIVOT through the SQL front door — the
    * SQL-standard relation-pivot clause with MULTIPLE aggregates and
    * aliased IN values, one identical text on both engines (the
    * DataFrame-API q_pivot has per-engine texts; this is the shared-text
    * parity statement, and it pins the `<valueAlias>_<aggAlias>` output
    * naming both engines derive). Exact cents; the outer CAST normalizes
    * DuckDB's HUGEINT sum. One Expand-free hash-aggregate corpus pass —
    * pivot is groupBy(l_returnflag) with conditional aggregates, never a
    * pass per pivot value. */
  private[queries] val SqlPivot =
    """SELECT l_returnflag,
      |  CAST(o_cents AS BIGINT) AS o_cents,
      |  CAST(f_cents AS BIGINT) AS f_cents,
      |  CAST(o_nr AS BIGINT) AS o_nr,
      |  CAST(f_nr AS BIGINT) AS f_nr
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS price_cents
      |  FROM lineitem)
      |PIVOT (sum(price_cents) AS cents, count(*) AS nr
      |       FOR l_linestatus IN ('O' AS o, 'F' AS f))""".stripMargin

  val qSqlPivot: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(SqlPivot)
  }

  /** R14 (4th closing): explicit GROUPING SETS through the SQL front
    * door — the general form ROLLUP/CUBE are sugar for, stated with an
    * ASYMMETRIC set list neither can express: ((a,b),(b),()) skips the
    * (a) level a ROLLUP would produce and the standalone (a) slice a
    * CUBE would add. grouping() markers tell the set-NULLs apart from
    * real NULLs; one Expand + hash-aggregate corpus pass (3 row
    * replicas), the q_sql_rollup/q_sql_cube discipline. Identical text
    * on both engines. */
  private[queries] val SqlGsets =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderpriority), ())""".stripMargin

  val qSqlGsets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlGsets)
  }

  /** R14 (4th closing): bag-semantics set operators through the SQL
    * front door — INTERSECT ALL and EXCEPT ALL in one shared text (the
    * DataFrame q_set_ops covers the distinct forms; the ALL forms pin
    * MULTIPLICITY semantics: min-of-counts for intersect,
    * count-difference for except). The final per-key count aggregate
    * keeps the compared result compact while still hashing the exact
    * multiplicities. */
  private[queries] val SqlSetops =
    """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |fin AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |both_arms AS (SELECT * FROM urgent INTERSECT ALL SELECT * FROM fin),
      |only_urgent AS (SELECT * FROM urgent EXCEPT ALL SELECT * FROM fin)
      |SELECT 'intersect_all' AS op, o_custkey, CAST(count(*) AS BIGINT) AS n
      |FROM both_arms GROUP BY 2
      |UNION ALL
      |SELECT 'except_all' AS op, o_custkey, CAST(count(*) AS BIGINT) AS n
      |FROM only_urgent GROUP BY 2""".stripMargin

  val qSqlSetops: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlSetops)
  }

  /** R14: window functions through the SQL front door — rank, a framed
    * running sum (ROWS 2 PRECEDING), and lag over one per-customer
    * ordering, the identical text on both engines (the DataFrame window
    * battery q_topk_window/q_running_sum/q_analytics has per-engine
    * oracle texts; this one is the shared-text parity statement). Exact
    * cents; the full ORDER key pins every tie. One shuffle on the
    * partition key, per-customer partitions stay order-history sized. */
  private[queries] val SqlWindow =
    """SELECT o_custkey, o_orderkey,
      |  CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
      |  CAST(rank() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_rank,
      |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS run3_cents,
      |  lag(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS prev_orderkey
      |FROM orders""".stripMargin

  /** R14: LATERAL correlated subquery through the SQL front door — the
    * per-row top-N shape (each customer's two priciest orders) written
    * the way an analyst writes it. Catalyst decorrelates the
    * ORDER-BY-LIMIT lateral into a row_number window — never the
    * per-row re-execution a naive reading implies — but KEEPS the
    * lateral's ORDER BY as a global range-partitioned sort under the
    * window (measured: 1.08 s vs q_topk_window's 0.27 s on the same
    * data — a documented negative, the d_simhash_nn discipline). The
    * front-door parity statement stands; production per-group top-N
    * writes the window form (q_topk_window), which plans the
    * partition-local sort only. Customers with no orders drop (inner
    * lateral semantics, both engines); exact cents, full ORDER key
    * pinning the LIMIT boundary. */
  private[queries] val SqlLateral =
    """SELECT c_custkey, o.o_orderkey, o.price_cents
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey,
      |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
      |  FROM orders WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin

  val qSqlLateral: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlLateral)
  }

  val qSqlWindow: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(SqlWindow)
  }

  val qSqlQ2: Q = (s, d) => { Tables.region(s, d).createOrReplaceTempView("region"); withTpchViews(s, d)(SqlQ2) }
  val qSqlQ11: Q = (s, d) => withTpchViews(s, d)(SqlQ11)
  val qSqlQ16: Q = (s, d) => withTpchViews(s, d)(SqlQ16)
  val qSqlQ20: Q = (s, d) => withTpchViews(s, d)(SqlQ20)

  /** Count-Min frequency sketch over event types — estimates are
    * oracle-EXACT (md5-derived integer buckets, same cells both
    * engines), completing the deterministic sketch suite (KMV ≈
    * cardinality, CMS ≈ frequency). */
  val qCmsFreq: Q = (s, d) =>
    graft.operators.Sketches.cmsFrequencies(Tables.events(s, d), "event_type")

  /** Bloom semi-join pre-filter: probe user_ids against the purchase
    * users' bloom bits — the broadcast filter that cuts shuffle volume
    * before an exact semi join at scale. Deterministic bits ⇒ the
    * candidate/member table is oracle-exact, including false
    * positives. */
  val qBloomFilter: Q = (s, d) => {
    val ev = Tables.events(s, d)
    graft.operators.Sketches.bloomPrefilter(
      ev, "user_id", ev.filter(col("event_type") === "purchase"), "user_id")
  }

  /** Non-equi range join (graft.operators.RangeJoin): return-flagged
    * lineitems shipped within 2 days of an urgent order's placement — no
    * key relates the two sides, only the time window. Binned into
    * 2-day buckets so the plan is a shuffled equi-join on the bin id
    * (≤ 2 replicas per order), never a nested-loop; the DuckDB oracle
    * runs the plain theta join (IEJoin there), so the binning machinery
    * is verified by an independent engine. Quantities are integer-valued,
    * so the sum is exact. */
  val qRangeJoin: Q = (s, d) => {
    val win = 2L * 86400
    val ord = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("o_sec"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_quantity"),
        col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"))
    graft.operators.RangeJoin
      .pointInInterval(ord, col("o_sec"), col("o_sec") + win,
        li, col("ship_sec"), binSeconds = win)
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_ship"), sum("l_quantity").cast("long").as("qty_sum"))
  }

  /** Interval-overlap join (RangeJoin.intervalOverlap): click/purchase
    * pairs of the same user whose 1-hour activity windows overlap —
    * interval × interval, both sides replicated into hour bins, pairs
    * deduplicated by the canonical meet bin (no distinct() pass). The
    * oracle runs the plain overlap theta join. */
  val qIntervalJoin: Q = (s, d) => {
    val win = 3600L
    def side(kind: String, idAs: String) = Tables.events(s, d)
      .filter(col("event_type") === kind)
      .select(col("user_id"), col("event_id").as(idAs),
        col("ts").cast("long").as(s"${idAs}_sec"))
    val clicks = side("click", "click_id")
    val purch = side("purchase", "purch_id")
    graft.operators.RangeJoin.intervalOverlap(
        clicks, col("click_id_sec"), col("click_id_sec") + win,
        purch, col("purch_id_sec"), col("purch_id_sec") + win,
        binSeconds = win, keys = Seq("user_id"))
      .select("user_id", "click_id", "purch_id")
  }

  /** Correlated-aggregate pattern: orders above their customer's average. */
  val qAboveAvg: Q = (s, d) => {
    val ord = Tables.orders(s, d)
    val avgs = ord.groupBy(col("o_custkey").as("ck")).agg(avg("o_totalprice").as("avg_price"))
    ord.join(avgs, ord("o_custkey") === avgs("ck"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** Salted skew join (graft.operators.SkewJoin): events (big, skewed
    * side) enriched with customer attributes. Result-set equality with the
    * plain join is the point — the oracle runs the UNSALTED join in
    * DuckDB, so the salting machinery is verified by an independent
    * engine, not just the spec's self-comparison. */
  val qSaltedJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_name"), col("c_nationkey"))
    graft.operators.SkewJoin
      .saltedJoin(Tables.events(s, d), cust, "user_id", "event_id", buckets = 8)
      .select("event_id", "user_id", "c_name", "c_nationkey")
  }

  /** Rank-analytics battery: ntile/percent_rank/cume_dist per priority
    * partition, ties broken by the unique order key so every rank — and
    * therefore every derived double — is engine-identical. */
  val qAnalytics: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(10).over(w).as("decile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  /** Deterministic cardinality sketch (MinCount / k-minimum-values family):
    * k=8 salted md5-prefix fractions, per-group minimum each, estimate
    * k/Σmin − 1. Unlike HLL (whose hash differs per engine —
    * q_approx_distinct is rows-only for that reason), every intermediate
    * here is an exact 52-bit integer over 2^52, so the ESTIMATE itself is
    * bit-identical cross-engine and oracle-checkable. Same one-pass
    * shuffle profile as a real sketch: min is a partial aggregate, the
    * shuffle carries k doubles per group. */
  val qKmvDistinct: Q = (s, d) => {
    val k = 8
    def frac(i: Int): Column =
      conv(substring(md5(concat(lit(s"$i:"), col("user_id"))), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // 16^13 = 2^52
    val mins = (0 until k).map(i => min(frac(i)).as(s"m$i"))
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(mins.head, mins.tail :+ countDistinct(col("user_id")).as("n_exact"): _*)
      .select(col("event_type"), col("n_exact"),
        TextOps.trunc(
          lit(k.toDouble) / (0 until k).map(i => col(s"m$i")).reduce(_ + _) - 1, 2)
          .as("est_distinct"))
  }

  /** DECIMAL(38,0) — the exact-integer carrier for second-moment math.
    * BIGINT overflows at 1e6·Σx² scale; DECIMAL(38,0) (int128-backed, like
    * DuckDB HUGEINT) holds every intermediate here with ≥5 digits of
    * headroom. */
  private val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
  private def d38(c: Column): Column = c.cast(D38)

  /** Floor division n/d for d > 0, exact: subtract the positive remainder
    * first so the division itself is even (no rounding anywhere). Spark's
    * `div` and DuckDB's `//` both truncate toward zero, so for NEGATIVE
    * numerators (covariance, correlation) the explicit pmod form is what
    * keeps the two engines pinned to the same (floor) convention. */
  private def floorDivD(n: Column, d: Column): Column =
    ((n - pmod(n, d)) / d).cast(D38)

  /** Integer sqrt of a non-negative DECIMAL(38,0) — REPRESENTATION-PROOF.
    * The double `sqrt` seeds a guess (env-sensitive by up to ~±8 ulps-worth
    * near 1e33 after the int→double conversion), one integer Newton step
    * collapses that error to ≤1, and an exact-integer candidate scan picks
    * the true floor. No double survives into the result, so FMA/libm
    * differences between environments cannot move the output. */
  private def isqrtD(x: Column): Column = {
    val one = d38(lit(1))
    val g0 = greatest(floor(sqrt(x.cast("double"))).cast(D38), one)
    val g1 = floorDivD(g0 + floorDivD(x, g0), d38(lit(2)))
    Seq(2, 1, 0, -1, -2)
      .map(k => g1 + d38(lit(k)))
      .foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(null))) {
        (acc, c) => acc.when(c * c <= x, c)
      }
      .otherwise(d38(lit(0)))
  }

  /** Statistical-aggregate battery: variance/stddev/covariance/correlation
    * per priority class. Built-in var_pop/corr are order-dependent double
    * sums (non-associative across 1000 executors AND across engines).
    * Round 4 proved the stronger lesson (q_stats failed the driver hash
    * gate while bit-exact locally): even truncated doubles derived from
    * exact integer sums are not cross-environment safe — a last-bit
    * division/sqrt/FMA difference crosses a floor(x·1e6) boundary. So the
    * OUTPUTS are now exact integers end-to-end, micro-scaled:
    * var_micro = ⌊1e6·(n·Σx² − (Σx)²)/n²⌋, std_micro = isqrt of the
    * 1e12-scaled numerator, cov/corr via the same floor-div over exact
    * int128 products. Zero doubles in the output schema. */
  val qStats: Q = (s, d) => {
    val n  = d38(col("n"))
    val sx = d38(col("sx"));  val sy = d38(col("sy"))
    val m2x = n * d38(col("sxx")) - sx * sx   // n²·var_x, exact ≥ 0
    val m2y = n * d38(col("syy")) - sy * sy
    val cxy = n * d38(col("sxy")) - sx * sy   // n²·cov_xy, exact, signed
    val n2  = n * n
    val mega = d38(lit(1000000L))
    val tera = d38(lit(1000000000000L))
    val corrDen = isqrtD(m2x * m2y)           // n²·sqrt(varx·vary), exact
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") / 100).cast("long").as("x"),
        col("o_custkey").as("y"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      .select(col("o_orderpriority"), col("n"), col("sx"),
        floorDivD(mega * m2x, n2).cast("long").as("var_micro_x"),
        isqrtD(floorDivD(tera * m2x, n2)).cast("long").as("std_micro_x"),
        floorDivD(mega * cxy, n2).cast("long").as("cov_micro_xy"),
        floorDivD(mega * cxy,
          when(corrDen === d38(lit(0)), lit(null)).otherwise(corrDen))
          .cast("long").as("corr_micro_xy"))
  }

  /** Grouped z-score normalization (the feature-scaling transform of a
    * training pipeline). Same representation-proof discipline as
    * [[qStats]]: z = (x − μ)/σ = (n·x − Σx)/√(n·Σx² − (Σx)²) with every
    * term an exact integer, emitted micro-scaled as
    * z_micro = ⌊1e6·(n·x − Σx) / isqrt(n·Σx² − (Σx)²)⌋ — an exact BIGINT,
    * immune to the driver environment's float behavior.
    *
    * Plan shape: per-group moments via a map-side-combined aggregate
    * (group-count rows) BROADCAST-joined back to the scan — NOT a window.
    * `partitionBy(event_type)` over a handful of distinct values would
    * funnel 100 TB into that many reducers (the r1–r4 window version's
    * latent skew), and the per-row isqrt Newton scan would re-run on
    * identical group values for every row; here the isqrt happens once
    * per GROUP and each row pays one decimal multiply-subtract-divide
    * inside whole-stage codegen. */
  val qZscore: Q = (s, d) => {
    val n   = d38(col("n"))
    val sx  = d38(col("sx"))
    val sxx = d38(col("sxx"))
    val m2 = n * sxx - sx * sx                 // n²·var, exact ≥ 0
    val zden = isqrtD(m2)
    val stats = Tables.events(s, d)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
        sum(col("cents") * col("cents")).as("sxx"))
      .select(col("event_type"), d38(col("n")).as("gn"), d38(col("sx")).as("gsx"),
        when(zden === d38(lit(0)), lit(null)).otherwise(zden).as("gden"))
    val znum = d38(lit(1000000L)) * (col("gn") * d38(col("cents")) - col("gsx"))
    Tables.events(s, d)
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        floorDivD(znum, col("gden")).cast("long").as("z_micro"))
  }

  /** Semi-structured battery over the events.props JSON column: path
    * extraction (get_json_object), schema-on-read (from_json → typed
    * struct), and re-serialization (to_json — Spark and DuckDB both emit
    * compact `{"a":1}` form). The collector's context payloads are JSON
    * strings, so this is the surface a user hits constantly. */
  val qJsonFns: Q = (s, d) => {
    val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType))))
    Tables.events(s, d)
      .withColumn("k_path", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("k_typed", parsed.getField("k"))
      .select(
        col("event_id"), col("k_path"), col("k_typed"),
        // null-safe: both-null (malformed/absent k) counts as agreement,
        // and the oracle can mirror it exactly (IS NOT DISTINCT FROM)
        (col("k_path") <=> col("k_typed")).as("apis_agree"),
        (col("k_path") % 10).as("k_mod"),
        to_json(struct(col("event_id"), col("k_typed").as("k"))).as("packed"))
  }

  /** Pivot (wide conditional aggregation): per-user event counts by type.
    * The value list is declared, so Catalyst plans ONE pass with a
    * conditional-agg per bucket — no per-value scans, one shuffle (the
    * same plan the oracle's FILTER aggregates describe). */
  val qPivot: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click").as("n_click"), col("view").as("n_view"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("error").as("n_error"))

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q_salted_join" -> qSaltedJoin,
    "q_analytics" -> qAnalytics,
    "q_kmv_distinct" -> qKmvDistinct,
    "q_pivot" -> qPivot,
    "q3_join" -> q3Join,
    "q5_join" -> q5Join,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_topk_window" -> qTopkWindow,
    "q_running_sum" -> qRunningSum,
    "q_event_gaps" -> qEventGaps,
    "q_zorder" -> qZorder,
    "q_merge_upsert" -> qMergeUpsert,
    "q_sessionize" -> qSessionize,
    "q_scd2" -> qScd2,
    "q_retention" -> qRetention,
    "q_hourly_window" -> qHourlyWindow,
    "q_distinct" -> qDistinct,
    "q_set_ops" -> qSetOps,
    "q_rollup" -> qRollup,
    "q_sort_limit" -> qSortLimit,
    "q_scalar_fns" -> qScalarFns,
    "q_asof_join" -> qAsofJoin,
    "q_asof_fwd" -> qAsofFwd,
    "q_above_avg" -> qAboveAvg,
    "q_funnel" -> qFunnel,
    "q_string_fns" -> qStringFns,
    "q_date_fns" -> qDateFns,
    "q_range_frame" -> qRangeFrame,
    "q_first_last" -> qFirstLast,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_percentiles" -> qPercentiles,
    "q_approx_distinct" -> qApproxDistinct,
    "q_approx_percentile" -> qApproxPercentile,
    "q_unpivot" -> qUnpivot,
    "q_histogram" -> qHistogram,
    "q_sql_q6" -> qSqlQ6,
    "q_cms_freq" -> qCmsFreq,
    "q_range_join" -> qRangeJoin,
    "q_interval_join" -> qIntervalJoin,
    "q_stats" -> qStats,
    "q_zscore" -> qZscore,
    "q_json_fns" -> qJsonFns,
    "q_sql_exists" -> qSqlExists,
    "q_sql_q4" -> qSqlQ4,
    "q_sql_q7" -> qSqlQ7,
    "q_sql_q8" -> qSqlQ8,
    "q_sql_q10" -> qSqlQ10,
    "q_sql_q13" -> qSqlQ13,
    "q_sql_q14" -> qSqlQ14,
    "q_sql_q15" -> qSqlQ15,
    "q_sql_q17" -> qSqlQ17,
    "q_sql_q18" -> qSqlQ18,
    "q_sql_q9" -> qSqlQ9,
    "q_sql_q12" -> qSqlQ12,
    "q_sql_q19" -> qSqlQ19,
    "q_sql_q21" -> qSqlQ21,
    "q_sql_q22" -> qSqlQ22,
    "q_sql_q2" -> qSqlQ2,
    "q_sql_q11" -> qSqlQ11,
    "q_sql_q16" -> qSqlQ16,
    "q_sql_q20" -> qSqlQ20,
    "q_sql_recursive" -> qSqlRecursive,
    "q_sql_rollup" -> qSqlRollup,
    "q_sql_cube" -> qSqlCube,
    "q_sql_filter" -> qSqlFilter,
    "q_sql_pivot" -> qSqlPivot,
    "q_sql_gsets" -> qSqlGsets,
    "q_sql_setops" -> qSqlSetops,
    "q_sql_window" -> qSqlWindow,
    "q_sql_lateral" -> qSqlLateral,
    "q_bloom_filter" -> qBloomFilter,
  )
}
