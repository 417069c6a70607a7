package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryDsl._

/** The relational operator inventory (SURVEY.md §2.B) expressed as runnable
  * catalog queries over the driver test tables, each with a DuckDB oracle.
  *
  * Scale discipline (local[32] tests, 1000-executor target):
  *  - dimension tables (part/nation/region/supplier/customer at this ratio)
  *    are joined with explicit `broadcast()` hints — no shuffle of the fact
  *    side beyond its aggregation keys;
  *  - fact-fact joins (orders x lineitem) rely on sort-merge + AQE;
  *  - aggregates go partial->final (map-side combine) automatically since
  *    everything is expressed via groupBy/agg, never collect-side;
  *  - money sums run through DECIMAL (see QueryDsl) — reproducible under
  *    any partitioning.
  */
object RelationalQueries {

  val all: Seq[CatalogQuery] = Seq(

    // ---- aggregation core -------------------------------------------------
    CatalogQuery(
      "q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum2(col("l_quantity")).as("sum_qty"),
            dsum2(col("l_extendedprice")).as("sum_base_price"),
            sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
            davg2(col("l_quantity")).as("avg_qty"),
            davg2(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    CatalogQuery(
      "q02_top_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    CatalogQuery(
      "q03_priority_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        o.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            countDistinct(col("o_orderkey")).as("n_orders"),
            sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    CatalogQuery(
      "q04_brand_volume",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    CatalogQuery(
      "q05_region_balance",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"), davg2(col("c_acctbal")).as("avg_bal"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_customers,
        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // ---- semi / anti joins ------------------------------------------------
    CatalogQuery(
      "q06_status_with_items",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum6(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    CatalogQuery(
      "q07_customers_without_events",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val e = t(s, dir, "events")
        c.join(e, col("c_custkey") === col("user_id"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        ORDER BY c_custkey""")),

    // ---- set operations ---------------------------------------------------
    CatalogQuery(
      "q08_active_nations",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        c.union(su).distinct().orderBy(col("nk"))
      },
      Some("""SELECT DISTINCT nk FROM (
          SELECT c_nationkey AS nk FROM customer
          UNION ALL SELECT s_nationkey AS nk FROM supplier) u
        ORDER BY nk""")),

    CatalogQuery(
      "q09_flag_status_pairs",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    CatalogQuery(
      "q19_users_never_purchased_except",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.select(col("user_id"))
          .except(e.filter(col("event_type") === "purchase").select(col("user_id")))
          .orderBy(col("user_id"))
      },
      Some("""SELECT * FROM (
          SELECT user_id FROM events
          EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase') x
        ORDER BY user_id""")),

    CatalogQuery(
      "q20_custkeys_with_orders_intersect",
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey"))
          .intersect(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
          .orderBy(col("c_custkey")),
      Some("""SELECT * FROM (
          SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) x
        ORDER BY c_custkey""")),

    // ---- window functions -------------------------------------------------
    CatalogQuery(
      "q10_latest_event_per_user",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type, value, ts FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
        WHERE rn = 1 ORDER BY user_id""")),

    CatalogQuery(
      "q11_user_running_total",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .select(
            col("user_id"), col("event_id"),
            sum(dec2(col("value"))).over(w).cast("double").as("running"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        FROM events ORDER BY user_id, event_id""")),

    CatalogQuery(
      "q12_supplier_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        t(s, dir, "supplier")
          .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
            dense_rank().over(w).as("rnk"))
          .orderBy(col("s_nationkey"), col("rnk"), col("s_suppkey"))
      },
      Some("""SELECT s_nationkey, s_suppkey, s_acctbal,
        CAST(dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS rnk
        FROM supplier ORDER BY s_nationkey, rnk, s_suppkey""")),

    // ---- grouping sets ----------------------------------------------------
    CatalogQuery(
      "q13_rollup_volume",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum2(col("l_quantity")).as("sum_qty"))
          .orderBy(asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""")),

    CatalogQuery(
      "q14_cube_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum6(col("o_totalprice")).as("total"))
          .orderBy(asc_nulls_last("o_orderstatus"), asc_nulls_last("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""")),

    // ---- conditional aggregation -----------------------------------------
    CatalogQuery(
      "q15_conditional_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(col("l_discount") > 0.05, revenue(col("l_extendedprice"), col("l_discount"))))
              .cast("double").as("disc_rev"),
            count(when(col("l_tax") > 0.04, lit(1))).as("hi_tax_items"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN l_discount > 0.05
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS disc_rev,
        count(CASE WHEN l_tax > 0.04 THEN 1 END) AS hi_tax_items
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- scalar functions -------------------------------------------------
    CatalogQuery(
      "q16_part_strings",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(substring(col("p_name"), 1, 8)).as("prefix"),
            length(col("p_name")).as("name_len"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(substr(p_name, 1, 8)) AS prefix,
        CAST(length(p_name) AS INTEGER) AS name_len,
        concat(p_brand, '#', p_type) AS brand_type
        FROM part ORDER BY p_partkey""")),

    CatalogQuery(
      "q17_orders_by_month",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mon"))
          .agg(count(lit(1)).as("n_orders"), dsum6(col("o_totalprice")).as("total"))
          .orderBy(col("yr"), col("mon")),
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mon,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    CatalogQuery(
      "q18_event_time_buckets",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total_value"))
          .select(col("window.start").as("bucket_start"), col("event_type"), col("n"), col("total_value"))
          .orderBy(col("bucket_start"), col("event_type")),
      Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- distinct aggregates / having ------------------------------------
    CatalogQuery(
      "q21_distinct_counts",
      (s, dir) =>
        t(s, dir, "lineitem")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows FROM lineitem""")),

    CatalogQuery(
      "q22_big_customers",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum6(col("o_totalprice")).as("total"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""")),

    // ---- CDC materialization as a query (cdc.py:132-142 + op filter) ------
    CatalogQuery(
      "q23_cdc_current_state",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(
            col("user_id"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            col("value").as("last_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        value AS last_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
        WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""")),

    // ---- null-ordering sorts ---------------------------------------------
    CatalogQuery(
      "q24_nulls_last_sort",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), expr("nullif(o_orderpriority, '1-URGENT')").as("prio"))
          .orderBy(col("prio").asc_nulls_last, col("o_orderkey"))
          .limit(100),
      Some("""SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio
        FROM orders ORDER BY prio ASC NULLS LAST, o_orderkey LIMIT 100""")),

    // ---- range (theta) join ----------------------------------------------
    CatalogQuery(
      "q25_shipped_within_30d",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") >= col("o_orderdate") &&
              col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_quick"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, count(*) AS n_quick
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // ---- pivot ------------------------------------------------------------
    CatalogQuery(
      "q26_event_type_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .count()
          .na.fill(0L, types)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- sketches ---------------------------------------------------------
    // HLL sketch estimates are estimator-specific, so the raw numbers can't
    // hash-match across engines — but the oracle-able INVARIANT can: each
    // engine emits its exact distinct counts plus a boolean asserting its
    // OWN estimator landed within 5% of its OWN exact. High-precision sketch
    // configs (rsd=0.01; lgConfigK=16 → ~0.6% 1-sigma) make 5% a many-sigma
    // bound, so the booleans are deterministically true in both engines.
    // The exact countDistincts and the sketches are computed in SEPARATE
    // aggregations joined on l_returnflag: combining them in one agg makes
    // Catalyst plan the multi-distinct Expand with the HLL buffers keyed on
    // (group, distinct-col, gid) — one ~13 KB sketch buffer PER DISTINCT KEY
    // crossing the shuffle, which is an OOM at scale. Split, each side plans
    // as a clean partial/final pair with one small row per group.
    CatalogQuery(
      "q29_approx_distinct",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val exact = li
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_suppkey")).as("exact_supps"))
        val sketch = li
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
            hll_sketch_estimate(hll_sketch_agg(col("l_suppkey"), 16)).as("hs"))
        exact
          .join(sketch, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
            (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05)
              .as("parts_within_5pct"),
            (abs(col("hs") - col("exact_supps")) <= col("exact_supps") * 0.05)
              .as("supps_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          count(DISTINCT l_partkey) AS exact_parts,
          count(DISTINCT l_suppkey) AS exact_supps,
          abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
            <= count(DISTINCT l_partkey) * 0.05 AS parts_within_5pct,
          abs(approx_count_distinct(l_suppkey) - count(DISTINCT l_suppkey))
            <= count(DISTINCT l_suppkey) * 0.05 AS supps_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // The q29 invariant trick applied to the other big sketch family —
    // quantiles: the EXACT median is an integer order statistic over
    // cents (interpolated medians differ across engines in the last
    // ulp — the d19/d21 class), and each engine's own quantile sketch
    // (GK here, t-digest in DuckDB) must land within 5% of its own exact
    // value (q29's tolerance — 1% was estimator-coupled flakiness risk).
    // Exact medians hash-match; sketch accuracy rides as booleans.
    // median_price is DOUBLE on output: DECIMAL output columns
    // hash-mismatch in the driver's canonicalizer (r5 lesson).
    CatalogQuery(
      "q43_median_sketch",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cents = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            (dec2(col("l_extendedprice")) * 100).cast("long").as("cents"))
        // hist feeds TWO consumers (cum + n) and is deliberately NOT
        // materialized: it holds ~|distinct (flag, cents)| rows (hundreds of
        // thousands), so a checkpoint write costs more than re-running the
        // columnar scan+agg — measured r19: barrier 3.62s vs recompute 2.90s
        val hist = cents.groupBy(col("flag"), col("cents")).agg(count(lit(1)).as("c"))
        val cum = hist.withColumn("cum",
          sum(col("c")).over(Window.partitionBy(col("flag")).orderBy(col("cents"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val n = hist.groupBy(col("flag")).agg(sum(col("c")).as("n"))
        val med = cum.join(broadcast(n), "flag")
          .groupBy(col("flag"))
          .agg(min(when(col("cum") > expr("(n - 1) DIV 2"), col("cents"))).as("med_cents"))
        val approx = cents.groupBy(col("flag"))
          .agg(percentile_approx(col("cents"), lit(0.5), lit(10000)).as("ap"))
        med.join(approx, Seq("flag"))
          .select(col("flag").as("l_returnflag"),
            (col("med_cents").cast(org.apache.spark.sql.types.DecimalType(12, 0))
              * expr("CAST(0.01 AS DECIMAL(3,2))"))
              .cast(org.apache.spark.sql.types.DecimalType(18, 2))
              .cast("double").as("median_price"),
            (abs(col("ap") - col("med_cents")) <= col("med_cents") * 0.05)
              .as("median_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH cents AS (
          SELECT l_returnflag AS flag,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM lineitem),
        h AS (SELECT flag, cents, count(*) AS c FROM cents GROUP BY 1, 2),
        cu AS (SELECT flag, cents,
                 sum(c) OVER (PARTITION BY flag ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM h),
        nn AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
        med AS (SELECT flag, min(CASE WHEN cum > (n - 1) // 2 THEN cents END) AS med_cents
                FROM cu JOIN nn USING (flag) GROUP BY 1),
        ap AS (SELECT flag, approx_quantile(cents, 0.5) AS ap FROM cents GROUP BY 1)
        SELECT med.flag AS l_returnflag,
          CAST(CAST(CAST(med_cents AS DECIMAL(12,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,2)) AS DOUBLE) AS median_price,
          abs(ap - med_cents) <= med_cents * 0.05 AS median_within_5pct
        FROM med JOIN ap USING (flag) ORDER BY 1""")),

    // ---- date functions ---------------------------------------------------
    CatalogQuery(
      "q27_monthly_order_span",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("mon_start"))
          .agg(
            min(col("o_orderdate")).as("first_order"),
            max(col("o_orderdate")).as("last_order"),
            count(lit(1)).as("n"))
          .orderBy(col("mon_start")),
      Some("""SELECT date_trunc('month', o_orderdate) AS mon_start,
        min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
        count(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- grouping sets ----------------------------------------------------
    // Explicit GROUPING SETS (beyond rollup q13 / cube q14): chosen subsets
    // only — (status, priority), (status), () — one pass, map-side combined.
    CatalogQuery(
      "q30_grouping_sets",
      (s, dir) =>
        t(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq.empty),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
          .orderBy(asc_nulls_last("o_orderstatus"), asc_nulls_last("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""")),

    // ---- skew mitigation (results must equal the plain equivalents) ------
    // Two-path skew-aware join: hot user_ids ride the salted path, the
    // tail joins normally — output is required to be IDENTICAL to a plain
    // join, which is exactly what the oracle checks.
    CatalogQuery(
      "q31_skew_aware_join",
      (s, dir) => {
        val events = t(s, dir, "events").select(col("event_id"), col("user_id"))
        val users = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_name"))
        graft.ext.Skew.skewAwareJoin(events, users, Seq("user_id"),
            hotKeyMinCount = 50, salt = 8)
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id, c.c_name
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        ORDER BY e.event_id""")),

    // Salted two-phase aggregation: partial on (key, salt), final on key —
    // identical results to the single-phase GROUP BY the oracle runs.
    CatalogQuery(
      "q32_salted_agg",
      (s, dir) =>
        graft.ext.Skew.saltedAgg(
            t(s, dir, "events").select(col("user_id"), col("value")),
            Seq("user_id"), salt = 8)(
            partial = Seq(count(lit(1)).as("pc"), sum(dec6(col("value"))).as("pv")),
            finalAgg = Seq(sum(col("pc")).as("n"),
              sum(col("pv")).cast("double").as("total_value")))
          .orderBy(col("user_id")),
      Some("""SELECT user_id, count(*) AS n,
          CAST(sum(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- full outer join --------------------------------------------------
    // Users seen in orders vs users seen in events: both unmatched sides
    // survive with nulls. Shuffle on the key both sides — the one join
    // class where neither side can be discarded, so no broadcast/semi
    // shortcut applies; AQE handles the merge.
    CatalogQuery(
      "q33_full_outer_activity",
      (s, dir) => {
        val buyers = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("user_id"))
          .agg(count(lit(1)).as("n_orders"))
        val actors = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        buyers.join(actors, Seq("user_id"), "full_outer")
          .orderBy(asc_nulls_last("user_id"))
      },
      Some("""WITH b AS (SELECT o_custkey AS user_id, count(*) AS n_orders
                 FROM orders GROUP BY 1),
               a AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        SELECT coalesce(b.user_id, a.user_id) AS user_id, n_orders, n_events
        FROM b FULL OUTER JOIN a ON b.user_id = a.user_id
        ORDER BY user_id NULLS LAST""")),

    // ---- range-frame window ----------------------------------------------
    // Trailing 1-hour event count per user: a RANGE (event-time interval)
    // frame, not a ROWS frame — the sliding-window-by-time class.
    CatalogQuery(
      "q34_trailing_hour_window",
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("graft_q34_events")
        s.sql("""SELECT user_id, event_id,
            count(*) OVER (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
          FROM graft_q34_events ORDER BY event_id""")
      },
      Some("""SELECT user_id, event_id,
          count(*) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        FROM events ORDER BY event_id""")),

    // ---- lateral correlated subquery -------------------------------------
    // Most expensive order per nation's customers via LATERAL — the
    // correlated-subquery rewrite class (decorrelates to a join under
    // Catalyst, stays a lateral loop join only if it must).
    CatalogQuery(
      "q35_lateral_top_order",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("graft_q35_customer")
        t(s, dir, "orders").createOrReplaceTempView("graft_q35_orders")
        s.sql("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM graft_q35_customer c,
            LATERAL (SELECT o_orderkey, o_totalprice FROM graft_q35_orders
                     WHERE o_custkey = c.c_custkey
                     ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
          ORDER BY c.c_custkey""")
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                   WHERE o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        ORDER BY c.c_custkey""")),

    // ---- scalar subqueries -----------------------------------------------
    CatalogQuery(
      "q36_above_avg_orders",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("graft_q36_orders")
        s.sql("""SELECT o_orderkey,
            CAST(o_totalprice AS DOUBLE) AS price
          FROM graft_q36_orders
          WHERE o_totalprice > (SELECT avg(CAST(o_totalprice AS DECIMAL(18,2)) ) * 1.8
                                FROM graft_q36_orders)
          ORDER BY o_orderkey""")
      },
      // price is a per-row parquet read (no float arithmetic), so DOUBLE is
      // bit-exact across engines; a DECIMAL output column hash-mismatches in
      // the driver's canonicalizer even when values are identical. The
      // threshold subquery keeps the DECIMAL avg: both engines agree on the
      // row set either way, and only the output representation must align.
      Some("""SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
        WHERE o_totalprice > (SELECT avg(CAST(o_totalprice AS DECIMAL(18,2))) * 1.8
                              FROM orders)
        ORDER BY o_orderkey""")),

    // ---- EXISTS / NOT EXISTS correlated subqueries -----------------------
    CatalogQuery(
      "q37_exists_urgent",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("graft_q37_customer")
        t(s, dir, "orders").createOrReplaceTempView("graft_q37_orders")
        s.sql("""SELECT c_custkey, c_name FROM graft_q37_customer c
          WHERE EXISTS (SELECT 1 FROM graft_q37_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
            AND NOT EXISTS (SELECT 1 FROM graft_q37_orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---- ordered string aggregation --------------------------------------
    CatalogQuery(
      "q38_nations_per_region",
      (s, dir) => {
        t(s, dir, "region").createOrReplaceTempView("graft_q38_region")
        t(s, dir, "nation").createOrReplaceTempView("graft_q38_nation")
        s.sql("""SELECT r.r_name,
            listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
          FROM graft_q38_region r JOIN graft_q38_nation n ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name ORDER BY r.r_name""")
      },
      Some("""SELECT r.r_name,
          string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""")),

    // ---- semi-structured (JSON) extraction -------------------------------
    // events.props holds JSON; extract a field, aggregate it. The
    // JSON-path evaluation happens inside the scan projection — no
    // intermediate materialization of parsed structs.
    CatalogQuery(
      "q39_json_props",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("k_sum"),
            max("k").as("k_max"))
          .orderBy("event_type"),
      // DuckDB's sum(BIGINT) widens to HUGEINT (int128) — hash-mismatches
      // Spark's BIGINT even for equal values; the outer CAST pins it back.
      Some("""SELECT event_type, count(*) AS n,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
          max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- null-aware anti join (NOT IN) -----------------------------------
    // NOT IN over a nullable subquery column is its own operator class
    // (null-aware anti join): one NULL in the subquery empties the result,
    // and Spark must plan NAAJ, not a plain LeftAnti. The subquery column
    // here is made nullable-but-never-null via nullif so the semantics are
    // exercised with a non-degenerate result.
    CatalogQuery(
      "q40_not_in_suppliers",
      (s, dir) => {
        t(s, dir, "supplier").createOrReplaceTempView("graft_q40_supplier")
        t(s, dir, "lineitem").createOrReplaceTempView("graft_q40_lineitem")
        s.sql("""SELECT s_suppkey, s_name FROM graft_q40_supplier
          WHERE s_suppkey NOT IN
            (SELECT nullif(l_suppkey, -1) FROM graft_q40_lineitem
             WHERE l_returnflag = 'R' AND l_quantity > 49 AND l_discount > 0.05)
          ORDER BY s_suppkey""")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey NOT IN
          (SELECT nullif(l_suppkey, -1) FROM lineitem
           WHERE l_returnflag = 'R' AND l_quantity > 49 AND l_discount > 0.05)
        ORDER BY s_suppkey""")),

    // ---- ntile bucketing --------------------------------------------------
    // Quartile assignment within each priority class (deterministic: ties
    // broken by orderkey so both engines agree on row order).
    CatalogQuery(
      "q41_price_quartiles",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("quartile", ntile(4).over(
            Window.partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice"), col("o_orderkey"))))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(count(lit(1)).as("n"), dsum2(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"), col("quartile")),
      Some("""WITH q AS (
          SELECT o_orderpriority, o_totalprice,
            CAST(ntile(4) OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
          FROM orders)
        SELECT o_orderpriority, quartile, count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM q GROUP BY o_orderpriority, quartile
        ORDER BY o_orderpriority, quartile""")),

    // ---- lag / lead -------------------------------------------------------
    // Previous and next event type per user (offset window functions).
    CatalogQuery(
      "q42_event_neighbors",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT user_id, event_id, event_type,
          lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
          lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events ORDER BY event_id""")),

    // ---- distribution window functions ------------------------------------
    // percent_rank / cume_dist plus framed first_value/last_value — the
    // remaining analytic-window family q10-q12/q41/q42 don't cover. The
    // ordering carries s_suppkey so rank positions (and the framed
    // first/last picks) are total-ordered on both engines.
    CatalogQuery(
      "q44_window_distribution",
      (s, dir) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal"), col("s_suppkey"))
        val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "supplier")
          .select(col("s_nationkey"), col("s_suppkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first(col("s_name")).over(frame).as("poorest"),
            last(col("s_name")).over(frame).as("richest"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_nationkey, s_suppkey,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd,
          first_value(s_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
          last_value(s_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        ORDER BY s_suppkey""")),

    // ---- array higher-order functions -------------------------------------
    // Per-order quantity vector (ordered by line number) processed with
    // HOFs: aggregate (fold), filter, element access — the semi-structured
    // array family. Spark sorts a (linenumber, qty) struct list to get
    // deterministic order; DuckDB's list() supports ORDER BY directly.
    // The test generator does NOT keep l_linenumber unique per order, so
    // the ordering carries l_quantity too — equal (ln, qty) ties collapse
    // to identical array values, keeping the order total in effect.
    CatalogQuery(
      "q45_array_hof",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(expr(
            "transform(array_sort(collect_list(struct(l_linenumber, l_quantity)))," +
              " x -> CAST(x.l_quantity AS BIGINT))").as("qtys"))
          .select(col("l_orderkey"),
            expr("aggregate(qtys, 0L, (acc, x) -> acc + x)").as("total_qty"),
            expr("CAST(size(filter(qtys, x -> x >= 25)) AS BIGINT)").as("n_big"),
            expr("qtys[0] * 2").as("first_doubled"))
          .orderBy(col("l_orderkey")),
      Some("""WITH arr AS (
          SELECT l_orderkey,
            list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber, l_quantity) AS qtys
          FROM lineitem GROUP BY 1)
        SELECT l_orderkey,
          CAST(list_sum(qtys) AS BIGINT) AS total_qty,
          CAST(len(list_filter(qtys, x -> x >= 25)) AS BIGINT) AS n_big,
          qtys[1] * 2 AS first_doubled
        FROM arr ORDER BY l_orderkey""")),

    // ---- gaps and islands -------------------------------------------------
    // Batch sessionization: a new session opens after a >30 min silence;
    // session ids are running sums of the boundary flags. The gap compare
    // runs on integer MICROS on both engines — interval/second arithmetic
    // truncates differently at sub-second boundaries. (The streaming
    // equivalent is StreamOps.sessionize / session_window.)
    CatalogQuery(
      "q46_event_sessions",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            lag(unix_micros(col("ts")), 1).over(w).as("__prev_us"))
          .withColumn("__ns",
            when(col("__prev_us").isNull ||
              unix_micros(col("ts")) - col("__prev_us") > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("__ns")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH x AS (
          SELECT user_id, event_id, ts,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events),
        s AS (SELECT user_id, event_id, ts,
                CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns
              FROM x),
        g AS (SELECT user_id, ts,
                sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM s)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
        FROM g GROUP BY 1, 2 ORDER BY user_id, session_id"""))
  ) ++ Seq(statsAgg, recursiveCte, windowDistinct, unpivotCharges, medallionCdc,
    incrementalAgg, sqlMerge, dvDml, columnMapping)

  // ---- ANSI SQL MERGE over a graft table ----------------------------------
  // The SQL DML surface (GraftDmlRule): events seed a graft catalog table,
  // a derived change set MERGEs in through spark.sql — matched deletes,
  // matched updates (SET *), conditional inserts — and the final state is
  // aggregated. The DuckDB oracle replays the same merge relationally, so
  // hash equality gates the whole injected-rule + command path, exactly as
  // the API upsert is gated by q51/q52. Keys are unique on both sides
  // (event_id; changes remap b=1 rows onto event_id-1), satisfying the
  // ANSI cardinality rule the command enforces.
  private lazy val sqlMerge: CatalogQuery = CatalogQuery(
    "q53_sql_merge",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q53-").toString
      implicit val st: graft.conf.GraftSettings = graft.conf.GraftSettings.local(tmp)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("value"),
          pmod(col("event_id"), lit(2)).as("b"))
      val target = graft.tables.GraftTable(s, s"$tmp/t")
      target.overwrite(ev.filter(col("b") === 0).drop("b"))
      s.sql("DROP TABLE IF EXISTS q53_target")
      s.sql(s"CREATE TABLE q53_target USING graft LOCATION '${target.path}'")
      ev.filter(col("b") === 1)
        .select(col("user_id"), (col("event_id") - 1).as("event_id"),
          col("event_type"), col("value"))
        .createOrReplaceTempView("q53_changes")
      s.sql(
        """MERGE INTO q53_target t USING q53_changes c ON t.event_id = c.event_id
          |WHEN MATCHED AND c.event_type = 'error' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED AND c.event_type != 'error' THEN INSERT *
          |""".stripMargin)
      val out = s.table("q53_target")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
        .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch lake
      s.sql("DROP TABLE IF EXISTS q53_target")
      graft.lake.FsUtils.deletePath(s, s"file://$tmp")
      out
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id, event_type,
          CAST(value AS DECIMAL(18,6)) AS value, event_id % 2 AS b
        FROM events),
      t0 AS (SELECT user_id, event_id, event_type, value FROM ev WHERE b = 0),
      ch AS (SELECT user_id, event_id - 1 AS event_id, event_type, value
        FROM ev WHERE b = 1),
      merged AS (
        SELECT * FROM t0 WHERE event_id NOT IN (SELECT event_id FROM ch)
        UNION ALL
        SELECT c.* FROM ch c JOIN t0 t ON t.event_id = c.event_id
        WHERE c.event_type <> 'error'
        UNION ALL
        SELECT c.* FROM ch c
        WHERE c.event_id NOT IN (SELECT event_id FROM t0)
          AND c.event_type <> 'error')
      SELECT event_type, count(*) AS cnt, CAST(sum(value) AS DOUBLE) AS sum_value
      FROM merged GROUP BY event_type ORDER BY event_type"""))

  // ---- deletion-vector DML ------------------------------------------------
  // Row-level DELETE + UPDATE through deletion vectors (GraftTable with
  // settings.deletionVectors): the error rows are marked dead and the
  // purchase rows re-valued WITHOUT rewriting the untouched data files —
  // the requires pin that the commits really carried DV sidecars (a
  // silent fallback to the rewrite path would still produce the right
  // rows and hide the feature). The DuckDB oracle replays the same DML
  // relationally over the raw parquet; hash equality proves the bitmaps
  // drop/revalue EXACTLY the DML'd rows across every read path the agg
  // plan touches.
  private lazy val dvDml: CatalogQuery = CatalogQuery(
    "q54_dv_dml",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q54-").toString
      implicit val st: graft.conf.GraftSettings =
        graft.conf.GraftSettings.local(tmp).copy(deletionVectors = true)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("value"))
      val tb = graft.tables.GraftTable(s, s"$tmp/t")
      tb.overwrite(ev)
      val del = tb.delete(col("event_type") === lit("error"))
      require(del.exists(_.dvs.exists(_.nonEmpty)),
        "q54: DELETE did not take the deletion-vector path")
      val upd = tb.update(col("event_type") === lit("purchase"),
        Map("value" -> (col("value") * 2)))
      require(upd.exists(_.dvs.exists(_.nonEmpty)),
        "q54: UPDATE did not take the deletion-vector path")
      val out = tb.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
        .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch lake
      graft.lake.FsUtils.deletePath(s, s"file://$tmp")
      out
    },
    Some("""WITH ev AS (
        SELECT event_type, CAST(value AS DECIMAL(18,6)) AS value FROM events),
      kept AS (
        SELECT event_type,
          CASE WHEN event_type = 'purchase'
            THEN CAST(value * 2 AS DECIMAL(18,6)) ELSE value END AS value
        FROM ev WHERE event_type <> 'error')
      SELECT event_type, count(*) AS cnt, CAST(sum(value) AS DOUBLE) AS sum_value
      FROM kept GROUP BY event_type ORDER BY event_type"""))

  // ---- column mapping -----------------------------------------------------
  // RENAME COLUMN as a metadata-only commit (zero files touched — the
  // require pins it), then DML under the NEW logical name, a post-rename
  // append (staged under the ORIGINAL physical name so both generations
  // share one scan), and a DROP. The DuckDB oracle replays the same ops
  // relationally over the raw parquet; hash equality proves the
  // logical->physical mapping binds every read and write path exactly.
  private lazy val columnMapping: CatalogQuery = CatalogQuery(
    "q55_column_mapping",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q55-").toString
      implicit val st: graft.conf.GraftSettings = graft.conf.GraftSettings.local(tmp)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("value"))
      val tb = graft.tables.GraftTable(s, s"$tmp/t")
      tb.overwrite(ev)
      val files0 = tb.liveFiles().toSet
      tb.renameColumn("event_type", "etype")
      require(tb.liveFiles().toSet == files0 && !tb.commits().last.dataChange,
        "q55: rename must be a metadata-only commit")
      // DML binds the NEW logical name against OLD physical files
      tb.delete(col("etype") === lit("error"))
      // a post-rename append writes under the original PHYSICAL name
      tb.append(tb.read().filter(col("etype") === lit("view")))
      // dropping an unrelated column is metadata-only and invisible below
      tb.dropColumn("user_id")
      require(tb.read().columns.sameElements(Array("event_id", "etype", "value")),
        "q55: dropped column still visible")
      val out = tb.read()
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value")).cast("double").as("sum_value"))
        .orderBy(col("etype"))
        .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch lake
      graft.lake.FsUtils.deletePath(s, s"file://$tmp")
      out
    },
    Some("""WITH ev AS (
        SELECT event_type AS etype, CAST(value AS DECIMAL(18,6)) AS value
        FROM events),
      kept AS (SELECT * FROM ev WHERE etype <> 'error'),
      doubled AS (
        SELECT * FROM kept
        UNION ALL
        SELECT * FROM kept WHERE etype = 'view')
      SELECT etype, count(*) AS cnt, CAST(sum(value) AS DOUBLE) AS sum_value
      FROM doubled GROUP BY etype ORDER BY etype"""))

  // ---- incrementally-maintained aggregate ---------------------------------
  // Materialized-view maintenance over the change feed (IncrementalAgg):
  // events become a DML'd source table (overwrite, append, MERGE with
  // deletes, DELETE WHERE), and the per-type count/sum aggregate is kept
  // fresh by folding ONLY each commit range's change rows — O(delta) per
  // refresh, never a source re-scan. The DuckDB oracle replays the same
  // DML relationally and recomputes the aggregate from the FINAL state:
  // maintained == recomputed is exactly the invariant the operator sells.
  // Values are frozen to DECIMAL(18,6) at the source (double sums under
  // retraction would drift by reassociation; decimal folds are exact).
  private lazy val incrementalAgg: CatalogQuery = CatalogQuery(
    "q52_incremental_agg",
    (s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q52-").toString
      implicit val st: graft.conf.GraftSettings =
        graft.conf.GraftSettings.local(tmp).copy(changeDataFeed = true)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value").cast("decimal(18,6)").as("value"),
          pmod(col("event_id"), lit(3)).as("b"))
      val src = graft.tables.GraftTable(s, s"$tmp/src")
      val agg = graft.tables.IncrementalAgg(s, s"$tmp/agg", src,
        Seq("event_type"), Seq("value"))
      src.overwrite(ev.filter(col("b") === 0).drop("b"))
      agg.refresh()
      src.append(ev.filter(col("b") === 1).drop("b"))
      agg.refresh()
      // MERGE: each b=2 event lands on key event_id-2 (a b=0 key) — errors
      // delete that key, the rest replace it with the b=2 row's content
      src.upsert(
        ev.filter(col("b") === 2)
          .select(col("user_id"), (col("event_id") - 2).as("event_id"),
            col("event_type"), col("value"),
            when(col("event_type") === "error", lit("d"))
              .otherwise(lit("u")).as("op")),
        Seq("event_id"), "op")
      agg.refresh()
      src.delete(col("event_type") === "click" && col("value") > lit(100))
      agg.refresh()
      val out = agg.read()
        .select(col("event_type"), col("cnt"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy(col("event_type"))
        .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch lake
      graft.lake.FsUtils.deletePath(s, s"file://$tmp")
      out
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id, event_type,
          CAST(value AS DECIMAL(18,6)) AS value, event_id % 3 AS b
        FROM events),
      b01 AS (SELECT user_id, event_id, event_type, value FROM ev WHERE b IN (0, 1)),
      upd AS (SELECT user_id, event_id - 2 AS event_id, event_type, value,
          CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
        FROM ev WHERE b = 2),
      merged AS (
        SELECT * FROM b01 WHERE event_id NOT IN (SELECT event_id FROM upd)
        UNION ALL
        SELECT user_id, event_id, event_type, value FROM upd WHERE op <> 'd'),
      fin AS (SELECT * FROM merged
        WHERE NOT (event_type = 'click' AND value > 100))
      SELECT event_type, count(*) AS cnt,
        CAST(SUM(value) AS DOUBLE) AS sum_value
      FROM fin GROUP BY event_type ORDER BY event_type"""))

  // ---- medallion pipeline end-to-end --------------------------------------
  // The jibaro API surface (A8→A12) exercised as ONE oracled query, not
  // just specs: events become Debezium-shaped Avro envelopes published to
  // the FileMessageBus in two drops, each drained through kafka_to_raw →
  // raw_to_staged(avro) → staged_to_curated (checkpointed incremental
  // streams, Confluent wire format, per-schema-pair decode, latest-per-key
  // dedup, first-write overwrite then MERGE with deletes). The DuckDB
  // oracle replays the same envelopes relationally: last event per user
  // per drop, drop-1 survivors inserted, drop-2 upserts/deletes merged.
  // Determinism: envelopes are published pre-sorted by (ts, event_id) in
  // ONE partition, so bus offsets follow that order and the pipeline's
  // (timestamp, offset) dedup equals the oracle's (ts, event_id) window.
  private lazy val medallionCdc: CatalogQuery = CatalogQuery(
    "q51_medallion_cdc",
    (s, dir) => {
      import graft.cdc._
      val tmp = java.nio.file.Files.createTempDirectory("graft-q51-").toString
      implicit val st: graft.conf.GraftSettings = graft.conf.GraftSettings.local(tmp)
      val bus = new FileMessageBus(s"$tmp/bus")
      val registry = new graft.codec.InMemorySchemaRegistry
      val topic = "cdc.events.user_state"
      val (project, database, table) = ("bench", "events", "user_state")
      val ev = t(s, dir, "events")
        .withColumn("op",
          when(col("event_type") === "error", lit("d")).otherwise(lit("u")))
      val img = struct(col("user_id"), col("event_id"), col("event_type"), col("value"))
      def publish(b: Int): Unit = {
        val batch = ev.filter(pmod(col("event_id"), lit(2)) === b)
          .orderBy(col("ts"), col("event_id"))
          .select(struct(col("user_id")).as("k"),
            struct(
              when(col("op") === "d", img).otherwise(lit(null)).as("before"),
              when(col("op") =!= "d", img).otherwise(lit(null)).as("after"),
              col("op")).as("v"))
          .coalesce(1)
        def avro(c: String, name: String) = graft.codec.AvroSchemaConverter
          .toAvroSchema(batch.schema(c).dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType], name).toString
        val (ks, vs) = (avro("k", "UserKey"), avro("v", "UserEnvelope"))
        val (keyId, valueId) =
          (registry.register(s"$topic-key", ks), registry.register(s"$topic-value", vs))
        bus.publish(s, topic, batch.select(
          graft.codec.ConfluentWireFormat.frame(
            graft.codec.AvroExpressions.to_avro(col("k"), ks), keyId).as("key"),
          graft.codec.ConfluentWireFormat.frame(
            graft.codec.AvroExpressions.to_avro(col("v"), vs), valueId).as("value")))
      }
      (0 to 1).foreach { b =>
        publish(b)
        CdcPipelines.kafkaToRaw(s, bus, topic, project, database, table)
        CdcPipelines.rawToStaged(s, project, database, table, ConfluentAvroCodec, registry)
        CdcPipelines.stagedToCurated(s, project, database, table)
      }
      val curated = graft.tables.GraftTable(s, graft.lake.LakePath.data(
        graft.lake.TableRef(graft.conf.Layer.Curated, project, database, table)))
      val out = curated.read()
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("value").as("last_value"))
        .orderBy(col("user_id"))
        .transform(graft.ext.Parallelism.checkpointTracked) // materialize, then drop the scratch lake
      graft.lake.FsUtils.deletePath(s, s"file://$tmp")
      out
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id, event_type, value,
          CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op, ts,
          event_id % 2 AS b
        FROM events),
      s1 AS (SELECT user_id, event_id, event_type, value, op FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM ev WHERE b = 0) WHERE rn = 1),
      s2 AS (SELECT user_id, event_id, event_type, value, op FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM ev WHERE b = 1) WHERE rn = 1),
      t1 AS (SELECT user_id, event_id, event_type, value FROM s1 WHERE op <> 'd'),
      fin AS (
        SELECT * FROM t1 WHERE user_id NOT IN (SELECT user_id FROM s2)
        UNION ALL
        SELECT user_id, event_id, event_type, value FROM s2 WHERE op <> 'd')
      SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        value AS last_value
      FROM fin ORDER BY user_id"""))

  // ---- UNPIVOT / melt -----------------------------------------------------
  // Wide-to-long reshaping (Dataset.unpivot == SQL UNPIVOT): per-line
  // charge columns melt into (charge_type, amount) rows. Amounts pass
  // through exact DECIMAL before the DOUBLE emit, as everywhere.
  // NULL semantics are PINNED to exclude-nulls: Spark unpivot keeps a
  // (type, NULL) row where DuckDB's UNPIVOT drops it, so the Spark side
  // filters explicitly — these columns are non-null today, but a copy of
  // this shape onto a nullable column must not silently diverge.
  private lazy val unpivotCharges: CatalogQuery = CatalogQuery(
    "q50_unpivot_charges",
    (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          dec2(col("l_extendedprice")).cast("double").as("extendedprice"),
          dec2(col("l_discount")).cast("double").as("discount"),
          dec2(col("l_tax")).cast("double").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("extendedprice"), col("discount"), col("tax")),
          "charge_type", "amount")
        .filter(col("amount").isNotNull)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("charge_type")),
    Some("""SELECT l_orderkey, l_linenumber, charge_type, amount FROM (
        UNPIVOT (SELECT l_orderkey, l_linenumber,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS extendedprice,
            CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount,
            CAST(CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax
          FROM lineitem WHERE l_orderkey < 100)
        ON extendedprice, discount, tax INTO NAME charge_type VALUE amount) u
      ORDER BY l_orderkey, l_linenumber, charge_type"""))

  // ---- distinct + filtered window aggregates ------------------------------
  // Running count-distinct over an ordered per-key frame (collect_set has no
  // direct SQL-window analogue in Spark — size(collect_set() OVER) carries
  // the same semantics as DuckDB's count(DISTINCT) OVER), plus a FILTERed
  // running sum carried in exact DECIMAL (a running DOUBLE sum would depend
  // on each engine's frame-evaluation association order — DuckDB's segment
  // tree vs Spark's streaming fold). Frame state is bounded by event-type
  // cardinality, not frame length, so hot users don't blow memory at scale.
  private lazy val windowDistinct: CatalogQuery = CatalogQuery(
    "q49_window_distinct",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"),
          size(collect_set(col("event_type")).over(w)).as("dtypes"),
          sum(dec2(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0)))).over(w).cast("double").as("purchase_spend"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
        CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS dtypes,
        CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2)))
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS purchase_spend
      FROM events WHERE user_id < 200
      ORDER BY user_id, event_id"""))

  // ---- recursive CTE ------------------------------------------------------
  // Iterative queries via WITH RECURSIVE (Spark 4.x UnionLoopExec): walk the
  // implicit binary-tree hierarchy over part keys (parent = key DIV 2),
  // accumulating the ancestor-chain price in exact integer cents. Each
  // recursion level is one hash join against part — the loop body is a
  // full Catalyst plan, so filters/pushdown/broadcast apply per level, and
  // depth is bounded by log2(max key), not row count. Money stays integer
  // end-to-end: zero float portability surface.
  private lazy val recursiveCte: CatalogQuery = CatalogQuery(
    "q48_recursive_chain",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""WITH RECURSIVE chain AS (
        SELECT p_partkey AS start_key, p_partkey AS cur, CAST(0 AS BIGINT) AS depth,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS chain_cents
        FROM part WHERE p_partkey < 200
        UNION ALL
        SELECT c.start_key, c.cur DIV 2 AS cur, c.depth + 1,
               c.chain_cents + CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM chain c JOIN part p ON p.p_partkey = c.cur DIV 2
        WHERE c.cur > 1)
      SELECT start_key, max(depth) AS depth, max(chain_cents) AS chain_cents
      FROM chain GROUP BY start_key ORDER BY start_key""")
    },
    Some("""WITH RECURSIVE chain AS (
        SELECT p_partkey AS start_key, p_partkey AS cur, CAST(0 AS BIGINT) AS depth,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS chain_cents
        FROM part WHERE p_partkey < 200
        UNION ALL
        SELECT c.start_key, c.cur // 2 AS cur, c.depth + 1,
               c.chain_cents + CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM chain c JOIN part p ON p.p_partkey = c.cur // 2
        WHERE c.cur > 1)
      SELECT start_key, max(depth) AS depth, max(chain_cents) AS chain_cents
      FROM chain GROUP BY start_key ORDER BY start_key"""))

  // ---- statistical aggregates ---------------------------------------------
  // corr/covar/stddev/regression per group, engine-portable: the inputs are
  // exact integers (quantity; price floored to whole dollars via exact cents
  // DIV 100), the moments are EXACT decimal sums (order-independent under
  // any partitioning — the 100 TB requirement), and the final statistics are
  // one identical IEEE-754 double expression on both engines (+,-,*,/,sqrt
  // are all correctly rounded, so same inputs + same tree = same bits).
  // The built-in streaming corr (Welford-style co-moments, NOT reproducible
  // bit-for-bit across engines or partitionings) is gated by a tolerance
  // boolean instead of a value compare — the q29/q43 estimator-invariant
  // trick applied to classical statistics.
  private lazy val statsAgg: CatalogQuery = CatalogQuery(
    "q47_stats_agg",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val base = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        dec2(col("l_quantity")).cast("long").as("__x"),
        call_function("div",
          (dec2(col("l_extendedprice")) * lit(100)).cast("long"), lit(100L)).as("__y"))
      val m = base.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(d38(col("__x"))).as("__sx"),
        sum(d38(col("__y"))).as("__sy"),
        sum(d38(col("__x") * col("__x"))).as("__sxx"),
        sum(d38(col("__x") * col("__y"))).as("__sxy"),
        sum(d38(col("__y") * col("__y"))).as("__syy"),
        corr(col("__x").cast("double"), col("__y").cast("double")).as("__bcorr"))
      val nd = col("n").cast("double")
      val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
      val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
      val syy = col("__syy").cast("double")
      val num = nd * sxy - sx * sy
      val corrExact = num / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
      m.select(
        col("l_returnflag"), col("n"),
        corrExact.as("corr_qty_price"),
        (num / (nd * (nd - lit(1.0)))).as("covar_qty_price"),
        sqrt((nd * syy - sy * sy) / (nd * (nd - lit(1.0)))).as("stddev_price"),
        (num / (nd * sxx - sx * sx)).as("regr_slope"),
        ((sy - (num / (nd * sxx - sx * sx)) * sx) / nd).as("regr_intercept"),
        (abs(col("__bcorr") - corrExact) < lit(1e-6)).as("builtin_corr_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH b AS (
        SELECT l_returnflag,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100 AS y
        FROM lineitem),
      m AS (
        SELECT l_returnflag, count(*) AS n,
          sum(CAST(x AS DECIMAL(38,0))) AS sx, sum(CAST(y AS DECIMAL(38,0))) AS sy,
          sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
          sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
          sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
          corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS bcorr
        FROM b GROUP BY 1),
      d AS (
        SELECT l_returnflag, n,
          CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
          CAST(sxx AS DOUBLE) AS sxxd, CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd,
          bcorr
        FROM m)
      SELECT l_returnflag, n,
        (nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) AS corr_qty_price,
        (nd * sxyd - sxd * syd) / (nd * (nd - 1.0)) AS covar_qty_price,
        sqrt((nd * syyd - syd * syd) / (nd * (nd - 1.0))) AS stddev_price,
        (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS regr_slope,
        (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)) * sxd) / nd AS regr_intercept,
        (abs(bcorr - ((nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)))) < 1e-6) AS builtin_corr_ok
      FROM d ORDER BY l_returnflag"""))
}
