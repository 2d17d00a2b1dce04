package graft.analytics

import graft.{Parity, QueryDef}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory (SURVEY.md §2.2–§2.8) re-expressed as
  * declarative DataFrame plans over the canonical test tables.
  *
  * Design notes for scale (local[32] here, 1000-executor posture):
  *  - every aggregation is a plain `groupBy(...).agg(...)` → Catalyst emits
  *    partial (map-side) + final hash aggregates; no driver-side loops;
  *  - joins against small dimensions (`part`, `customer` at dim-scale) are
  *    explicitly `broadcast(...)` so the 100 TB fact side never shuffles;
  *  - filters/projections sit directly on the scan so parquet pushdown and
  *    column pruning apply;
  *  - windows partition by high-cardinality keys (custkey/user_id), so state
  *    per partition stays bounded.
  */
object RelationalQueries {
  import Parity._

  private def li(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.load(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")
  private def prt(s: SparkSession, d: String) = Tables.load(s, d, "part")
  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")

  /** Q0 — whole-corpus census: one row per canonical table with its row
    * count — the operational "is everything loaded" smoke every pipeline
    * runs first (reference: the `read_s3_parquet`/count utilities in
    * `utils-dev/`). Ten count-star aggregates unioned: each is a
    * metadata-cheap scan (parquet row-group counts, no column data), so
    * the census stays O(files) at any corpus size.
    */
  val q0TableCensus = QueryDef(
    "q0_table_census",
    "per-table row counts across the whole canonical surface",
    (s, d) =>
      Tables.all.keys.toSeq.sorted
        .map(t => Tables.load(s, d, t)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows")))
        .reduce(_.unionByName(_))
        .orderBy("table_name"),
    Some(Tables.all.keys.toSeq.sorted
      .map(t => s"SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS n_rows FROM $t")
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")))

  /** T4/T5/W5 — ad-hoc select + filter + deterministic limit.
    * Reference: `utils-dev/s3_parquet_query.py:135-158` (filter/project/limit).
    */
  val t4FilterProject = QueryDef(
    "t4_filter_project",
    "column filters + projection + ordered limit (query-tool surface)",
    (s, d) =>
      li(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45
            ORDER BY l_orderkey, l_linenumber LIMIT 100"""))

  /** T6/A6 — op-code decode map with passthrough default + group summary.
    * Reference: `utils-dev/s3_parquet_query.py:190-210`.
    */
  val t6DecodeMap = QueryDef(
    "t6_decode_map",
    "code→label decode (when/otherwise chain) + per-code count and date range",
    (s, d) =>
      ev(s, d)
        .withColumn(
          "operation",
          when(col("event_type") === "purchase", "PURCHASE")
            .when(col("event_type") === "click", "CLICK")
            .when(col("event_type") === "view", "VIEW")
            .when(col("event_type") === "signup", "SIGNUP")
            .otherwise(concat(lit("OTHER:"), col("event_type"))))
        .groupBy("operation")
        .agg(
          count(lit(1)).as("n_events"),
          min(to_date(col("ts"))).as("first_date"),
          max(to_date(col("ts"))).as("last_date"))
        .orderBy("operation"),
    Some("""SELECT CASE WHEN event_type='purchase' THEN 'PURCHASE'
                        WHEN event_type='click' THEN 'CLICK'
                        WHEN event_type='view' THEN 'VIEW'
                        WHEN event_type='signup' THEN 'SIGNUP'
                        ELSE 'OTHER:' || event_type END AS operation,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(CAST(ts AS DATE)) AS first_date,
                   max(CAST(ts AS DATE)) AS last_date
            FROM events GROUP BY 1 ORDER BY operation"""))

  /** T9/T10/T11 — derived strings, regex validation flags, completeness flags.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:404-410`.
    */
  val t9DerivedFlags = QueryDef(
    "t9_derived_flags",
    "string derivation + regex-validity + completeness flags, aggregated",
    (s, d) =>
      cust(s, d)
        .withColumn("is_valid_name", col("c_name").rlike("^Customer#[0-9]+$"))
        .withColumn(
          "is_complete_profile",
          col("c_name").isNotNull && col("c_mktsegment").isNotNull &&
            col("c_acctbal").isNotNull)
        .withColumn("display_name",
          concat_ws(" ", col("c_mktsegment"), col("c_name")))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(when(col("is_valid_name"), 1L).otherwise(0L)).as("n_valid_names"),
          sum(when(col("is_complete_profile"), 1L).otherwise(0L)).as("n_complete"),
          max(col("display_name")).as("max_display_name"))
        .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_names,
                   CAST(sum(CASE WHEN c_name IS NOT NULL AND c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
                   max(c_mktsegment || ' ' || c_name) AS max_display_name
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** T12 — CASE bucketization (price tiers).
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:413,433,455`.
    */
  val t12Bucketize = QueryDef(
    "t12_bucketize",
    "CASE bucketization into price tiers + per-tier rollup",
    (s, d) =>
      prt(s, d)
        .withColumn(
          "price_tier",
          when(col("p_retailprice") < 930, "budget")
            .when(col("p_retailprice") < 970, "mid-range")
            .otherwise("premium"))
        .groupBy("price_tier")
        .agg(
          count(lit(1)).as("n_parts"),
          moneySum(col("p_retailprice")).as("sum_price"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"))
        .orderBy("price_tier"),
    Some("""SELECT CASE WHEN p_retailprice < 930 THEN 'budget'
                        WHEN p_retailprice < 970 THEN 'mid-range'
                        ELSE 'premium' END AS price_tier,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
                   min(p_retailprice) AS min_price,
                   max(p_retailprice) AS max_price
            FROM part GROUP BY 1 ORDER BY price_tier"""))

  /** T13 — date arithmetic → activity buckets.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:414,606-607`
    * (`is_active` 90-day / `is_at_risk` 180-day windows).
    */
  val t13DateArith = QueryDef(
    "t13_date_arith",
    "datediff vs reference date → active/at-risk/dormant buckets",
    (s, d) =>
      ord(s, d)
        .withColumn("days_since",
          datediff(lit("2001-09-01").cast("date"), to_date(col("o_orderdate"))))
        .withColumn(
          "activity",
          when(col("days_since") <= 90, "active")
            .when(col("days_since") <= 180, "at_risk")
            .otherwise("dormant"))
        .groupBy("activity")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          min(col("days_since")).as("min_days"),
          max(col("days_since")).as("max_days"))
        .orderBy("activity"),
    Some("""SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01') <= 90 THEN 'active'
                        WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01') <= 180 THEN 'at_risk'
                        ELSE 'dormant' END AS activity,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
                   CAST(min(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01')) AS INTEGER) AS min_days,
                   CAST(max(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01')) AS INTEGER) AS max_days
            FROM orders GROUP BY 1 ORDER BY activity"""))

  /** T14 — arithmetic derivations (line totals / discount / tax), exact
    * decimal math. Reference: `.kiro/specs/batch-analytics-layer/design.md:474,483-485`.
    */
  val t14LineDerivations = QueryDef(
    "t14_line_derivations",
    "line_total / discount_amount / charged derivations, per linestatus",
    (s, d) => {
      val l = li(s, d)
      val price = dec2(col("l_extendedprice"))
      val disc = col("l_discount").cast(DecimalType(4, 2))
      val tax = col("l_tax").cast(DecimalType(4, 2))
      l.select(
          col("l_linestatus"),
          (price * (lit(1).cast(DecimalType(4, 2)) - disc)).as("disc_price"),
          (price * (lit(1).cast(DecimalType(4, 2)) - disc) *
            (lit(1).cast(DecimalType(4, 2)) + tax)).as("charged"),
          (price * disc).as("discount_amount"))
        .groupBy("l_linestatus")
        .agg(
          sum(col("disc_price")).cast("double").as("sum_disc_price"),
          sum(col("charged")).cast("double").as("sum_charged"),
          sum(col("discount_amount")).cast("double").as("sum_discount"))
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charged,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_discount
            FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** J1/A1-ish — 3-way left join fact assembly per segment.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:158-163`.
    * Scale note: each fact table is pre-aggregated to its parent's key
    * BEFORE joining — lineitem collapses to one row per order, orders to
    * one row per customer — so the joins carry no fact multiplicity and
    * the segment rollup needs no distinct aggregates at all (c_custkey is
    * unique in customer, o_orderkey in orders). The naive 3-way-join-then-
    * dual-countDistinct plan Expands the widest join ×3 before its
    * shuffle; this one never materializes a row wider than its parent key.
    */
  val j1ThreeWay = QueryDef(
    "j1_customer_orders_items",
    "customer ⟕ orders ⟕ lineitem, per-segment rollup",
    (s, d) => {
      val c = cust(s, d)
      val o = ord(s, d)
      val l = li(s, d)
      val perOrder = l.groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("li_cnt"),
        sum(dec2(col("l_extendedprice"))).as("li_rev"))
      val perCust = o
        .join(perOrder, o("o_orderkey") === perOrder("l_orderkey"), "left")
        .groupBy(col("o_custkey")).agg(
          count(col("o_orderkey")).as("ord_cnt"),
          sum(col("li_cnt")).as("li_cnt"),
          sum(col("li_rev")).as("li_rev"))
      c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(coalesce(col("ord_cnt"), lit(0L))).as("n_orders"),
          sum(coalesce(col("li_cnt"), lit(0L))).as("n_lineitems"),
          sum(col("li_rev")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
                   CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
                   CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
                   CAST(count(l_orderkey) AS BIGINT) AS n_lineitems,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                          LEFT JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J2/T14 — fact ⨝ small dimension, explicitly broadcast.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:478-485`.
    */
  val j2Enrich = QueryDef(
    "j2_items_parts_enrich",
    "lineitem ⨝ broadcast(part): brand revenue & margin proxy",
    (s, d) => {
      val l = li(s, d)
      val p = prt(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("revenue"),
          sum(dec2(col("l_extendedprice")) -
            dec2(col("l_quantity")) * dec2(col("p_retailprice")))
            .cast("double").as("price_delta"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS price_delta
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** J3/A3/W7 — new-vs-returning revenue split per day.
    * Reference: dbt `daily_customers` CTE
    * `.kiro/specs/batch-analytics-layer/design.md:674-687`.
    * First-order-date is a window min over o_custkey (no self-join).
    */
  val j3NewVsReturning = QueryDef(
    "j3_new_vs_returning",
    "per-day split of revenue into new vs returning customers (window min)",
    (s, d) => {
      val o = ord(s, d).withColumn("order_date", to_date(col("o_orderdate")))
      val w = Window.partitionBy(col("o_custkey"))
      o.withColumn("first_date", min(col("order_date")).over(w))
        .withColumn("is_new", col("order_date") === col("first_date"))
        .groupBy(col("order_date"))
        .agg(
          sum(when(col("is_new"), dec2(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast("double").as("new_revenue"),
          sum(when(!col("is_new"), dec2(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast("double").as("returning_revenue"),
          countDistinct(when(col("is_new"), col("o_custkey"))).as("new_customers"),
          countDistinct(when(!col("is_new"), col("o_custkey"))).as("returning_customers"))
        .orderBy("order_date")
    },
    Some("""WITH o AS (
              SELECT CAST(o_orderdate AS DATE) AS order_date, o_custkey, o_totalprice,
                     min(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey) AS first_date
              FROM orders)
            SELECT order_date,
                   CAST(sum(CASE WHEN order_date = first_date THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS new_revenue,
                   CAST(sum(CASE WHEN order_date <> first_date THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS returning_revenue,
                   CAST(count(DISTINCT CASE WHEN order_date = first_date THEN o_custkey END) AS BIGINT) AS new_customers,
                   CAST(count(DISTINCT CASE WHEN order_date <> first_date THEN o_custkey END) AS BIGINT) AS returning_customers
            FROM o GROUP BY order_date ORDER BY order_date"""))

  /** J4/A2/A4/A5 — the reference's flagship mart: daily business metrics.
    * daily_orders ⟕ daily_items on date + COALESCE + guarded ratios.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:658-730`.
    */
  val j4DailyBusinessMetrics = QueryDef(
    "j4_daily_business_metrics",
    "daily mart assembly: conditional counts, left join on date, ratio KPIs",
    (s, d) => {
      val o = ord(s, d).withColumn("date", to_date(col("o_orderdate")))
      val l = li(s, d).withColumn("date", to_date(col("l_shipdate")))
      val dailyOrders = o.groupBy("date").agg(
        count(lit(1)).as("total_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_orders"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("pending_orders"),
        moneySum(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("o_custkey")).as("unique_customers"))
      val dailyItems = l.groupBy("date").agg(
        sum(dec2(col("l_quantity"))).cast("double").as("total_quantity"),
        countDistinct(col("l_partkey")).as("unique_parts"))
      dailyOrders
        .join(dailyItems, Seq("date"), "left")
        .select(
          col("date"),
          col("total_orders"),
          col("fulfilled_orders"),
          col("pending_orders"),
          col("total_revenue"),
          col("unique_customers"),
          coalesce(col("total_quantity"), lit(0.0)).as("total_quantity"),
          coalesce(col("unique_parts"), lit(0L)).as("unique_parts"),
          when(col("total_orders") > 0,
            col("fulfilled_orders").cast("double") / col("total_orders"))
            .otherwise(0.0).as("completion_rate"))
        .orderBy("date")
    },
    Some("""WITH daily_orders AS (
              SELECT CAST(o_orderdate AS DATE) AS date,
                     CAST(count(*) AS BIGINT) AS total_orders,
                     CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
                     CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue,
                     CAST(count(DISTINCT o_custkey) AS BIGINT) AS unique_customers
              FROM orders GROUP BY 1),
            daily_items AS (
              SELECT CAST(l_shipdate AS DATE) AS date,
                     CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_quantity,
                     CAST(count(DISTINCT l_partkey) AS BIGINT) AS unique_parts
              FROM lineitem GROUP BY 1)
            SELECT o.date, o.total_orders, o.fulfilled_orders, o.pending_orders,
                   o.total_revenue, o.unique_customers,
                   COALESCE(i.total_quantity, 0.0) AS total_quantity,
                   COALESCE(i.unique_parts, 0) AS unique_parts,
                   CASE WHEN o.total_orders > 0 THEN CAST(o.fulfilled_orders AS DOUBLE) / o.total_orders ELSE 0.0 END AS completion_rate
            FROM daily_orders o LEFT JOIN daily_items i ON o.date = i.date
            ORDER BY o.date"""))

  /** A1 — customer metrics group-agg (count/sum/avg/min/max/countDistinct).
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:164-177`.
    */
  val a1CustomerMetrics = QueryDef(
    "a1_customer_metrics",
    "per-customer order metrics: count, sum, avg, min/max dates, distinct",
    (s, d) => {
      val c = cust(s, d)
      val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_spent"),
          moneyAvg(col("o_totalprice")).as("avg_order_value"),
          min(to_date(col("o_orderdate"))).as("first_order"),
          max(to_date(col("o_orderdate"))).as("last_order"),
          countDistinct(col("o_orderpriority")).as("n_priorities"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name,
                   CAST(count(o_orderkey) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(o_totalprice) AS avg_order_value,
                   min(CAST(o_orderdate AS DATE)) AS first_order,
                   max(CAST(o_orderdate AS DATE)) AS last_order,
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** A2/A3 — daily KPIs with conditional counts.
    * Reference: dbt `daily_orders` `.kiro/specs/batch-analytics-layer/design.md:658-672`.
    */
  val a2DailyOrderKpis = QueryDef(
    "a2_daily_order_kpis",
    "per-day conditional counts by status + revenue + distinct customers",
    (s, d) =>
      ord(s, d)
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_fulfilled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"),
          moneySum(col("o_totalprice")).as("revenue"),
          moneyAvg(col("o_totalprice")).as("avg_order_value"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("date"),
    Some("""SELECT CAST(o_orderdate AS DATE) AS date,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
                   CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
                   CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(o_totalprice) AS avg_order_value,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
            FROM orders GROUP BY 1 ORDER BY date"""))

  /** A6/T16 — CDC-style operation summary with epoch-ms timestamps.
    * Reference: `utils-dev/s3_parquet_query.py:183-210`.
    */
  val a6OpSummary = QueryDef(
    "a6_op_summary",
    "per-type event count + first/last timestamps (epoch millis)",
    (s, d) =>
      ev(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          unix_millis(min(col("ts"))).as("first_ts_ms"),
          unix_millis(max(col("ts"))).as("last_ts_ms"),
          moneySum(col("value")).as("sum_value"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   epoch_ms(min(ts)) AS first_ts_ms,
                   epoch_ms(max(ts)) AS last_ts_ms,
                   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A13 — exact percentiles (p50/p95/p99), linear interpolation.
    * Reference: `data-generator.py:184-199` (statistics.quantiles).
    *
    * Computed the 100 TB way: [[graft.operators.Percentiles.exact]] —
    * binned two-pass distributed selection (min/max/count scan → 4096-bin
    * histogram locating each target rank's bin → rank only the rows in
    * those bins). Spark's builtin `percentile` instead buffers a
    * value→count map per group in aggregation state: with 3 return flags,
    * three executors each hold billions of entries at 100× scale.
    */
  val a13Percentiles = QueryDef(
    "a13_percentiles",
    "exact interpolated percentiles via binned two-pass selection",
    (s, d) =>
      graft.operators.Percentiles
        .exact(li(s, d), "l_returnflag", "l_extendedprice",
          Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99"),
          cacheKey = Some(s"a13/$d"))
        .select(col("l_returnflag"), col("n"),
          round(col("p50"), 4).as("p50"),
          round(col("p95"), 4).as("p95"),
          round(col("p99"), 4).as("p99"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   CAST(count(l_extendedprice) AS BIGINT) AS n,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
                   round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A13b — the sketch-based percentile path for when even the distinct-
    * value histogram is too wide (high-cardinality measures at 100 TB):
    * `percentile_approx` (Greenwald-Khanna, mergeable partial state,
    * accuracy 10000 ⇒ rank error ≤ n/10000). Oracle interface mirrors
    * x8's: the approximation itself is engine-specific, so DuckDB checks
    * the exact-derivable columns plus a tolerance verdict — each approx
    * percentile must land within 1% of the exact value (computed here
    * from the same histogram as A13, broadcast-joined at 3 rows).
    */
  val a13bPercentilesApprox = QueryDef(
    "a13b_percentiles_approx",
    "mergeable approx percentiles within 1% of exact (tolerance verdict)",
    (s, d) => {
      // both the approx aggregation and the exact reference run over the
      // ONE cached, repartitioned projection A13 persists — no second
      // scan of the fact table
      val base = graft.operators.Percentiles
        .cachedProjection(li(s, d), "l_returnflag", "l_extendedprice", s"a13/$d")
      val approx = base
        .groupBy("g")
        .agg(
          count(lit(1)).as("n"),
          expr("percentile_approx(v, array(0.5, 0.95, 0.99), 10000)").as("ap"))
      // the verdict's exact reference is one row per group — persist it
      // once per (session, dir) so repeated a13b runs (dashboards, the
      // bench) pay the two-pass selection once, not per query
      val exact = graft.PlanCache.checkpointed(s, s"a13_exact/$d") {
          a13Percentiles.run(s, d)
        }
        .select(col("l_returnflag").as("x_flag"),
          col("p50"), col("p95"), col("p99"))
      def ok(i: Int, exactCol: String): Column =
        (abs(col("ap").getItem(i) - col(exactCol)) <=
          abs(col(exactCol)) * lit(0.01)).cast("long").as(s"${exactCol}_ok")
      approx.join(broadcast(exact), col("g") === col("x_flag"))
        .select(col("g").as("l_returnflag"), col("n"),
          ok(0, "p50"), ok(1, "p95"), ok(2, "p99"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   CAST(count(l_extendedprice) AS BIGINT) AS n,
                   CAST(1 AS BIGINT) AS p50_ok,
                   CAST(1 AS BIGINT) AS p95_ok,
                   CAST(1 AS BIGINT) AS p99_ok
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** W1/W2 — rank within category + top-20% flag.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:570-572`.
    * Revenue is an exact decimal, so tie-handling is engine-independent.
    */
  val w1RankInCategory = QueryDef(
    "w1_rank_in_category",
    "revenue rank within p_type + percent_rank top-20% flag, top-5 only",
    (s, d) => {
      val l = li(s, d)
      val p = prt(s, d)
      val rev = l
        .join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_type"), col("p_partkey"))
        .agg(moneySum(col("l_extendedprice")).as("revenue"))
      val w = Window.partitionBy(col("p_type"))
        .orderBy(col("revenue").desc, col("p_partkey"))
      rev
        .withColumn("revenue_rank", rank().over(w))
        .withColumn("is_top_performer", percent_rank().over(w) <= 0.2)
        .filter(col("revenue_rank") <= 5)
        .select("p_type", "p_partkey", "revenue", "revenue_rank", "is_top_performer")
        .orderBy("p_type", "revenue_rank", "p_partkey")
    },
    Some("""WITH rev AS (
              SELECT p_type, p_partkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_type, p_partkey),
            ranked AS (
              SELECT p_type, p_partkey, revenue,
                     rank() OVER (PARTITION BY p_type ORDER BY revenue DESC, p_partkey) AS revenue_rank,
                     percent_rank() OVER (PARTITION BY p_type ORDER BY revenue DESC, p_partkey) <= 0.2 AS is_top_performer
              FROM rev)
            SELECT * FROM ranked WHERE revenue_rank <= 5
            ORDER BY p_type, revenue_rank, p_partkey"""))

  /** W3 — inter-order gaps via lag window, then per-customer average.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:547,600`.
    */
  val w3OrderGaps = QueryDef(
    "w3_order_gaps",
    "avg days between consecutive orders per customer (lag window)",
    (s, d) => {
      val o = ord(s, d).withColumn("order_date", to_date(col("o_orderdate")))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_date"), col("o_orderkey"))
      o.withColumn("prev_date", lag(col("order_date"), 1).over(w))
        .withColumn("gap_days", datediff(col("order_date"), col("prev_date")))
        .filter(col("gap_days").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_gaps"),
          (sum(col("gap_days")).cast("double") / count(lit(1)))
            .as("avg_gap_days"),
          max(col("gap_days")).as("max_gap_days"))
        .orderBy("o_custkey")
    },
    Some("""WITH g AS (
              SELECT o_custkey,
                     date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap_days
              FROM orders)
            SELECT o_custkey,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap_days) AS DOUBLE) / count(*) AS avg_gap_days,
                   CAST(max(gap_days) AS INTEGER) AS max_gap_days
            FROM g WHERE gap_days IS NOT NULL
            GROUP BY o_custkey ORDER BY o_custkey"""))

  /** W4 — latest-record-per-key compaction (the CDC current-state operator).
    * Reference: `utils-dev/read_s3_parquet.py:51` (max-lsn row = current row).
    */
  val w4LatestByKey = QueryDef(
    "w4_latest_by_key",
    "row_number over (key order by ts desc) = 1 — latest event per user",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** W6 — mode per key (favorite event type), deterministic tiebreak.
    * Reference: `favorite_category` `.kiro/specs/batch-analytics-layer/design.md:601`.
    */
  val w6FavoriteCategory = QueryDef(
    "w6_favorite_category",
    "most-frequent event_type per user (count desc, name asc tiebreak)",
    (s, d) => {
      val counts = ev(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("favorite_type"), col("n"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_type AS favorite_type, n FROM (
              SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type)
            WHERE rn = 1 ORDER BY user_id"""))

  /** U1/Q1 — business-rule violation scan, 4-way UNION ALL.
    * Reference: dbt macro `.kiro/specs/batch-analytics-layer/design.md:824-850`.
    */
  val u1RuleViolations = QueryDef(
    "u1_rule_violations",
    "4 rule scans union-all'ed into one violation report",
    (s, d) => {
      val o = ord(s, d)
      val l = li(s, d)
      val p = prt(s, d)
      val r1 = o.filter(col("o_totalprice") < 0)
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders.total_negative").as("rule"), col("violations"))
      val r2 = l.filter(col("l_quantity") <= 0 || col("l_quantity") > 49)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem.quantity_range").as("rule"), col("violations"))
      val r3 = p.filter(col("p_retailprice") < 0)
        .agg(count(lit(1)).as("violations"))
        .select(lit("part.price_negative").as("rule"), col("violations"))
      val r4 = l.filter(col("l_discount") > 0.08)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem.discount_cap").as("rule"), col("violations"))
      r1.unionByName(r2).unionByName(r3).unionByName(r4).orderBy("rule")
    },
    Some("""SELECT 'orders.total_negative' AS rule, CAST(count(*) AS BIGINT) AS violations FROM orders WHERE o_totalprice < 0
            UNION ALL SELECT 'lineitem.quantity_range', CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0 OR l_quantity > 49
            UNION ALL SELECT 'part.price_negative', CAST(count(*) AS BIGINT) FROM part WHERE p_retailprice < 0
            UNION ALL SELECT 'lineitem.discount_cap', CAST(count(*) AS BIGINT) FROM lineitem WHERE l_discount > 0.08
            ORDER BY rule"""))

  /** Q2 — uniqueness / duplicate-key audit.
    * Reference: dbt singular test `.kiro/specs/batch-analytics-layer/design.md:734-742`.
    */
  val q2Uniqueness = QueryDef(
    "q2_uniqueness",
    "duplicate (user_id, event_type) groups — dbt-style uniqueness test",
    (s, d) =>
      ev(s, d)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, event_type HAVING count(*) > 1
            ORDER BY user_id, event_type"""))

  /** Q4 — referential-integrity orphan scan via left-anti joins.
    * Reference: `batch…/requirements.md:110-111`.
    */
  val q4ReferentialIntegrity = QueryDef(
    "q4_referential_integrity",
    "left-anti orphan counts child→parent for 3 FK edges",
    (s, d) => {
      val o = ord(s, d)
      val l = li(s, d)
      val c = cust(s, d)
      val p = prt(s, d)
      def orphanCount(name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("orphans")).select(lit(name).as("fk_edge"), col("orphans"))
      val e1 = orphanCount("lineitem->orders",
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti"))
      val e2 = orphanCount("orders->customer",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti"))
      val e3 = orphanCount("lineitem->part",
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "left_anti"))
      e1.unionByName(e2).unionByName(e3).orderBy("fk_edge")
    },
    Some("""SELECT 'lineitem->orders' AS fk_edge, CAST(count(*) AS BIGINT) AS orphans FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
            UNION ALL SELECT 'orders->customer', CAST(count(*) AS BIGINT) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
            UNION ALL SELECT 'lineitem->part', CAST(count(*) AS BIGINT) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
            ORDER BY fk_edge"""))

  /** J6/Q5 — speed-vs-batch reconciliation with 5% tolerance verdict.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:761-808`.
    * Two independent monthly revenue paths (orders vs lineitem) are unpivoted
    * and full-outer joined, then compared.
    */
  val j6Reconciliation = QueryDef(
    "j6_reconciliation",
    "full-outer join of two metric paths + pct-difference tolerance verdict",
    (s, d) => {
      val o = ord(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(moneySum(col("o_totalprice")).as("batch_value"))
      val l = li(s, d)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(moneySum(col("l_extendedprice")).as("speed_value"))
      o.join(l, Seq("month"), "full_outer")
        .select(
          col("month"),
          coalesce(col("batch_value"), lit(0.0)).as("batch_value"),
          coalesce(col("speed_value"), lit(0.0)).as("speed_value"))
        .withColumn("abs_diff", abs(col("batch_value") - col("speed_value")))
        .withColumn(
          "within_tolerance",
          // abs() in the denominator: a negative batch value would make
          // every divergence pass the signed comparison
          when(col("batch_value") =!= 0.0,
            col("abs_diff") / abs(col("batch_value")) <= 0.05).otherwise(false))
        .orderBy("month")
    },
    Some("""WITH b AS (
              SELECT strftime(o_orderdate, '%Y-%m') AS month,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS batch_value
              FROM orders GROUP BY 1),
            sp AS (
              SELECT strftime(l_shipdate, '%Y-%m') AS month,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS speed_value
              FROM lineitem GROUP BY 1)
            SELECT COALESCE(b.month, sp.month) AS month,
                   COALESCE(batch_value, 0.0) AS batch_value,
                   COALESCE(speed_value, 0.0) AS speed_value,
                   abs(COALESCE(batch_value, 0.0) - COALESCE(speed_value, 0.0)) AS abs_diff,
                   CASE WHEN COALESCE(batch_value, 0.0) <> 0.0
                        THEN abs(COALESCE(batch_value, 0.0) - COALESCE(speed_value, 0.0)) / abs(COALESCE(batch_value, 0.0)) <= 0.05
                        ELSE false END AS within_tolerance
            FROM b FULL OUTER JOIN sp ON b.month = sp.month
            ORDER BY month"""))

  /** J12 — fact ⨝ selective dimension with the fact scan bloom-pruned
    * BEFORE the shuffle ([[graft.operators.BloomPrune]]).
    *
    * The scenario Catalyst's own rewrites miss: the filtered dimension
    * (urgent finished orders, ~10% of orderkeys) is past the broadcast
    * threshold at warehouse scale, so the plain plan shuffles 100% of
    * lineitem for a join that keeps ~10%. The bloom filter turns the
    * non-matching 90% into a codegen'd Filter under the scan — shuffle
    * bytes drop ~10×, results bit-identical (no false negatives; false
    * positives die in the join). Oracle is the PLAIN join: the operator
    * must be invisible to semantics.
    */
  val j12BloomPrunedJoin = QueryDef(
    "j12_bloom_pruned_join",
    "lineitem ⨝ selective orders, fact side bloom-pruned pre-shuffle",
    (s, d) => {
      val l = li(s, d)
      val o = ord(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderpriority")
      // r19: broadcast-bitset form, m sized from the filtered dimension's
      // observed key count (r18 verdict item 3). The r18 shape embedded a
      // 2^18-bit literal tuned to sf0.1 — plan weight O(m) (its 16,384-
      // long 2^20 predecessor measured ~0.8 s of driver time per run)
      // and a bitset that saturates exactly when the build side grows.
      // Now: one count of the filtered dim picks m (fpr ≈ 1.2% at any
      // scale up to the 2^26 broadcast cap), and the words array rides a
      // one-row broadcast relation — plan size O(1), probe still a pure
      // codegen Filter under the fact scan, shuffle reduction unchanged.
      graft.operators.BloomPrune.prunedJoinBroadcast(l, "l_orderkey",
          o, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Q6 — distribution-drift monitor (the PSI/data-drift staple between
    * dataset versions): order totals bucketed into 10 equi-width bins
    * whose EDGES come from the baseline (early) half only — the
    * production contract, where the monitor compares new data against a
    * frozen reference binning — with per-bin shares of each half in
    * basis points and their absolute difference. Everything is exact
    * integer math: prices as cents, bin = (cents−min)·10 div (range+1)
    * clamped into [0,9] (late-half values may exceed the baseline
    * range), shares via integer division — no log-based PSI, whose libm
    * calls are not portable and whose ranking the L1 drift preserves.
    * Two aggregate passes over one scan: baseline bounds broadcast back,
    * then one map-combinable (half, bin) rollup.
    */
  val q6DistributionDrift = QueryDef(
    "q6_distribution_drift",
    "order-total distribution drift: per-bin shares (bp) early vs late half",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderdate"),
          (Parity.dec2(col("o_totalprice")) * 100).cast("long").as("cents"))
        .withColumn("half",
          when(to_date(col("o_orderdate")) < "1997-01-01", "early")
            .otherwise("late"))
      val bounds = o.filter(col("half") === "early")
        .agg(min(col("cents")).as("min_c"), max(col("cents")).as("max_c"))
      val binned = o.crossJoin(broadcast(bounds))
        .withColumn("bin",
          least(lit(9L), greatest(lit(0L),
            expr("((cents - min_c) * 10) div (max_c - min_c + 1)"))))
      val counts = binned.groupBy("bin")
        .agg(
          sum(when(col("half") === "early", 1L).otherwise(0L)).as("n_early"),
          sum(when(col("half") === "late", 1L).otherwise(0L)).as("n_late"))
      val totals = o.groupBy()
        .agg(
          sum(when(col("half") === "early", 1L).otherwise(0L)).as("t_early"),
          sum(when(col("half") === "late", 1L).otherwise(0L)).as("t_late"))
      counts.crossJoin(broadcast(totals))
        .withColumn("early_bp", expr("(n_early * 10000) div t_early"))
        .withColumn("late_bp", expr("(n_late * 10000) div t_late"))
        .select(col("bin"), col("n_early"), col("n_late"),
          col("early_bp"), col("late_bp"),
          abs(col("early_bp") - col("late_bp")).as("drift_bp"))
        .orderBy("bin")
    },
    Some("""WITH o AS (
           |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           |         CASE WHEN CAST(o_orderdate AS DATE) < DATE '1997-01-01'
           |              THEN 'early' ELSE 'late' END AS half
           |  FROM orders),
           |bounds AS (
           |  SELECT min(cents) AS min_c, max(cents) AS max_c
           |  FROM o WHERE half = 'early'),
           |binned AS (
           |  SELECT least(9, greatest(0, ((cents - min_c) * 10) // (max_c - min_c + 1))) AS bin,
           |         half
           |  FROM o CROSS JOIN bounds),
           |counts AS (
           |  SELECT bin,
           |         CAST(sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
           |         CAST(sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS n_late
           |  FROM binned GROUP BY bin),
           |totals AS (
           |  SELECT CAST(sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS t_early,
           |         CAST(sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS t_late
           |  FROM o)
           |SELECT bin, n_early, n_late,
           |       (n_early * 10000) // t_early AS early_bp,
           |       (n_late * 10000) // t_late AS late_bp,
           |       abs((n_early * 10000) // t_early - (n_late * 10000) // t_late) AS drift_bp
           |FROM counts CROSS JOIN totals ORDER BY bin""".stripMargin))

  /** Q11 — functional-dependency audit: for each candidate `X → Y`, how
    * many X-groups carry more than one Y value. FDs are the contract
    * behind dimensional modeling (a dimension key must determine its
    * attributes — cdc3's SCD2 build and the warehouse staging layer
    * assume it) and behind dedup survivorship (x34 merges on the
    * premise that cluster → canonical is a function); this audit says
    * which assumed dependencies actually hold in the data. Each
    * candidate is one groupBy + plain min/max aggregates: a group
    * violates X→Y iff it holds ≥ 2 distinct non-null Y values, i.e.
    * iff min(Y) ≠ max(Y) (total order on bigint/string) — the r19
    * rewrite of the original `countDistinct(rhs) > 1`, whose
    * one-distinct plan (planAggregateWithOneDistinct) spent TWO
    * exchanges per candidate and shuffled the deduped (X, Y) PAIR set;
    * min/max partials are map-combinable in ONE exchange of one row
    * per X-group (outputs bit-identical — nd was only ever consumed
    * through `> 1`, and all-null groups yield null min/max ⇒
    * non-violating under both forms). Output is candidates-bounded.
    */
  val q11FunctionalDeps = QueryDef(
    "q11_functional_deps",
    "functional-dependency audit: violating group counts per candidate X→Y",
    (s, d) => {
      def fd(df: org.apache.spark.sql.DataFrame, lhs: String, rhs: String) =
        df.groupBy(col(lhs))
          .agg(min(col(rhs)).as("lo"), max(col(rhs)).as("hi"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("lo") =!= col("hi"), 1L).otherwise(0L))
              .as("violating_groups"))
          .select(lit(s"$lhs->$rhs").as("fd"), col("n_groups"),
            col("violating_groups"),
            (col("violating_groups") === 0).as("holds"))
      fd(ord(s, d), "o_orderkey", "o_custkey")
        .unionByName(fd(ord(s, d), "o_custkey", "o_orderstatus"))
        .unionByName(fd(li(s, d), "l_orderkey", "l_suppkey"))
        .unionByName(fd(li(s, d), "l_partkey", "l_suppkey"))
        .orderBy("fd")
    },
    Some {
      def fdSql(table: String, lhs: String, rhs: String) =
        s"""SELECT '$lhs->$rhs' AS fd,
           |       CAST(count(*) AS BIGINT) AS n_groups,
           |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
           |       sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd FROM $table GROUP BY $lhs)""".stripMargin
      Seq(
        fdSql("orders", "o_orderkey", "o_custkey"),
        fdSql("orders", "o_custkey", "o_orderstatus"),
        fdSql("lineitem", "l_orderkey", "l_suppkey"),
        fdSql("lineitem", "l_partkey", "l_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    })

  val defs: Seq[QueryDef] = Seq(q0TableCensus,
    t4FilterProject, t6DecodeMap, t9DerivedFlags, t12Bucketize, t13DateArith,
    t14LineDerivations, j1ThreeWay, j2Enrich, j3NewVsReturning,
    j4DailyBusinessMetrics, a1CustomerMetrics, a2DailyOrderKpis, a6OpSummary,
    a13Percentiles, a13bPercentilesApprox, w1RankInCategory, w3OrderGaps, w4LatestByKey,
    w6FavoriteCategory, u1RuleViolations, q2Uniqueness,
    q4ReferentialIntegrity, j6Reconciliation, j12BloomPrunedJoin,
    q6DistributionDrift,
    q11FunctionalDeps)
}
