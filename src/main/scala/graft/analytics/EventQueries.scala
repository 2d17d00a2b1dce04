package graft.analytics

import graft.{Parity, QueryDef}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Event-stream analytics: the speed layer's materialized views (A7-A9)
  * re-expressed as batch aggregations over the events table, plus the JSON
  * and epoch-ms transforms (T3/T8). The streaming module reuses these exact
  * aggregation shapes under a watermark (`graft.streaming`); keeping them
  * here too gives them a DuckDB value-level oracle, which a streaming sink
  * can't have.
  *
  * Scale notes: every query is scan → (optional broadcast dim join) →
  * single hash aggregation; `user_tier` comes from a broadcast of the
  * customer dimension (reference J5: stream-side dimension lookup —
  * `.kiro/specs/realtime-analytics-speed-layer/design.md:390-429`).
  */
object EventQueries {
  import Parity._

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "events")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "customer")

  private[graft] val tierExpr =
    when(col("c_custkey") % 4 === 0, "bronze")
      .when(col("c_custkey") % 4 === 1, "silver")
      .when(col("c_custkey") % 4 === 2, "gold")
      .otherwise("platinum")

  private val tierSql =
    """CASE WHEN c_custkey % 4 = 0 THEN 'bronze'
      |     WHEN c_custkey % 4 = 1 THEN 'silver'
      |     WHEN c_custkey % 4 = 2 THEN 'gold'
      |     ELSE 'platinum' END""".stripMargin

  /** Events broadcast-enriched with the customer tier (reference J5 — the
    * event stream, the 100 TB side, never shuffles for the dimension).
    * Shared by the A7/A8 queries and the MV-serving builders
    * ([[graft.streaming.MvServing]]): ONE definition, so the MV-served
    * dashboards cannot diverge from the fact-scan queries.
    */
  private[graft] def enriched(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val tiers = cust(s, d).select(col("c_custkey"), tierExpr.as("user_tier"))
    ev(s, d)
      .join(broadcast(tiers), col("user_id") === col("c_custkey"), "left")
      .withColumn("user_tier", coalesce(col("user_tier"), lit("unknown")))
  }

  /** A7's aggregate at (date, user_tier) grain, unordered — the funnel MV. */
  private[graft] def funnelMv(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    enriched(s, d)
      .groupBy(to_date(col("ts")).as("date"), col("user_tier"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signups"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))

  /** A8's aggregate at (user_tier) grain, unordered, sums only (the
    * ratio column is derived at read time, keeping the MV mergeable).
    */
  private[graft] def tierMv(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    enriched(s, d)
      .groupBy("user_tier")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when(col("event_type") === "purchase", k).otherwise(0L)).as("sum_purchase_k"))
  }

  /** A9's aggregate at (date, product_bucket) grain, unordered. */
  private[graft] def productMv(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev(s, d)
      .withColumn("product_bucket", k % 10)
      .filter(col("product_bucket").isNotNull)
      .groupBy(to_date(col("ts")).as("date"), col("product_bucket"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_viewers"))
  }

  /** A11's aggregate at (date, hour) grain, unordered. */
  private[graft] def hourlyMv(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    ev(s, d)
      .groupBy(to_date(col("ts")).as("date"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col("user_id")).as("n_users"))

  /** A7 — conversion-funnel pre-aggregate: per (date, tier) conditional
    * counts per funnel stage + exact distinct users. Reference:
    * `.kiro/specs/realtime-analytics-speed-layer/design.md:256-272`.
    */
  val a7Funnel = QueryDef(
    "a7_funnel",
    "per-(date,tier) funnel-stage conditional counts + distinct users",
    (s, d) => funnelMv(s, d).orderBy("date", "user_tier"),
    Some(s"""WITH t AS (SELECT c_custkey, $tierSql AS user_tier FROM customer)
            |SELECT CAST(e.ts AS DATE) AS date,
            |       COALESCE(t.user_tier, 'unknown') AS user_tier,
            |       CAST(count(*) AS BIGINT) AS n_events,
            |       CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
            |       CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
            |       CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signups,
            |       CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
            |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            |FROM events e LEFT JOIN t ON e.user_id = t.c_custkey
            |GROUP BY 1, 2 ORDER BY date, user_tier""".stripMargin))

  /** A8/T8 — user-tier performance with JSON field extraction: conditional
    * average of `props.$.k` over purchases. Reference:
    * `.kiro/specs/realtime-analytics-speed-layer/design.md:275-287` (T8 at
    * `:285`, `JSONExtractFloat(properties,'amount')`).
    */
  val a8TierValue = QueryDef(
    "a8_tier_value",
    "per-tier event totals + avg JSON-extracted purchase amount",
    (s, d) => tierMv(s, d)
      .withColumn("avg_purchase_k",
        col("sum_purchase_k").cast("double") / col("n_purchases"))
      .orderBy("user_tier"),
    Some(s"""WITH t AS (SELECT c_custkey, $tierSql AS user_tier FROM customer)
            |SELECT COALESCE(t.user_tier, 'unknown') AS user_tier,
            |       CAST(count(*) AS BIGINT) AS n_events,
            |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
            |       CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
            |       CAST(sum(CASE WHEN event_type='purchase' THEN CAST(json_extract_string(props,'$$.k') AS BIGINT) ELSE 0 END) AS BIGINT) AS sum_purchase_k,
            |       CAST(sum(CASE WHEN event_type='purchase' THEN CAST(json_extract_string(props,'$$.k') AS BIGINT) ELSE 0 END) AS DOUBLE) /
            |         sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS avg_purchase_k
            |FROM events e LEFT JOIN t ON e.user_id = t.c_custkey
            |GROUP BY 1 ORDER BY user_tier""".stripMargin))

  /** A9 — product-performance pre-aggregate: per (date, product bucket from
    * JSON k) with NULL-product filter. Reference:
    * `.kiro/specs/realtime-analytics-speed-layer/design.md:290-303`.
    */
  val a9ProductPerf = QueryDef(
    "a9_product_perf",
    "per-(date, product-bucket) view/click/purchase counts, null-filtered",
    (s, d) => productMv(s, d).orderBy("date", "product_bucket"),
    Some("""SELECT CAST(ts AS DATE) AS date,
                   CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 AS product_bucket,
                   CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
                   CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
                   CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_viewers
            FROM events
            WHERE CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 IS NOT NULL
            GROUP BY 1, 2 ORDER BY date, product_bucket"""))

  /** T3/T16 — epoch-ms → timestamp conversion chain: raw nanos → millis →
    * TimestampType → hourly rollup. Reference: TimestampConverter SMTs
    * `users-s3-sink-connector.json:31-47`; `s3_parquet_query.py:179`.
    */
  val t3EpochMs = QueryDef(
    "t3_epoch_ms",
    "epoch-nanos → millis → timestamp cast + hourly rollup",
    (s, d) =>
      ev(s, d)
        .withColumn("ts_ms", expr("ts_ns DIV 1000000"))
        .withColumn("ts2", timestamp_millis(col("ts_ms")))
        .groupBy(date_trunc("hour", col("ts2")).as("hour"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("first_ms"),
          max(col("ts_ms")).as("last_ms"))
        .orderBy("hour"),
    Some("""SELECT date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(epoch_ms(ts)) AS BIGINT) AS first_ms,
                   CAST(max(epoch_ms(ts)) AS BIGINT) AS last_ms
            FROM events GROUP BY 1 ORDER BY hour"""))

  /** A11 — partition-stats query (`task6-ecommerce-tables-job.yaml:616`). */
  val a11PartitionStats = QueryDef(
    "a11_partition_stats",
    "per-(date,hour) record counts, the lakehouse partition health query",
    (s, d) => hourlyMv(s, d).orderBy("date", "hour"),
    Some("""SELECT CAST(ts AS DATE) AS date, CAST(hour(ts) AS INTEGER) AS hour,
                   CAST(count(*) AS BIGINT) AS n_records,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2 ORDER BY date, hour"""))

  /** U2 — literal-rows UNION ALL (the reference's warehouse compute test,
    * `task4-snowflake-test-job.yaml`).
    */
  val u2LiteralUnion = QueryDef(
    "u2_literal_union",
    "inline literal rows union-all'ed and aggregated (compute smoke)",
    (s, d) => {
      import s.implicits._
      val a = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5))
        .toDF("id", "name", "weight")
      val b = Seq((3L, "gamma", 3.5), (4L, "delta", 4.5), (5L, "alpha", 0.5))
        .toDF("id", "name", "weight")
      a.unionByName(b)
        .groupBy("name")
        .agg(count(lit(1)).as("n"),
          sum(col("weight").cast("decimal(10,2)")).cast("double").as("total_weight"))
        .orderBy("name")
    },
    Some("""WITH u AS (
              SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5),
                                    (3, 'gamma', 3.5), (4, 'delta', 4.5),
                                    (5, 'alpha', 0.5)) AS t(id, name, weight))
            SELECT name, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(weight AS DECIMAL(10,2))) AS DOUBLE) AS total_weight
            FROM u GROUP BY name ORDER BY name"""))

  /** ST8's batch oracle twin — purchase attribution per user over the
    * canonical events table: for each user with purchases, how many
    * purchases had at least one `click` (= product view) in the preceding
    * hour, and how many (purchase, view) pairs the interval join emits.
    * The streaming operator ([[graft.streaming.Attribution]]) runs the
    * same join under watermarks; `AttributionSpec` pins stream ≡ batch.
    * Timestamps compare as epoch MICROSECOND integers on both engines
    * (the parquet carries nanos: Spark's reader truncates ns→µs, so the
    * oracle must truncate identically — comparing raw TIMESTAMP_NS
    * against truncated µs would disagree at nanosecond boundaries).
    */
  val st8Attribution = QueryDef(
    "st8_attribution",
    "per-user purchase attribution: views within 1h before each purchase",
    (s, d) => {
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val views = base.filter(col("event_type") === "click")
        .select(col("user_id").as("v_user"), col("us").as("v_us"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("us").as("p_us"),
          col("event_id").as("purchase_id"))
      val pairs = purchases.join(views,
        col("v_user") === col("p_user") &&
          col("v_us") <= col("p_us") &&
          col("v_us") >= col("p_us") - lit(3600000000L))
      val perPurchase = pairs.groupBy(col("p_user"), col("purchase_id"))
        .agg(count(lit(1)).as("n_views"))
      val perUser = purchases.groupBy(col("p_user"))
        .agg(count(lit(1)).as("n_purchases"))
      perUser
        .join(perPurchase.groupBy("p_user")
          .agg(count(lit(1)).as("n_attributed"), sum("n_views").as("n_pairs")),
          Seq("p_user"), "left")
        .select(col("p_user").as("user_id"), col("n_purchases"),
          coalesce(col("n_attributed"), lit(0L)).as("n_attributed"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""WITH base AS (
           |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
           |  FROM events),
           |v AS (SELECT user_id AS v_user, us AS v_us FROM base WHERE event_type = 'click'),
           |p AS (SELECT user_id AS p_user, us AS p_us, event_id AS purchase_id
           |      FROM base WHERE event_type = 'purchase'),
           |pairs AS (
           |  SELECT p_user, purchase_id, CAST(count(*) AS BIGINT) AS n_views
           |  FROM p JOIN v ON v_user = p_user
           |               AND v_us <= p_us AND v_us >= p_us - 3600000000
           |  GROUP BY 1, 2),
           |per_user AS (
           |  SELECT p_user, CAST(count(*) AS BIGINT) AS n_purchases FROM p GROUP BY 1),
           |attr AS (
           |  SELECT p_user, CAST(count(*) AS BIGINT) AS n_attributed,
           |         CAST(sum(n_views) AS BIGINT) AS n_pairs
           |  FROM pairs GROUP BY 1)
           |SELECT u.p_user AS user_id, u.n_purchases,
           |       coalesce(a.n_attributed, 0) AS n_attributed,
           |       coalesce(a.n_pairs, 0) AS n_pairs
           |FROM per_user u LEFT JOIN attr a ON u.p_user = a.p_user
           |ORDER BY user_id""".stripMargin))

  /** A15 — weekly cohort retention: users grouped by first-activity week,
    * tracked across week offsets — the standard product-analytics
    * retention matrix. Three aggregations, all user/week-keyed shuffles
    * with map-side combine; the matrix itself is calendar² rows whatever
    * the event volume. Retention is exact integer basis points (n·10⁴
    * div cohort) surfaced as a double percentage — no engine-dependent
    * float division in the gate.
    */
  val a15CohortRetention = QueryDef(
    "a15_cohort_retention",
    "weekly cohort x week-offset retention matrix with exact basis points",
    (s, d) => {
      val act = ev(s, d)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val coh = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
      val sizes = coh.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_users"))
      val cells = act.join(coh, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          expr("datediff(wk, cohort_wk) DIV 7").as("offset_weeks"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      cells.join(sizes, Seq("cohort_wk"))
        .select(col("cohort_wk").as("cohort_week"),
          col("offset_weeks").cast("int").as("offset_weeks"),
          col("n_users"), col("cohort_users"),
          (expr("n_users * 10000 DIV cohort_users").cast("double") / 100)
            .as("retention_pct"))
        .orderBy("cohort_week", "offset_weeks")
    },
    Some("""WITH act AS (
           |  SELECT DISTINCT user_id,
           |         CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
           |  FROM events),
           |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1),
           |sizes AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_users
           |          FROM coh GROUP BY 1),
           |cells AS (
           |  SELECT cohort_wk, datediff('day', cohort_wk, wk) // 7 AS offset_weeks,
           |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |  FROM act JOIN coh USING (user_id) GROUP BY 1, 2)
           |SELECT c.cohort_wk AS cohort_week,
           |       CAST(c.offset_weeks AS INTEGER) AS offset_weeks,
           |       c.n_users, s.cohort_users,
           |       CAST(c.n_users * 10000 // s.cohort_users AS DOUBLE) / 100 AS retention_pct
           |FROM cells c JOIN sizes s ON c.cohort_wk = s.cohort_wk
           |ORDER BY cohort_week, offset_weeks""".stripMargin))

  /** A16 — hopping (sliding) windows: 1-hour windows advancing every 15
    * minutes — the smoothed dashboard view next to ST7's tumbling MVs;
    * the same `window(ts, "1 hour", "15 minutes")` expression runs
    * watermarked in a stream. Each event lands in exactly 4 windows
    * (Spark's Expand), so the blowup is the constant window/hop ratio —
    * output cardinality is the calendar, never event volume. The oracle
    * replays the expansion with epoch-aligned integer window starts in
    * epoch-µs (DuckDB's epoch_us truncates ns→µs exactly like Spark's
    * timestamp read, so window membership matches at the boundary).
    */
  val a16HoppingWindows = QueryDef(
    "a16_hopping_windows",
    "1h windows hopping every 15 min: event + distinct-user counts",
    (s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_micros(col("w.start")).as("window_start_us"),
          col("n_events"), col("n_users"))
        .orderBy("window_start_us"),
    Some("""WITH base AS (
           |  SELECT epoch_us(ts) AS us, user_id FROM events),
           |hopped AS (
           |  SELECT (us // 900000000) * 900000000 - k * 900000000 AS window_start_us,
           |         user_id
           |  FROM base, UNNEST(generate_series(0, 3)) AS g(k))
           |SELECT window_start_us,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM hopped GROUP BY 1 ORDER BY window_start_us""".stripMargin))

  /** A17 — semi-structured access through Spark 4 VariantType: the JSON
    * properties parse ONCE into the binary variant encoding, and field
    * access is a typed path get on that encoding — at 100 TB the
    * difference between one parse per row (then cheap byte-offset gets,
    * shreddable to columnar) and re-parsing the JSON string in every
    * `get_json_object` call (a8's classic path, kept as the baseline).
    * Missing fields surface as typed NULLs, so the aggregate needs no
    * string-level existence checks. Integers end to end — nothing to
    * round, the oracle comparison is exact.
    */
  val a17VariantExtract = QueryDef(
    "a17_variant_extract",
    "typed field access through VariantType (parse once, get by path)",
    (s, d) =>
      Tables.load(s, d, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count(col("k")).as("n_with_k"),
          coalesce(sum(col("k")), lit(0L)).as("sum_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
           |       CAST(coalesce(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)), 0) AS BIGINT) AS sum_k
           |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** W10 — event-type transition matrix: per user, each event's
    * successor (ordered by event time, event_id tiebreak — both engines
    * compare the same epoch-µs longs and the same strings), rolled up to
    * `from_type → to_type` counts and per-from shares. This is the
    * behavioral-flow complement of a7's fixed funnel: the funnel counts
    * a HAND-PICKED path, the transition matrix discovers which paths
    * exist (and feeds Markov-chain session models / next-event
    * prediction features).
    *
    * Scale posture: one `lag` window partitioned by user (state bounded
    * by one user's event count), then two map-combinable aggs; output
    * is event-types² rows regardless of volume.
    */
  val w10EventTransitions = QueryDef(
    "w10_event_transitions",
    "per-user event-type transition matrix with per-source-type shares",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val trans = ev(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = trans.groupBy("from_type").agg(sum(col("n")).as("n_from"))
      trans.join(fromTot, Seq("from_type"))
        .withColumn("share_bp", expr("n * 10000 DIV n_from"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH base AS (
           |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
           |t AS (SELECT event_type AS to_type,
           |             lag(event_type) OVER (PARTITION BY user_id
           |                                   ORDER BY us, event_id) AS from_type
           |      FROM base),
           |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           |      FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
           |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
           |SELECT from_type, to_type, n, n_from, n * 10000 // n_from AS share_bp
           |FROM c JOIN f USING (from_type)
           |ORDER BY from_type, to_type""".stripMargin))

  /** Per-user ordered-funnel depth (view → click → purchase, chain within
    * `T` µs of its anchoring view, strictly increasing timestamps) in
    * LINEAR per-user work — the a19 core, shared with the streaming twin
    * ([[graft.streaming.StreamingFunnel]]).
    *
    * The trick that removes the pair materialization: feasibility of a
    * chain is monotone in how LATE its earlier steps are.
    *   - level 2 — a click `c` completes a (v, c) chain iff some view
    *     `v < c` has `c ≤ v + T`; the best candidate is the LATEST view
    *     strictly before `c` (`prev_view_us`, a strictly-earlier
    *     range-frame running max — `rangeBetween(-∞, -1)` over epoch-µs
    *     is exactly `other.us < this.us`).
    *   - level 3 — a purchase `p` completes (v, c, p) iff some click
    *     `c < p` has its own anchor `prev_view_us(c) ≥ p − T` (the
    *     chain's `c ≤ v + T` is implied by `c < p ≤ v + T`); the best
    *     candidate is the MAX anchor over clicks strictly before `p`
    *     (`best_anchor_us`, a second range-frame running max over the
    *     first — same partitioning and ordering, so Catalyst plans ONE
    *     exchange + ONE sort feeding both Window operators).
    * The final groupBy(user_id) rides the window's hash partitioning
    * (no second shuffle). Each event is touched O(1) times: work is
    * linear in per-user event count, dense bot-grade keys included.
    */
  private[graft] def funnelLevels(events: org.apache.spark.sql.DataFrame,
      T: Long): org.apache.spark.sql.DataFrame =
    graft.operators.WindowFunnel.levels(events,
      Seq("view", "click", "purchase"), T)

  /** A19 — ordered-step window funnel, the ClickHouse `windowFunnel`
    * semantics the reference's speed-layer store is patterned on: per
    * user, the deepest prefix of the step sequence view → click →
    * purchase reachable with STRICTLY increasing timestamps where the
    * whole chain fits in a 24-hour window anchored at the first step
    * (this corpus's per-user event cadence is ~hours apart; a 1 h
    * window left the level-3 stage empty — the window is the funnel's
    * tuning knob, the semantics don't change).
    * a7 counts step events independently (a user who purchased before
    * ever viewing still counts at every stage); this measures ordered
    * PROGRESSION, the number conversion analysis actually needs.
    *
    * Linear per-user formulation (r13 — replaces the r12 interval-join
    * plan whose |views|·|clicks| pair materialization was quadratic in
    * per-key density, the one scale-killer-shaped plan the r12 audit
    * found): ClickHouse's `windowFunnel` is a sorted per-user scan, and
    * that is what two stacked range-frame window aggregates express —
    * see [[funnelLevels]]. One shuffle by user, one sort, zero joins;
    * work is O(events per user), never O(views·clicks).
    */
  val a19WindowFunnel = QueryDef(
    "a19_window_funnel",
    "ordered view->click->purchase funnel levels within a 24h window",
    (s, d) => {
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      funnelLevels(base, 86400000000L) // 24 h in µs
        .groupBy("level").agg(count(lit(1)).as("n_users"))
        .orderBy("level")
    },
    Some("""WITH base AS (
           |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |v AS (SELECT user_id, us AS v_us FROM base WHERE event_type = 'view'),
           |c AS (SELECT user_id, us AS c_us FROM base WHERE event_type = 'click'),
           |p AS (SELECT user_id, us AS p_us FROM base WHERE event_type = 'purchase'),
           |ch2 AS (SELECT v.user_id, v_us, c_us FROM v JOIN c USING (user_id)
           |        WHERE c_us > v_us AND c_us <= v_us + 86400000000),
           |l2 AS (SELECT DISTINCT user_id FROM ch2),
           |l3 AS (SELECT DISTINCT ch2.user_id FROM ch2 JOIN p USING (user_id)
           |       WHERE p_us > c_us AND p_us <= v_us + 86400000000),
           |l1 AS (SELECT DISTINCT user_id FROM v),
           |lv AS (SELECT b.user_id,
           |              (CASE WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END +
           |               CASE WHEN l2.user_id IS NOT NULL THEN 1 ELSE 0 END +
           |               CASE WHEN l3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS level
           |       FROM (SELECT DISTINCT user_id FROM base) b
           |       LEFT JOIN l1 USING (user_id)
           |       LEFT JOIN l2 USING (user_id)
           |       LEFT JOIN l3 USING (user_id))
           |SELECT CAST(level AS BIGINT) AS level,
           |       CAST(count(*) AS BIGINT) AS n_users
           |FROM lv GROUP BY 1 ORDER BY level""".stripMargin))

  /** W14 — multi-touch attribution with WEIGHTED credit: each purchase's
    * value split across the view/click touchpoints in its 24-hour
    * lookback under two standard models — LINEAR (equal split) and
    * U-SHAPED (40% first touch, 40% last, 20% spread over the middle) —
    * reported as credit per touchpoint type. st8 counts attributed
    * touches; this distributes MONEY, the number marketing actually
    * bills by. (st8's 1 h window stays put; the 24 h lookback here is
    * where the ≥3-touch U-shape branch actually exercises — 1,198
    * multi-touch purchases at sf0.1, max 7 touches.)
    *
    * Exact integer cents with deterministic remainders (integer credit
    * division leaves ≤ n−1 cents; both models assign the remainder to
    * the LAST touch — deterministic, mirrored in the oracle), so the
    * gate is an exact hash compare. Plan shape: the st8 interval join
    * (user equi-join, ranges as residual filters), one window per
    * purchase (partition = purchase_id, bounded by touches-per-hour,
    * never per-user history), one census agg.
    */
  val w14MultiTouch = QueryDef(
    "w14_multi_touch_attribution",
    "linear + U-shaped multi-touch revenue attribution over 24h lookback touches",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          * 100).cast("long").as("cents"))
      val touches = base.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("touch_type"),
          col("us").as("t_us"), col("event_id").as("touch_id"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"),
          col("event_id").as("purchase_id"), col("cents"))
      // 24 h lookback (this corpus's touch cadence is hours apart — 1 h
      // leaves every purchase with ≤ 2 touches and the U-shape untested;
      // a19's window knob, same reasoning)
      val pairs = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us") &&
          col("t_us") >= col("p_us") - lit(86400000000L))
      val w = Window.partitionBy("purchase_id")
      val ranked = pairs
        .withColumn("pos", row_number().over(
          w.orderBy(col("t_us"), col("touch_id"))).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("lin", expr("cents DIV n") +
          when(col("pos") === col("n"), expr("cents % n")).otherwise(0L))
        .withColumn("u_bp",
          when(col("n") === 1, lit(10000L))
            .when(col("n") === 2, lit(5000L))
            .when(col("pos") === 1, lit(4000L))
            .when(col("pos") === col("n"), lit(4000L))
            .otherwise(expr("2000 DIV (n - 2)")))
        .withColumn("u", expr("cents * u_bp DIV 10000") +
          when(col("pos") === col("n"),
            col("cents") - expr("sum(cents * u_bp DIV 10000) OVER " +
              "(PARTITION BY purchase_id)")).otherwise(0L))
      ranked.groupBy("touch_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(col("lin")).as("linear_cents"),
          sum(col("u")).as("u_shaped_cents"))
        .orderBy("touch_type")
    },
    Some("""WITH base AS (
           |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
           |         CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT)
           |           AS cents
           |  FROM events),
           |t AS (SELECT user_id, event_type AS touch_type, us AS t_us,
           |             event_id AS touch_id
           |      FROM base WHERE event_type IN ('view', 'click')),
           |p AS (SELECT user_id, us AS p_us, event_id AS purchase_id, cents
           |      FROM base WHERE event_type = 'purchase'),
           |pairs AS (
           |  SELECT p.purchase_id, p.cents, t.touch_type, t.t_us, t.touch_id
           |  FROM p JOIN t ON p.user_id = t.user_id
           |   AND t.t_us < p.p_us AND t.t_us >= p.p_us - 86400000000),
           |rk AS (
           |  SELECT *,
           |         CAST(row_number() OVER (PARTITION BY purchase_id
           |                ORDER BY t_us, touch_id) AS BIGINT) AS pos,
           |         CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT)
           |           AS n
           |  FROM pairs),
           |cr AS (
           |  SELECT *,
           |         cents // n + CASE WHEN pos = n THEN cents % n ELSE 0 END
           |           AS lin,
           |         CASE WHEN n = 1 THEN 10000
           |              WHEN n = 2 THEN 5000
           |              WHEN pos = 1 THEN 4000
           |              WHEN pos = n THEN 4000
           |              ELSE 2000 // (n - 2) END AS u_bp
           |  FROM rk),
           |uc AS (
           |  SELECT *,
           |         cents * u_bp // 10000 +
           |         CASE WHEN pos = n THEN cents -
           |           sum(cents * u_bp // 10000)
           |             OVER (PARTITION BY purchase_id)
           |         ELSE 0 END AS u
           |  FROM cr)
           |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
           |       CAST(sum(lin) AS BIGINT) AS linear_cents,
           |       CAST(sum(u) AS BIGINT) AS u_shaped_cents
           |FROM uc GROUP BY 1 ORDER BY touch_type""".stripMargin))

  /** A20 — four-step ordered window funnel (view → click → signup →
    * purchase) through the generalized
    * [[graft.operators.WindowFunnel]] operator: N−1 stacked anchor
    * windows over ONE exchange + ONE sort, linear per-user work at any
    * step count. The oracle mirrors the anchor recurrence itself
    * (strictly-earlier RANGE frames), so the generalization — not just
    * the census — is value-checked.
    */
  val a20WindowFunnel4 = QueryDef(
    "a20_window_funnel4",
    "4-step ordered funnel levels within 24h via the generalized anchor cascade",
    (s, d) => {
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      graft.operators.WindowFunnel.levels(base,
          Seq("view", "click", "signup", "purchase"), 86400000000L)
        .groupBy("level").agg(count(lit(1)).as("n_users"))
        .orderBy("level")
    },
    Some("""WITH base AS (
           |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
           |w1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END)
           |         OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN
           |               UNBOUNDED PRECEDING AND 1 PRECEDING) AS a1
           |       FROM base),
           |w2 AS (SELECT *, max(CASE WHEN event_type = 'click' THEN a1 END)
           |         OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN
           |               UNBOUNDED PRECEDING AND 1 PRECEDING) AS a2
           |       FROM w1),
           |w3 AS (SELECT *, max(CASE WHEN event_type = 'signup' THEN a2 END)
           |         OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN
           |               UNBOUNDED PRECEDING AND 1 PRECEDING) AS a3
           |       FROM w2),
           |lv AS (SELECT user_id,
           |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) +
           |         max(CASE WHEN event_type = 'click'
           |                   AND us <= a1 + 86400000000 THEN 1 ELSE 0 END) +
           |         max(CASE WHEN event_type = 'signup'
           |                   AND us <= a2 + 86400000000 THEN 1 ELSE 0 END) +
           |         max(CASE WHEN event_type = 'purchase'
           |                   AND us <= a3 + 86400000000 THEN 1 ELSE 0 END)
           |           AS level
           |       FROM w3 GROUP BY 1)
           |SELECT CAST(level AS BIGINT) AS level,
           |       CAST(count(*) AS BIGINT) AS n_users
           |FROM lv GROUP BY 1 ORDER BY level""".stripMargin))

  /** Markov-chain iteration count for w15 — replayed verbatim by the
    * oracle's materialized-CTE rounds (convergence is not adjudicated;
    * both engines run the identical op sequence, the x72/x76 contract).
    */
  private val MarkovIters = 16

  /** w15 journey → transition derivation, exposed for the spec's planted
    * corpora. Input must carry (user_id, event_type, us, event_id).
    *
    * Journey rules (first-order Markov attribution, Anderl et al. 2016
    * shape): sessions split on >30 min inactivity (the st1 rule); a
    * session's events up to and including its first purchase form one
    * journey ending in CONV; post-purchase events start a fresh journey;
    * a journey with no purchase ends in NULL. Consecutive repeats stay
    * (self-loops are first-order-legal and carry real frequency signal).
    */
  private[analytics] def markovTransitions(
      base: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wSess = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    val s3 = base
      .withColumn("new_s",
        when(col("us") - lag("us", 1).over(wUser) > 1800000000L, 1)
          .otherwise(lit(0)))
      .withColumn("sid", sum("new_s").over(wUser))
      .withColumn("pb", coalesce(
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .over(wSess.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    val wJourney = Window.partitionBy(col("user_id"), col("sid"), col("pb"))
      .orderBy("us", "event_id")
    val s4 = s3
      .withColumn("src",
        coalesce(lag("event_type", 1).over(wJourney), lit("START")))
      .withColumn("dst", when(col("event_type") === "purchase", lit("CONV"))
        .otherwise(col("event_type")))
      .withColumn("nxt", lead("event_type", 1).over(wJourney))
    s4.select(col("src"), col("dst")).union(
      s4.filter(col("nxt").isNull && col("event_type") =!= "purchase")
        .select(col("event_type").as("src"), lit("NULL").as("dst")))
  }

  /** The w15 driver fold: transition counts → K fixed-point absorption
    * rounds (full chain + one per removed channel), all BigInt with
    * truncating division (= DuckDB integer `//`). Exposed for the spec.
    */
  private[analytics] def markovRemovalEffects(
      counts: Map[(String, String), Long],
      channels: Seq[String]): Seq[(String, Long, Long, Long, Long, Long)] = {
    val e9 = BigInt(1000000000L)
    val states = "START" +: channels
    val tot: Map[String, BigInt] = counts.groupBy(_._1._1)
      .map { case (s, m) => s -> BigInt(m.values.sum) }
    def absorb(removed: Option[String]): BigInt = {
      var p = states.map(_ -> BigInt(0)).toMap
      for (_ <- 1 to MarkovIters) {
        p = states.map { st =>
          st -> tot.get(st).map { t =>
            val num = counts.iterator.collect {
              case ((s2, dst), n) if s2 == st =>
                val v = dst match {
                  case "CONV" => e9
                  case "NULL" => BigInt(0)
                  case d if removed.contains(d) => BigInt(0)
                  case d => p.getOrElse(d, BigInt(0))
                }
                BigInt(n) * v
            }.sum
            num / t // truncating on non-negatives
          }.getOrElse(BigInt(0))
        }.toMap
      }
      p("START")
    }
    val pFull = absorb(None)
    val eff = channels.map { c =>
      val pRem = absorb(Some(c))
      val removalBp = ((pFull - pRem) * 10000) / pFull.max(BigInt(1))
      (c, pRem, removalBp)
    }
    val totEff = eff.map(_._3).sum.max(BigInt(1))
    eff.map { case (c, pRem, removalBp) =>
      val touches = counts.collect { case ((_, d), n) if d == c => n }.sum
      (c, touches, pFull.toLong, pRem.toLong, removalBp.toLong,
        ((removalBp * 10000) / totEff).toLong)
    }
  }

  /** W15 — Markov removal-effect attribution: the data-driven alternative
    * to w14's positional heuristics. Customer journeys become a
    * first-order Markov chain over touchpoint channels with START / CONV /
    * NULL absorbers; a channel's credit is its REMOVAL EFFECT — how much
    * the chain's START→CONV absorption probability drops when every
    * transition into that channel is redirected to NULL (Anderl et al.
    * 2016, "Mapping the customer journey"; the attribution model shipped
    * in R's ChannelAttribution and Google's data-driven attribution).
    *
    * Distributed/driver split: the corpus-sized work — sessionization,
    * journey splitting, transition extraction — is windowed per user
    * (one shuffle, O(events-per-user) partitions, the a19/st1 shape);
    * what reaches the driver is the transition-count MATRIX, bounded by
    * (channels+1)² regardless of corpus size (the BloomPrune bounded-
    * collect precedent). K=16 absorption rounds over that tiny matrix
    * run in exact BigInt per removal variant — work O(C·K·C²), data-size
    * independent. Absorption probabilities live in 1e-9 units; removal
    * effects and credit shares in basis points; everything integer, so
    * the oracle (identical rounds as materialized HUGEINT CTEs over the
    * same counts) hash-matches exactly. The oracle's no-removal variant
    * sentinel is `chr(1) || 'full'` — outside any plausible event_type
    * namespace, so a channel literally named "FULL" could never be
    * treated as the full chain (the engine side carries the variant as
    * `Option[String]`, which has no such collision by construction).
    */
  val w15MarkovAttribution = QueryDef(
    "w15_markov_attribution",
    "Markov removal-effect attribution: journey chain absorption probability drop per removed channel",
    (s, d) => {
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      val counts = markovTransitions(base)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .collect() // bounded: (channels+2)^2 rows, never corpus-sized
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val channels = ev(s, d).filter(col("event_type") =!= "purchase")
        .select("event_type").distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val rows = markovRemovalEffects(counts, channels).map {
        case (c, touches, pf, pr, rb, sb) =>
          org.apache.spark.sql.Row(c, touches, pf, pr, rb, sb)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("channel",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_touches",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("p_conv_e9",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("p_removed_e9",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("removal_bp",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("share_bp",
          org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("channel")
    },
    Some(w15OracleSql))

  private def w15OracleSql: String = {
    val rounds = (1 to MarkovIters).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT s.rm, s.state,
         |         CAST(COALESCE(SUM(c.n * CASE
         |                WHEN c.dst = 'CONV' THEN 1000000000
         |                WHEN c.dst = 'NULL' OR c.dst = s.rm THEN 0
         |                ELSE COALESCE(q.p, 0) END), 0)
         |              // MAX(t.tot) AS HUGEINT) AS p
         |  FROM p${k - 1} s
         |  JOIN nout t ON t.src = s.state
         |  LEFT JOIN counts c ON c.src = s.state
         |  LEFT JOIN p${k - 1} q ON q.rm = s.rm AND q.state = c.dst
         |  GROUP BY s.rm, s.state)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
       |  FROM events),
       |s1 AS (
       |  SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
       |                 THEN 1 ELSE 0 END AS new_s
       |  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |s2 AS (
       |  SELECT *, SUM(new_s) OVER
       |    (PARTITION BY user_id ORDER BY us, event_id) AS sid
       |  FROM s1),
       |s3 AS (
       |  SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |                              THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id, sid ORDER BY us, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb
       |  FROM s2),
       |s4 AS (
       |  SELECT *, COALESCE(lag(event_type) OVER wj, 'START') AS src,
       |         CASE WHEN event_type = 'purchase' THEN 'CONV'
       |              ELSE event_type END AS dst,
       |         lead(event_type) OVER wj AS nxt
       |  FROM s3 WINDOW wj AS
       |    (PARTITION BY user_id, sid, pb ORDER BY us, event_id)),
       |trans AS (
       |  SELECT src, dst FROM s4
       |  UNION ALL
       |  SELECT event_type AS src, 'NULL' AS dst FROM s4
       |  WHERE nxt IS NULL AND event_type <> 'purchase'),
       |counts AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
       |  FROM trans GROUP BY 1, 2),
       |nout AS MATERIALIZED (
       |  SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM counts GROUP BY 1),
       |channels AS (SELECT DISTINCT event_type AS ch FROM events
       |             WHERE event_type <> 'purchase'),
       |states AS (SELECT ch AS state FROM channels
       |           UNION ALL SELECT 'START'),
       |variants AS (SELECT chr(1) || 'full' AS rm
       |             UNION ALL SELECT ch FROM channels),
       |p0 AS (SELECT v.rm, s.state, CAST(0 AS HUGEINT) AS p
       |       FROM variants v, states s),
       |$rounds,
       |fullp AS (SELECT p FROM p$MarkovIters
       |          WHERE rm = chr(1) || 'full' AND state = 'START'),
       |eff AS (
       |  SELECT rm AS channel, p AS p_removed,
       |         ((SELECT p FROM fullp) - p) * 10000 //
       |           GREATEST((SELECT p FROM fullp), 1) AS removal_bp
       |  FROM p$MarkovIters WHERE rm <> chr(1) || 'full' AND state = 'START'),
       |tote AS (SELECT SUM(removal_bp) AS te FROM eff),
       |touch AS (SELECT dst AS channel, CAST(SUM(n) AS BIGINT) AS n_touches
       |          FROM counts WHERE dst NOT IN ('CONV', 'NULL') GROUP BY 1)
       |SELECT e.channel,
       |       COALESCE(t.n_touches, 0) AS n_touches,
       |       CAST((SELECT p FROM fullp) AS BIGINT) AS p_conv_e9,
       |       CAST(e.p_removed AS BIGINT) AS p_removed_e9,
       |       CAST(e.removal_bp AS BIGINT) AS removal_bp,
       |       CAST(e.removal_bp * 10000 //
       |            GREATEST((SELECT te FROM tote), 1) AS BIGINT) AS share_bp
       |FROM eff e LEFT JOIN touch t USING (channel)
       |ORDER BY channel""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(a7Funnel, a8TierValue, a9ProductPerf,
    t3EpochMs, a11PartitionStats, u2LiteralUnion, st8Attribution,
    a15CohortRetention, a16HoppingWindows, a17VariantExtract,
    w10EventTransitions, a19WindowFunnel, a20WindowFunnel4, w14MultiTouch,
    w15MarkovAttribution)
}
