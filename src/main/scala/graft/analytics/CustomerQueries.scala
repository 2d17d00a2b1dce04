package graft.analytics

import graft.{Parity, QueryDef}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Customer-mart analytics: the two-level tier aggregation (A10) and
  * repeat-customer detection (W7) from the batch-analytics spec.
  */
object CustomerQueries {
  import Parity._

  private def ord(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "orders")
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "customer")

  /** A10 — customer-tier analytics mart: two-level aggregation (per-customer
    * order stats, then per-tier averages) + window inter-order gaps.
    * Reference: `.kiro/specs/batch-analytics-layer/design.md:529-551`.
    * Per-customer ratios are snapped to DECIMAL before the second level so
    * tier sums are partial-agg-order independent.
    */
  val a10TierAnalytics = QueryDef(
    "a10_tier_analytics",
    "two-level agg: per-customer metrics -> per-tier averages + gap stats",
    (s, d) => {
      val o = ord(s, d).withColumn("order_date", to_date(col("o_orderdate")))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_date"), col("o_orderkey"))
      val perCustomer = o
        .withColumn("gap_days",
          datediff(col("order_date"), lag(col("order_date"), 1).over(w)))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).as("spend"),
          sum(col("gap_days")).as("sum_gap"),
          count(col("gap_days")).as("n_gaps"))
        .withColumn("tier",
          when(col("n_orders") >= 30, "platinum")
            .when(col("n_orders") >= 20, "gold")
            .when(col("n_orders") >= 10, "silver")
            .otherwise("bronze"))
      perCustomer
        .groupBy("tier")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("n_orders")).as("total_orders"),
          (sum(col("n_orders")).cast("double") / count(lit(1))).as("avg_orders_per_customer"),
          sum(col("spend")).cast("double").as("total_revenue"),
          (sum(col("spend")).cast("double") / sum(col("n_orders"))).as("avg_order_value"),
          sum(when(col("n_orders") > 1, 1L).otherwise(0L)).as("repeat_customers"),
          (sum(col("sum_gap")).cast("double") / sum(col("n_gaps"))).as("avg_days_between_orders"))
        .orderBy("tier")
    },
    Some("""WITH per_cust AS (
              SELECT o_custkey,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
                     sum(gap_days) AS sum_gap,
                     CAST(count(gap_days) AS BIGINT) AS n_gaps
              FROM (SELECT o_custkey, o_totalprice,
                           date_diff('day',
                             lag(CAST(o_orderdate AS DATE)) OVER
                               (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                             CAST(o_orderdate AS DATE)) AS gap_days
                    FROM orders)
              GROUP BY o_custkey),
            tiered AS (
              SELECT *, CASE WHEN n_orders >= 30 THEN 'platinum'
                             WHEN n_orders >= 20 THEN 'gold'
                             WHEN n_orders >= 10 THEN 'silver'
                             ELSE 'bronze' END AS tier
              FROM per_cust)
            SELECT tier,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(n_orders) AS BIGINT) AS total_orders,
                   CAST(sum(n_orders) AS DOUBLE) / count(*) AS avg_orders_per_customer,
                   CAST(sum(spend) AS DOUBLE) AS total_revenue,
                   CAST(sum(spend) AS DOUBLE) / sum(n_orders) AS avg_order_value,
                   CAST(sum(CASE WHEN n_orders > 1 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_customers,
                   CAST(sum(sum_gap) AS DOUBLE) / sum(n_gaps) AS avg_days_between_orders
            FROM tiered GROUP BY tier ORDER BY tier"""))

  /** W7 — repeat-customer detection per segment: window count over customer
    * history. Reference: `.kiro/specs/batch-analytics-layer/design.md:457,567`.
    */
  val w7RepeatCustomers = QueryDef(
    "w7_repeat_customers",
    "repeat vs one-time customer counts per market segment (window count)",
    (s, d) => {
      val o = ord(s, d)
      val c = cust(s, d)
      val perCust = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(when(col("n_orders") > 1, 1L).otherwise(0L)).as("repeat_customers"),
          sum(when(col("n_orders") === 1, 1L).otherwise(0L)).as("one_time_customers"),
          sum(when(col("n_orders") === 0, 1L).otherwise(0L)).as("never_ordered"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH pc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                        FROM orders GROUP BY o_custkey)
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CASE WHEN COALESCE(n_orders,0) > 1 THEN 1 ELSE 0 END) AS BIGINT) AS repeat_customers,
                   CAST(sum(CASE WHEN COALESCE(n_orders,0) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS one_time_customers,
                   CAST(sum(CASE WHEN COALESCE(n_orders,0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS never_ordered
            FROM customer LEFT JOIN pc ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** A18 — recency-decayed customer lifetime value: each order's
    * contribution halves every 7 days of age relative to the fixed
    * reference date (t13's anchor), so the score ranks customers by
    * RECENT spend — the churn-weighted LTV marts feed retention
    * campaigns with, vs a1's all-time totals.
    *
    * Exactness under parallel aggregation: the naive `price·2^{−k}`
    * sums tiny doubles whose FP addition is ORDER-dependent — Spark's
    * partial-aggregation tree and a single-threaded oracle would
    * disagree in the last ulps. So the decay is integer fixed-point:
    * `cents·10⁶ div 2^age_weeks` (exact long shift-division, age capped
    * at 62 so the shift never overflows), summed exactly in any order;
    * the only double is the final display division.
    */
  val a18DecayedLtv = QueryDef(
    "a18_decayed_ltv",
    "recency-decayed LTV per customer (7-day half-life, exact fixed-point)",
    (s, d) => {
      ord(s, d)
        .withColumn("cents",
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast("long"))
        // integer DIV, not Column./ — the latter is floating division
        .withColumn("age_weeks",
          least(
            expr("CAST(datediff(DATE '2001-09-01', to_date(o_orderdate)) DIV 7 AS BIGINT)"),
            lit(62L)))
        .withColumn("decayed_micro",
          expr("(cents * 1000000) DIV shiftleft(CAST(1 AS BIGINT), CAST(age_weeks AS INT))"))
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("cents")).as("total_cents"),
          sum(col("decayed_micro")).as("decayed_micro"))
        .withColumn("decayed_value",
          col("decayed_micro").cast("double") / 1e6 / 100.0)
        .orderBy("c_custkey")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey,
           |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           |         least(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01') // 7,
           |               62) AS age_weeks
           |  FROM orders),
           |dm AS (SELECT o_custkey,
           |              cents,
           |              (cents * 1000000) // (CAST(1 AS BIGINT) << age_weeks) AS decayed_micro
           |       FROM o)
           |SELECT o_custkey AS c_custkey,
           |       CAST(count(*) AS BIGINT) AS n_orders,
           |       CAST(sum(cents) AS BIGINT) AS total_cents,
           |       CAST(sum(decayed_micro) AS BIGINT) AS decayed_micro,
           |       CAST(sum(decayed_micro) AS DOUBLE) / 1000000.0 / 100.0 AS decayed_value
           |FROM dm GROUP BY 1 ORDER BY c_custkey""".stripMargin))

  val defs: Seq[QueryDef] = Seq(a10TierAnalytics, w7RepeatCustomers,
    a18DecayedLtv)
}
