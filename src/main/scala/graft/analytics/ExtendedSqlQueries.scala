package graft.analytics

import graft.{Parity, QueryDef}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SQL-surface breadth beyond the reference (which has no grouping sets
  * and no INTERSECT/EXCEPT — SURVEY §2.4/§2.6): multi-level rollups and
  * anti/semi set semantics, so users of general OLAP SQL don't fall off
  * the engine's surface.
  */
object ExtendedSqlQueries {
  import Parity._

  /** E1 — ROLLUP over (status, priority) with grouping flags: per-group,
    * per-status subtotal, and grand total in one pass (Expand-based, one
    * shuffle).
    */
  val e1Rollup = QueryDef(
    "e1_rollup",
    "ROLLUP(status, priority): subtotals + grand total with grouping flags",
    (s, d) =>
      Tables.load(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("revenue"),
          grouping(col("o_orderstatus")).as("g_status"),
          grouping(col("o_orderpriority")).as("g_priority"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus"), col("o_orderpriority")),
    Some("""SELECT o_orderstatus, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                   CAST(CASE WHEN GROUPING(o_orderstatus) THEN 1 ELSE 0 END AS TINYINT) AS g_status,
                   CAST(CASE WHEN GROUPING(o_orderpriority) THEN 1 ELSE 0 END AS TINYINT) AS g_priority
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""))

  /** E2 — INTERSECT / EXCEPT: customer keys active in both halves of the
    * order history vs only the first half.
    */
  val e2IntersectExcept = QueryDef(
    "e2_intersect_except",
    "INTERSECT and EXCEPT of early vs late customer populations",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
        .withColumn("order_date", to_date(col("o_orderdate")))
      val early = o.filter(col("order_date") < "1997-01-01")
        .select(col("o_custkey"))
      val late = o.filter(col("order_date") >= "1997-01-01")
        .select(col("o_custkey"))
      val both = early.intersect(late)
        .agg(count(lit(1)).as("n")).select(lit("retained").as("cohort"), col("n"))
      val churned = early.except(late)
        .agg(count(lit(1)).as("n")).select(lit("churned").as("cohort"), col("n"))
      val acquired = late.except(early)
        .agg(count(lit(1)).as("n")).select(lit("acquired").as("cohort"), col("n"))
      both.unionByName(churned).unionByName(acquired).orderBy("cohort")
    },
    Some("""WITH early AS (SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'),
            late AS (SELECT o_custkey FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01')
            SELECT 'acquired' AS cohort, CAST(count(*) AS BIGINT) AS n FROM (SELECT o_custkey FROM late EXCEPT SELECT o_custkey FROM early)
            UNION ALL
            SELECT 'churned', CAST(count(*) AS BIGINT) FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)
            UNION ALL
            SELECT 'retained', CAST(count(*) AS BIGINT) FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
            ORDER BY cohort"""))

  val defs: Seq[QueryDef] = Seq(e1Rollup, e2IntersectExcept)
}
