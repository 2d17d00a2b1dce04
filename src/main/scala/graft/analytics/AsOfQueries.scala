package graft.analytics

import graft.QueryDef
import graft.operators.AsOfJoin
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** AS-OF join under the oracle gate: each event matched to the customer's
  * most recent order at or before the event date. The DuckDB oracle uses
  * its NATIVE `ASOF LEFT JOIN` — a fully independent implementation of
  * the same semantics, so a hash-match here validates the union+window
  * composition end to end. Output metrics (match counts, day gaps) are
  * insensitive to which same-date order is carried, keeping the result
  * deterministic across both engines' tie choices.
  */
object AsOfQueries {

  val j8AsOfJoin = QueryDef(
    "j8_asof_join",
    "events as-of joined to each user's latest prior order (union+window)",
    (s, d) => {
      val e = Tables.load(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("event_date"),
          col("event_type"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("order_date"))
      AsOfJoin.asOf(e, o, "user_id", "o_custkey",
        "event_date", "order_date", Seq("order_date"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count(col("order_date")).as("n_matched"),
          sum(datediff(col("event_date"), col("order_date"))).as("sum_gap_days"),
          max(datediff(col("event_date"), col("order_date"))).as("max_gap_days"))
        .orderBy("event_type")
    },
    Some("""SELECT e.event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(o.order_date) AS BIGINT) AS n_matched,
                   CAST(sum(date_diff('day', o.order_date, e.event_date)) AS BIGINT) AS sum_gap_days,
                   CAST(max(date_diff('day', o.order_date, e.event_date)) AS INTEGER) AS max_gap_days
            FROM (SELECT user_id, CAST(ts AS DATE) AS event_date, event_type FROM events) e
            ASOF LEFT JOIN (SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date FROM orders) o
              ON e.user_id = o.o_custkey AND e.event_date >= o.order_date
            GROUP BY e.event_type ORDER BY e.event_type"""))

  /** Campaign windows for J9 — overlapping on purpose (the anniversary
    * window contains summer-1997 and touches both adjacent holiday
    * windows), so a single order can legitimately match several
    * intervals: the case a plain equi-join cannot express and a naive
    * non-equi join answers with a cartesian.
    */
  private val promoWindows: Seq[(String, String, String)] =
    (1995 to 2000).flatMap { y =>
      Seq(
        (s"summer_$y", s"$y-06-01", s"$y-08-31"),
        (s"holiday_$y", s"$y-11-15", s"${y + 1}-01-15"))
    } :+ (("anniversary_1997", "1997-01-01", "1997-12-31"))

  /** J9 — per-campaign order rollup via the bucketized range join
    * ([[graft.operators.RangeJoin]]): order date ∈ [window lo, hi],
    * windows overlap, revenue exact-decimal. The DuckDB oracle states the
    * same join as a bare non-equi predicate — a fully independent
    * evaluation strategy — so a hash match validates the bucket rewrite
    * end to end.
    */
  val j9RangeJoin = QueryDef(
    "j9_range_join",
    "orders matched to overlapping campaign date windows (bucketized range join)",
    (s, d) => {
      import s.implicits._
      val iv = promoWindows.map { case (name, lo, hi) =>
        (name, java.time.LocalDate.parse(lo).toEpochDay,
          java.time.LocalDate.parse(hi).toEpochDay)
      }.toDF("promo", "lo_day", "hi_day")
      val points = Tables.load(s, d, "orders")
        .select(col("o_totalprice"),
          unix_date(to_date(col("o_orderdate"))).as("day"))
      // 61-day buckets ≈ the 92-day median window span: each window lands
      // in 2-8 buckets, each order in exactly one
      graft.operators.RangeJoin
        .pointInInterval(points, "day", iv, "lo_day", "hi_day", 61L)
        .groupBy("promo")
        .agg(count(lit(1)).as("n_orders"),
          graft.Parity.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("promo")
    },
    Some {
      val values = promoWindows.map { case (name, lo, hi) =>
        s"('$name', DATE '$lo', DATE '$hi')"
      }.mkString(",\n              ")
      s"""SELECT w.promo,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         |FROM orders o
         |JOIN (VALUES $values) AS w(promo, lo, hi)
         |  ON CAST(o.o_orderdate AS DATE) BETWEEN w.lo AND w.hi
         |GROUP BY w.promo ORDER BY w.promo""".stripMargin
    })

  val defs: Seq[QueryDef] = Seq(j8AsOfJoin, j9RangeJoin)
}
