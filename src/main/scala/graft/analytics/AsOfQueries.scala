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
      // width = in-plan median window span (92 days here): each window
      // lands in ~2 buckets, each order in exactly one
      val w = graft.operators.RangeJoin.bucketWidthFor(iv, "lo_day", "hi_day")
      graft.operators.RangeJoin
        .pointInInterval(points, "day", iv, "lo_day", "hi_day", w)
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

  /** J11 — left-outer form of J9 ([[graft.operators.RangeJoin
    * .pointInIntervalLeft]]): every order keeps a row, orders inside no
    * campaign window land in a 'no_campaign' bucket — the audit shape
    * ("revenue NOT attributable to any promo") a plain inner range join
    * cannot answer. Two hash joins (bucketized inner + key anti-join),
    * never BNLJ; the DuckDB oracle evaluates the same thing as a bare
    * `LEFT JOIN … ON BETWEEN`. The label is coalesced on both sides
    * because the two engines disagree on NULL rendering, not semantics.
    */
  val j11RangeJoinLeft = QueryDef(
    "j11_range_join_left",
    "orders left-joined to campaign windows; no-campaign orders kept (bucketized outer range join)",
    (s, d) => {
      import s.implicits._
      val iv = promoWindows.map { case (name, lo, hi) =>
        (name, java.time.LocalDate.parse(lo).toEpochDay,
          java.time.LocalDate.parse(hi).toEpochDay)
      }.toDF("promo", "lo_day", "hi_day")
      val points = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          unix_date(to_date(col("o_orderdate"))).as("day"))
      val w = graft.operators.RangeJoin.bucketWidthFor(iv, "lo_day", "hi_day")
      graft.operators.RangeJoin
        .pointInIntervalLeft(points, "o_orderkey", "day", iv,
          "lo_day", "hi_day", w)
        .groupBy(coalesce(col("promo"), lit("no_campaign")).as("promo"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Parity.moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("promo")
    },
    Some {
      val values = promoWindows.map { case (name, lo, hi) =>
        s"('$name', DATE '$lo', DATE '$hi')"
      }.mkString(",\n              ")
      s"""SELECT COALESCE(w.promo, 'no_campaign') AS promo,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         |FROM orders o
         |LEFT JOIN (VALUES $values) AS w(promo, lo, hi)
         |  ON CAST(o.o_orderdate AS DATE) BETWEEN w.lo AND w.hi
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })

  /** Maintenance windows for J10 in UTC epoch micros — two of them
    * overlap each other (the 09–15 window contains the 10–12 one), so
    * one session can hit both and pair-dedup correctness is exercised.
    */
  private val maintWindows: Seq[(String, String, String)] = Seq(
    ("wk1_patch", "2024-01-03T02:00:00", "2024-01-03T08:00:00"),
    ("wk2_patch", "2024-01-10T02:00:00", "2024-01-10T08:00:00"),
    ("audit_long", "2024-01-15T09:00:00", "2024-01-15T15:00:00"),
    ("audit_spot", "2024-01-15T10:00:00", "2024-01-15T12:00:00"),
    ("wk3_patch", "2024-01-17T02:00:00", "2024-01-17T08:00:00"),
    ("month_end", "2024-01-29T20:00:00", "2024-01-30T04:00:00"))

  private def epochUs(iso: String): Long =
    java.time.LocalDateTime.parse(iso).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  /** J10 — interval-overlap range join ([[RangeJoin.intervalOverlap]]):
    * st1's 30-minute inactivity sessions, as [first, last]-event
    * intervals, matched to maintenance windows they overlap; per window,
    * how many sessions and distinct users were active. The overlapping
    * window pair exercises the exactly-one-bucket pair-dedup rule; the
    * DuckDB oracle evaluates the same join as a bare overlap predicate.
    */
  val j10IntervalOverlap = QueryDef(
    "j10_interval_overlap",
    "user sessions overlap-joined to maintenance windows (bucketized interval join)",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessions = Tables.load(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(cum))
        .groupBy("user_id", "sid")
        .agg(min(col("us")).as("s_lo"), max(col("us")).as("s_hi"))
      val windows = maintWindows
        .map { case (n, lo, hi) => (n, epochUs(lo), epochUs(hi)) }
        .toDF("maint", "w_lo", "w_hi")
      // width = in-plan median span of the WIDE side (the 6 h maintenance
      // windows): windows replicate ~2x, the narrower sessions ~1x
      val bw = graft.operators.RangeJoin.bucketWidthFor(windows, "w_lo", "w_hi")
      graft.operators.RangeJoin.intervalOverlap(
          sessions, "s_lo", "s_hi", windows, "w_lo", "w_hi", bw)
        .groupBy("maint")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("maint")
    },
    Some {
      val values = maintWindows.map { case (n, lo, hi) =>
        s"('$n', ${epochUs(lo)}, ${epochUs(hi)})"
      }.mkString(",\n              ")
      s"""WITH base AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
         |flagged AS (
         |  SELECT user_id, us, event_id,
         |         CASE WHEN lag(us) OVER w IS NULL THEN 1
         |              WHEN us - lag(us) OVER w > 1800000000 THEN 1
         |              ELSE 0 END AS new_s
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |sess AS (
         |  SELECT user_id, us,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                          ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flagged),
         |intervals AS (
         |  SELECT user_id, sid, min(us) AS s_lo, max(us) AS s_hi
         |  FROM sess GROUP BY 1, 2)
         |SELECT w.maint,
         |       CAST(count(*) AS BIGINT) AS n_sessions,
         |       CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users
         |FROM intervals s
         |JOIN (VALUES $values) AS w(maint, w_lo, w_hi)
         |  ON s.s_lo <= w.w_hi AND w.w_lo <= s.s_hi
         |GROUP BY w.maint ORDER BY w.maint""".stripMargin
    })

  val defs: Seq[QueryDef] =
    Seq(j8AsOfJoin, j9RangeJoin, j10IntervalOverlap, j11RangeJoinLeft)
}
