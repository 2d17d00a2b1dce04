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

  val defs: Seq[QueryDef] = Seq(j8AsOfJoin)
}
