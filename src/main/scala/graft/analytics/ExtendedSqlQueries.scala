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

  /** E3 — NTILE + CUME_DIST: revenue-day quartiles per order priority.
    * Window partitions are (priority, calendar day) pre-aggregates —
    * cardinality bounded by priorities × calendar, never by order volume,
    * so the per-partition sort stays task-sized at any corpus scale (the
    * same argument as a13's histogram metadata). Ties: revenue then date
    * (total order → ntile/cume_dist deterministic on both engines).
    */
  val e3NtileCumeDist = QueryDef(
    "e3_ntile_quartiles",
    "NTILE(4) + CUME_DIST of daily revenue within each order priority",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // exact integer cents end to end: a double→decimal re-cast at the
      // second aggregation level is the one known non-portable op (Spark
      // rounds HALF_UP, DuckDB truncates)
      val daily = Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("order_date"))
        .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      val w = Window.partitionBy("priority")
        .orderBy(col("cents"), col("order_date"))
      daily
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .groupBy("priority", "quartile")
        .agg(
          count(lit(1)).as("n_days"),
          (sum(col("cents")).cast("double") / 100).as("revenue"),
          round(max(col("cume")), 6).as("max_cume"))
        .orderBy("priority", "quartile")
    },
    Some("""WITH daily AS (
           |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS order_date,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
           |  FROM orders GROUP BY 1, 2),
           |ranked AS (
           |  SELECT priority, cents, order_date,
           |         ntile(4) OVER (PARTITION BY priority ORDER BY cents, order_date) AS quartile,
           |         round(cume_dist() OVER (PARTITION BY priority ORDER BY cents, order_date), 6) AS cume
           |  FROM daily)
           |SELECT priority, CAST(quartile AS INTEGER) AS quartile,
           |       CAST(count(*) AS BIGINT) AS n_days,
           |       CAST(sum(cents) AS DOUBLE) / 100 AS revenue,
           |       round(max(cume), 6) AS max_cume
           |FROM ranked GROUP BY 1, 2 ORDER BY priority, quartile""".stripMargin))

  /** W8 — 7-day moving average of daily revenue (RANGE frame on epoch
    * days, so calendar gaps widen the window correctly — a ROWS frame
    * would silently average the last 7 *present* days). The window runs
    * over the daily pre-aggregate: one partition, but its cardinality is
    * the CALENDAR (~thousands of rows at any corpus size) — the fact
    * volume was already reduced by the groupBy. Exact decimal sums feed
    * the frame; the average is one deterministic double division.
    */
  val w8MovingAvg = QueryDef(
    "w8_moving_avg",
    "7-day RANGE-frame moving average of daily revenue",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(sum(dec2(col("o_totalprice"))).as("rev_dec"))
        .withColumn("epoch_day", datediff(col("order_date"), lit("1970-01-01")).cast("long"))
      val w = Window.orderBy("epoch_day").rangeBetween(-6, 0)
      daily
        .withColumn("sum7", sum(col("rev_dec")).over(w).cast("double"))
        .withColumn("days7", count(lit(1)).over(w))
        .select(col("order_date"),
          col("rev_dec").cast("double").as("revenue"),
          round(col("sum7") / col("days7"), 4).as("avg7"),
          col("days7"))
        .orderBy("order_date")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS order_date,
           |         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec,
           |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
           |  FROM orders GROUP BY 1, 3)
           |SELECT order_date,
           |       CAST(rev_dec AS DOUBLE) AS revenue,
           |       round(CAST(sum(rev_dec) OVER w AS DOUBLE) /
           |             (count(*) OVER w), 4) AS avg7,
           |       CAST(count(*) OVER w AS BIGINT) AS days7
           |FROM daily
           |WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           |ORDER BY order_date""".stripMargin))

  /** E4 — PIVOT/crosstab: order counts and exact revenue per priority,
    * status pivoted to columns. Spark's `pivot` with an explicit value
    * list compiles to conditional aggregates in ONE pass (no per-status
    * scans); the explicit list is also the scale contract — pivoting on
    * discovered values requires a driver-side distinct first.
    */
  val e4Pivot = QueryDef(
    "e4_pivot",
    "status-pivoted order counts + revenue per priority (one-pass crosstab)",
    (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(
          count(lit(1)).as("n"),
          (sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
        .select(col("priority"),
          coalesce(col("F_n"), lit(0L)).as("f_n"),
          (coalesce(col("F_cents"), lit(0L)).cast("double") / 100).as("f_revenue"),
          coalesce(col("O_n"), lit(0L)).as("o_n"),
          (coalesce(col("O_cents"), lit(0L)).cast("double") / 100).as("o_revenue"),
          coalesce(col("P_n"), lit(0L)).as("p_n"),
          (coalesce(col("P_cents"), lit(0L)).cast("double") / 100).as("p_revenue"))
        .orderBy("priority"),
    Some("""SELECT o_orderpriority AS priority,
           |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
           |       CAST(coalesce(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS DOUBLE) / 100 AS f_revenue,
           |       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
           |       CAST(coalesce(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS DOUBLE) / 100 AS o_revenue,
           |       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n,
           |       CAST(coalesce(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS DOUBLE) / 100 AS p_revenue
           |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin))

  /** E5 — UNPIVOT (melt): the e4 crosstab turned back into long form with
    * the native unpivot operator — wide per-status revenue columns become
    * (priority, status, revenue) rows. Round-trips the pivot surface so
    * wide-table consumers can re-normalize without hand-written unions;
    * the unpivot itself is a zero-shuffle per-row expansion.
    */
  val e5Unpivot = QueryDef(
    "e5_unpivot",
    "UNPIVOT of the status-pivoted revenue crosstab back to long form",
    (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long"))
        .select(col("priority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
        .unpivot(Array(col("priority")),
          Array(col("F"), col("O"), col("P")), "status", "cents")
        .select(col("priority"), col("status"),
          (col("cents").cast("double") / 100).as("revenue"))
        .orderBy("priority", "status"),
    Some("""WITH w AS (
           |  SELECT o_orderpriority AS priority,
           |         coalesce(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS "F",
           |         coalesce(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS "O",
           |         coalesce(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) * 100 AS BIGINT), 0) AS "P"
           |  FROM orders GROUP BY 1)
           |SELECT priority, status, CAST(cents AS DOUBLE) / 100 AS revenue
           |FROM w UNPIVOT (cents FOR status IN ("F", "O", "P"))
           |ORDER BY priority, status""".stripMargin))

  /** E6 — CUBE over (status, priority): every subtotal combination
    * (per-pair, per-status, per-priority, grand total) in ONE Expand-based
    * pass — the remaining grouping-sets shape next to e1's ROLLUP. Output
    * cardinality is (|status|+1) × (|priority|+1), bounded by the dims.
    */
  val e6Cube = QueryDef(
    "e6_cube",
    "CUBE(status, priority): all subtotal combinations with grouping flags",
    (s, d) =>
      Tables.load(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
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
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""))

  /** E7 — GROUPING SETS ((status), (priority), ()): the general form of
    * which e1's ROLLUP and e6's CUBE are special cases — two independent
    * one-dimensional subtotal views plus the grand total in a single
    * Expand-based pass (one shuffle, 3× row expansion, vs three separate
    * scans + a union). At 100 TB the single-scan form is the difference
    * between one pass over the fact table and three.
    */
  val e7GroupingSets = QueryDef(
    "e7_grouping_sets",
    "GROUPING SETS ((status),(priority),()): independent subtotal views in one pass",
    (s, d) =>
      Tables.load(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
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
            FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""))

  /** W9 — earliest/latest-record consolidation via MIN_BY/MAX_BY: per
    * (market segment, year), the priority of the chronologically first and
    * last order. The ordering key is a single long
    * `epoch_day(o_orderdate)·10^10 + o_orderkey` — unique per order, so
    * min_by/max_by are deterministic (no arbitrary-tie hazard) and the
    * whole consolidation is ONE hash aggregate instead of the
    * row_number-window + self-join a naive "first and last per group"
    * takes. Pack-domain bound: the 10^13 multiplier supports order keys
    * < 10^13 (TPC-H SF ≈ 1.6M, far past the 100 TB point) and epoch days
    * < 9·10^5 (year ~4434) before overflowing a long — a struct ordering
    * key would lift the bound but its immutable agg buffer demotes to
    * SortAggregate, which is the wrong trade. The carried value is the
    * priority's int class code, not the string: HashAggregateExec only
    * keeps buffers with mutable primitive fields — a string-valued
    * min_by demotes the whole aggregate to SortAggregate (per-task sort
    * of the fact rows), which at 100 TB is the difference between O(n)
    * and O(n log n) map tasks. Scale posture:
    * min_by/max_by carry one (key, value) pair per group through partial
    * aggregation — map-side combine works, nothing sorts, and the output
    * is bounded by segments × calendar years. Customer is the canonical
    * broadcastable dim (orders ≫ customers).
    */
  val w9FirstLast = QueryDef(
    "w9_first_last_order",
    "per (segment, year): first/latest order priority via deterministic min_by/max_by",
    (s, d) => {
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("prio"),
          to_date(col("o_orderdate")).as("od"),
          dec2(col("o_totalprice")).as("price"))
        .withColumn("yr", year(col("od")))
        .withColumn("ok",
          datediff(col("od"), lit("1970-01-01").cast("date")).cast("long")
            * lit(10000000000000L) + col("o_orderkey"))
      o.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("yr"))
        .agg(
          count(lit(1)).as("n_orders"),
          min_by(col("prio"), col("ok")).as("first_priority"),
          max_by(col("prio"), col("ok")).as("last_priority"),
          sum(col("price")).cast("double").as("revenue"))
        .orderBy("segment", "yr")
    },
    Some("""WITH o AS (
           |  SELECT o_custkey,
           |         CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio,
           |         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
           |         year(CAST(o_orderdate AS DATE)) AS yr,
           |         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           |           * 10000000000000 + o_orderkey AS ok
           |  FROM orders)
           |SELECT c_mktsegment AS segment, CAST(yr AS INTEGER) AS yr,
           |       CAST(count(*) AS BIGINT) AS n_orders,
           |       arg_min(prio, ok) AS first_priority,
           |       arg_max(prio, ok) AS last_priority,
           |       CAST(sum(price) AS DOUBLE) AS revenue
           |FROM o JOIN customer ON o_custkey = c_custkey
           |GROUP BY 1, 2 ORDER BY segment, yr""".stripMargin))

  /** Q7 — robust outlier detection on daily revenue: flag days whose
    * absolute deviation from the median exceeds 5× the median absolute
    * deviation (MAD). Median/MAD instead of mean/stddev because at corpus
    * scale a single corrupt-load day drags the mean enough to mask
    * itself — the breakdown point of MAD is 50%. Every number stays
    * exactly representable: revenues are integer cents (< 2^40), medians
    * of integers are at worst .5 halves, MAD at worst .25 quarters — all
    * exact in IEEE doubles, so the flag comparison is portable, not a
    * tolerance check. Scale posture: the medians run over the DAILY
    * pre-aggregate (calendar-bounded, thousands of rows at any corpus
    * size), never the fact table; the two scalar medians broadcast back.
    * The daily frame is [[graft.PlanCache]]'d: med, dev, and mad all
    * reference it, and static planning cannot reuse the exchange across
    * those subtrees (AQE exchange reuse is runtime-only) — without the
    * cache the plan re-scans the fact table four times.
    */
  val q7OutlierDays = QueryDef(
    "q7_outlier_days",
    "median/MAD robust outlier flags on daily revenue (exact halves)",
    (s, d) => {
      val daily = graft.PlanCache.persisted(s, s"q7-daily:$d") {
        Tables.load(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("order_date"))
          .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      }
      val med = daily.agg(median(col("cents")).as("med"))
      val dev = daily.crossJoin(broadcast(med))
        .withColumn("absdev", abs(col("cents").cast("double") - col("med")))
      val mad = dev.agg(median(col("absdev")).as("mad"))
      dev.crossJoin(broadcast(mad))
        .select(col("order_date"), col("cents"), col("absdev"),
          (col("absdev") > col("mad") * 5).cast("int").as("is_outlier"))
        .orderBy("order_date")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS order_date,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
           |  FROM orders GROUP BY 1),
           |med AS (SELECT median(cents) AS med FROM daily),
           |dev AS (
           |  SELECT order_date, cents, abs(CAST(cents AS DOUBLE) - med) AS absdev
           |  FROM daily CROSS JOIN med),
           |mad AS (SELECT median(absdev) AS mad FROM dev)
           |SELECT order_date, cents, absdev,
           |       CAST(CASE WHEN absdev > mad * 5 THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
           |FROM dev CROSS JOIN mad ORDER BY order_date""".stripMargin))

  /** E8 — ordered LISTAGG (ANSI `LISTAGG … WITHIN GROUP (ORDER BY …)`):
    * per order priority, the market segments concatenated in descending
    * revenue order. The ordering rides INSIDE the aggregate as a
    * `struct(-cents, segment)` sort key — `collect_list` + `array_sort`
    * + `transform` — so the result is deterministic under any partial-
    * aggregation merge order (a bare collect_list string would depend on
    * task arrival). Group state is bounded by the segment vocabulary
    * (5), not row count — the pre-aggregate underneath is the same
    * (priority, segment) rollup, so the fact table never feeds the
    * collect directly. Ties break on the segment name: a total order on
    * both engines.
    */
  val e8OrderedListagg = QueryDef(
    "e8_ordered_listagg",
    "LISTAGG segments per priority in descending-revenue order (deterministic)",
    (s, d) => {
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val sp = Tables.load(s, d, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority").as("priority"), col("segment"))
        .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      sp.groupBy("priority")
        .agg(
          count(lit(1)).as("n_segments"),
          (sum(col("cents")).cast("double") / 100).as("revenue"),
          array_join(
            transform(
              array_sort(collect_list(struct((-col("cents")).as("nr"),
                col("segment").as("seg")))),
              x => x.getField("seg")),
            ",").as("segments_by_revenue"))
        .orderBy("priority")
    },
    Some("""WITH sp AS (
           |  SELECT o_orderpriority AS priority, c_mktsegment AS segment,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY 1, 2)
           |SELECT priority,
           |       CAST(count(*) AS BIGINT) AS n_segments,
           |       CAST(sum(cents) AS DOUBLE) / 100 AS revenue,
           |       string_agg(segment, ',' ORDER BY cents DESC, segment) AS segments_by_revenue
           |FROM sp GROUP BY priority ORDER BY priority""".stripMargin))

  /** E9 — WITH RECURSIVE (Spark 4 recursive CTEs): a month spine from
    * the first to the last order month, left-joined to monthly counts —
    * the "which months have NO data" completeness audit a plain GROUP BY
    * cannot express (absent months produce no groups; the spine
    * manufactures them). Runs through `spark.sql` over the registered
    * table views — the engine's ad-hoc SQL surface — with structurally
    * the same recursive SQL on both engines.
    *
    * Scale posture: every Spark recursion level is a separate mini-job,
    * so a LINEAR spine pays one iteration per month (~84 jobs, measured
    * 11 s of pure scheduling). The recursive term instead BINARY-DOUBLES
    * the step — each (month, step) row emits (month+step, 2·step) and
    * (month, 2·step) — generating the same spine in O(log months)
    * levels (~12 jobs, sub-second), comfortably inside Spark's 100-level
    * recursion guard even for century spans. The oracle keeps the
    * textbook linear form (a single-node engine pays nothing per level);
    * identical results, engine-appropriate recursion shapes. The fact
    * table is touched exactly twice (bounds + monthly rollup).
    */
  val e9RecursiveMonthSpine = QueryDef(
    "e9_recursive_month_spine",
    "month spine x monthly counts: zero-order month audit (recursive-CTE twin)",
    (s, d) => {
      // only `orders` — registerAll here cost ~1 s of driver-side view
      // registration for ten tables the query never touches.
      // Spine via sequence(lo, hi, 1 month) — ONE job. The original
      // WITH RECURSIVE doubling spine was semantically identical but
      // paid ~11 recursion rounds of whole-job scheduling overhead
      // (~3 s fixed at any SF); Spark's native recursive-CTE surface
      // stays exercised (and equality-pinned against this plan) in
      // RecursiveCteSpec. The DuckDB oracle keeps its recursive form.
      graft.sources.Tables.register(s, d, "orders")
      s.sql("""WITH bounds AS (
        |  SELECT make_date(year(min(CAST(o_orderdate AS DATE))),
        |                   month(min(CAST(o_orderdate AS DATE))), 1) AS lo,
        |         make_date(year(max(CAST(o_orderdate AS DATE))),
        |                   month(max(CAST(o_orderdate AS DATE))), 1) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT explode(sequence(lo, hi, interval 1 month)) AS m FROM bounds),
        |monthly AS (
        |  SELECT make_date(year(CAST(o_orderdate AS DATE)),
        |                   month(CAST(o_orderdate AS DATE)), 1) AS m,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT spine.m AS month_start,
        |       CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
        |       CAST(CASE WHEN monthly.m IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
        |FROM spine LEFT JOIN monthly ON spine.m = monthly.m
        |ORDER BY month_start""".stripMargin)
    },
    Some("""WITH RECURSIVE bounds AS (
           |  SELECT make_date(year(min(CAST(o_orderdate AS DATE))),
           |                   month(min(CAST(o_orderdate AS DATE))), 1) AS lo,
           |         make_date(year(max(CAST(o_orderdate AS DATE))),
           |                   month(max(CAST(o_orderdate AS DATE))), 1) AS hi
           |  FROM orders),
           |spine(m) AS (
           |  SELECT lo FROM bounds
           |  UNION ALL
           |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine, bounds WHERE m < hi),
           |monthly AS (
           |  SELECT make_date(year(CAST(o_orderdate AS DATE)),
           |                   month(CAST(o_orderdate AS DATE)), 1) AS m,
           |         CAST(count(*) AS BIGINT) AS n_orders
           |  FROM orders GROUP BY 1)
           |SELECT spine.m AS month_start,
           |       CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
           |       CAST(CASE WHEN monthly.m IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
           |FROM spine LEFT JOIN monthly ON spine.m = monthly.m
           |ORDER BY month_start""".stripMargin))

  /** ST1's batch oracle twin — gaps-and-islands sessionization over the
    * canonical events table: a user's events split into sessions at
    * >30-minute inactivity gaps, rolled up per user. The streaming
    * operator ([[graft.streaming.Sessionization]]) holds the same
    * semantics under state timeouts; this query value-gates them against
    * DuckDB. Per-user windows order by epoch-microsecond integers with
    * event_id tie-breaks (total order → identical islands on both
    * engines); all durations are exact integer µs until the final div.
    */
  /** The st1 sessionization body over any `(user_id, us, event_id)`
    * frame (`us` = epoch microseconds) — factored out so the
    * differential fuzz can drive it with arbitrary event sets.
    */
  private[graft] def sessionRollup(base: org.apache.spark.sql.DataFrame,
      gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sessions = base
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs, 1)
          .when(lag(col("us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        // DIV, not /: long division through a double mis-bins past 2^53
        expr("(max(us) - min(us)) DIV 1000000").as("active_sec"))
    sessions.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("longest_session_events"),
        sum(col("active_sec")).as("total_active_sec"))
      .orderBy("user_id")
  }

  /** W11 — top session paths: the most common ordered event-type
    * sequences per session (truncated to the first 5 steps — the
    * standard cap that keeps path cardinality bounded at any scale),
    * ranked by session count. The product-analytics "what do users
    * actually DO" view — w10 gives single-step transition rates, this
    * gives whole journeys; a19 checks one hand-picked ordered funnel,
    * this DISCOVERS the funnels worth checking. Reuses st1's
    * gaps-and-islands sessionization verbatim (same 30-min rule, same
    * deterministic (us, event_id) ordering).
    *
    * Scale posture: sessionization is the st1 user-partitioned window;
    * the path build is one per-session aggregate (sorted struct
    * collect bounded by session length); the rank is a top-10 over the
    * paths-bounded aggregate (TakeOrdered, never a full sort of
    * sessions).
    */
  val w11SessionPaths = QueryDef(
    "w11_session_paths",
    "top-10 ordered event-type paths (first 5 steps) across 30-min sessions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val sess = base
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(w))
      val paths = sess.groupBy("user_id", "sid")
        .agg(array_join(
          expr("slice(transform(array_sort(collect_list(struct(us, event_id, event_type))), x -> x.event_type), 1, 5)"),
          ">").as("path"))
      val ranked = paths.groupBy("path")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(10)
      ranked.withColumn("rank",
        row_number().over(Window.orderBy(col("n_sessions").desc, col("path")))
          .cast("long"))
        .select(col("rank"), col("path"), col("n_sessions"), col("n_users"))
        .orderBy("rank")
    },
    Some("""WITH base AS (
           |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events),
           |flagged AS (
           |  SELECT user_id, us, event_id, event_type,
           |         CASE WHEN lag(us) OVER w IS NULL THEN 1
           |              WHEN us - lag(us) OVER w > 1800000000 THEN 1
           |              ELSE 0 END AS new_s
           |  FROM base
           |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |sess AS (
           |  SELECT user_id, us, event_id, event_type,
           |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
           |                          ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM flagged),
           |paths AS (
           |  SELECT user_id, sid,
           |         array_to_string(
           |           list_slice(list(event_type ORDER BY us, event_id), 1, 5),
           |           '>') AS path
           |  FROM sess GROUP BY 1, 2),
           |ranked AS (
           |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |  FROM paths GROUP BY 1
           |  ORDER BY n_sessions DESC, path LIMIT 10)
           |SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank,
           |       path, n_sessions, n_users
           |FROM ranked ORDER BY rank""".stripMargin))

  val st1SessionsBatch = QueryDef(
    "st1_sessions_batch",
    "gaps-and-islands sessionization (30 min) rolled up per user",
    (s, d) => sessionRollup(Tables.load(s, d, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))),
    Some("""WITH base AS (
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
           |per_session AS (
           |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
           |         (max(us) - min(us)) // 1000000 AS active_sec
           |  FROM sess GROUP BY 1, 2)
           |SELECT user_id,
           |       CAST(count(*) AS BIGINT) AS n_sessions,
           |       CAST(sum(n_events) AS BIGINT) AS n_events,
           |       CAST(max(n_events) AS BIGINT) AS longest_session_events,
           |       CAST(sum(active_sec) AS BIGINT) AS total_active_sec
           |FROM per_session GROUP BY 1 ORDER BY user_id""".stripMargin))

  /** ST10 — Spark's NATIVE `session_window` operator (the built-in
    * alternative to the mapGroupsWithState sessionizer and the st1
    * window composition): per-session rows with event-time bounds.
    * Boundary semantics pinned by SessionWindowSpec: session windows
    * MERGE when the next window's start <= the current end, so an event
    * at EXACTLY gap distance joins the session and only a strictly
    * greater gap splits — the same `> gap` island rule as st1, which the
    * oracle mirrors. Output bounded by the user_id gate; the identical
    * expression runs streaming with a watermark (SessionWindowSpec).
    */
  val st10SessionWindow = QueryDef(
    "st10_session_window",
    "native session_window(30 min) per-session bounds + counts (user_id < 200)",
    (s, d) =>
      Tables.load(s, d, "events")
        .filter(col("user_id") < 200)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"))
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us"),
    Some("""WITH base AS (
           |  SELECT user_id, epoch_us(ts) AS us, event_id
           |  FROM events WHERE user_id < 200),
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
           |  FROM flagged)
           |SELECT user_id,
           |       CAST(min(us) AS BIGINT) AS start_us,
           |       CAST(max(us) AS BIGINT) AS end_us,
           |       CAST(count(*) AS BIGINT) AS n_events
           |FROM sess GROUP BY user_id, sid
           |ORDER BY user_id, start_us""".stripMargin))

  /** Q8 — k-anonymity generalization-lattice audit (k = 5): for each
    * full-domain generalization level of the quasi-identifier set
    * (nation, segment, account-balance band) → (region, segment, band) →
    * (region, segment) → (segment), the released-vs-suppressed row split
    * if every group smaller than k is suppressed (Sweeney's k-anonymity
    * with record suppression). This is the decision table a curator
    * reads to pick the minimal generalization before releasing
    * customer-joined training data — the structured-data counterpart of
    * t26's PII redaction. `meets_5pct` marks levels whose suppression
    * cost is within the conventional 5% budget.
    *
    * Exactness: suppression rate in exact integer basis points; each
    * level is one combinable groupBy + one bounded re-agg (groups, never
    * rows, reach the second stage). The 4 levels union over the SAME
    * PlanCache'd joined projection — at corpus scale that's one scan of
    * the fact side feeding four group-bounded aggregates. The balance
    * band is `floor(acctbal / 2000)` — one IEEE division + floor,
    * portable.
    */
  val q8KAnonymity = QueryDef(
    "q8_k_anonymity",
    "k=5 anonymity audit per generalization level: groups, released/suppressed, bp",
    (s, d) => {
      val joined = graft.PlanCache.checkpointed(s, s"q8-joined:$d") {
        Tables.load(s, d, "customer")
          .join(broadcast(Tables.load(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_name").as("nation"), col("r_name").as("region"),
            col("c_mktsegment").as("segment"),
            floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      }
      val levels: Seq[(Int, Seq[org.apache.spark.sql.Column])] = Seq(
        0 -> Seq(col("nation"), col("segment"), col("bal_band")),
        1 -> Seq(col("region"), col("segment"), col("bal_band")),
        2 -> Seq(col("region"), col("segment")),
        3 -> Seq(col("segment")))
      levels.map { case (lvl, qi) =>
        joined.groupBy(qi: _*).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("n") >= 5, col("n")).otherwise(0L)).as("released"),
            sum(when(col("n") < 5, col("n")).otherwise(0L)).as("suppressed"))
          .select(lit(lvl).as("level") +: Seq(
            col("n_groups"), col("released"), col("suppressed"),
            expr("suppressed * 10000 div (released + suppressed)")
              .as("suppression_bp")): _*)
      }.reduce(_.unionAll(_))
        .withColumn("meets_5pct", col("suppression_bp") <= 500)
        .orderBy("level")
    },
    Some("""WITH j AS (
           |  SELECT n_name AS nation, r_name AS region,
           |         c_mktsegment AS segment,
           |         CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
           |  FROM customer
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey),
           |l0 AS (SELECT nation, segment, bal_band, count(*) AS n FROM j GROUP BY 1, 2, 3),
           |l1 AS (SELECT region, segment, bal_band, count(*) AS n FROM j GROUP BY 1, 2, 3),
           |l2 AS (SELECT region, segment, count(*) AS n FROM j GROUP BY 1, 2),
           |l3 AS (SELECT segment, count(*) AS n FROM j GROUP BY 1),
           |a AS (
           |  SELECT 0 AS level, CAST(count(*) AS BIGINT) AS n_groups,
           |         CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT) AS released,
           |         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS suppressed
           |  FROM l0
           |  UNION ALL
           |  SELECT 1, CAST(count(*) AS BIGINT),
           |         CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT),
           |         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
           |  FROM l1
           |  UNION ALL
           |  SELECT 2, CAST(count(*) AS BIGINT),
           |         CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT),
           |         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
           |  FROM l2
           |  UNION ALL
           |  SELECT 3, CAST(count(*) AS BIGINT),
           |         CAST(sum(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT),
           |         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
           |  FROM l3)
           |SELECT level, n_groups, released, suppressed,
           |       suppressed * 10000 // (released + suppressed) AS suppression_bp,
           |       suppressed * 10000 // (released + suppressed) <= 500 AS meets_5pct
           |FROM a ORDER BY level""".stripMargin))

  /** Q9 — k-anonymous RELEASE: q8's audit turned into the enforced
    * output. The release level is chosen IN-PLAN — the minimal
    * generalization whose suppression cost fits the 5% budget (computed
    * from the same lattice counts q8 reports) — and the released table
    * is that level's ≥k groups with unified quasi-identifier columns
    * (`geo` = nation / region / '*', `bal_band` = band / '*'), so the
    * schema is level-independent and the policy knob never changes the
    * shape downstream consumers read. Rows in <k groups are suppressed
    * (never emitted); each released row is a GROUP with its size, which
    * is exactly what a k-anonymous view may reveal.
    *
    * All four candidate levels aggregate the same PlanCache'd joined
    * projection (one fact-side scan); the chosen-level scalar broadcasts
    * back onto the 4-level union — group-bounded end to end.
    */
  val q9KAnonymousRelease = QueryDef(
    "q9_k_anonymous_release",
    "k=5 anonymous release at the minimal level within the 5% suppression budget",
    (s, d) => {
      val joined = graft.PlanCache.checkpointed(s, s"q8-joined:$d") {
        Tables.load(s, d, "customer")
          .join(broadcast(Tables.load(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_name").as("nation"), col("r_name").as("region"),
            col("c_mktsegment").as("segment"),
            floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      }
      val star = lit("*")
      val levels: Seq[(Int, org.apache.spark.sql.Column, org.apache.spark.sql.Column)] =
        Seq(
          (0, col("nation"), col("bal_band").cast("string")),
          (1, col("region"), col("bal_band").cast("string")),
          (2, col("region"), star),
          (3, star, star))
      val grouped = levels.map { case (lvl, geo, band) =>
        joined.groupBy(geo.as("geo"), col("segment"), band.as("bal_band"))
          .agg(count(lit(1)).as("n"))
          .select(lit(lvl).as("level"), col("geo"), col("segment"),
            col("bal_band"), col("n"))
      }.reduce(_.unionAll(_))
      val chosen = grouped.groupBy("level")
        .agg(sum(when(col("n") < 5, col("n")).otherwise(0L)).as("sup"),
          sum(col("n")).as("tot"))
        .filter(col("sup") * 10000 <= col("tot") * 500)
        .agg(min(col("level")).as("chosen_level"))
      grouped.join(broadcast(chosen), col("level") === col("chosen_level"))
        .filter(col("n") >= 5)
        .select(col("chosen_level"), col("geo"), col("segment"),
          col("bal_band"), col("n"))
        .orderBy("geo", "segment", "bal_band")
    },
    Some("""WITH j AS (
           |  SELECT n_name AS nation, r_name AS region,
           |         c_mktsegment AS segment,
           |         CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
           |  FROM customer
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey),
           |g AS (
           |  SELECT 0 AS level, nation AS geo, segment,
           |         CAST(bal_band AS VARCHAR) AS bal_band,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM j GROUP BY 1, 2, 3, 4
           |  UNION ALL
           |  SELECT 1, region, segment, CAST(bal_band AS VARCHAR),
           |         CAST(count(*) AS BIGINT)
           |  FROM j GROUP BY 1, 2, 3, 4
           |  UNION ALL
           |  SELECT 2, region, segment, '*', CAST(count(*) AS BIGINT)
           |  FROM j GROUP BY 1, 2, 3, 4
           |  UNION ALL
           |  SELECT 3, '*', segment, '*', CAST(count(*) AS BIGINT)
           |  FROM j GROUP BY 1, 2, 3, 4),
           |audit AS (
           |  SELECT level,
           |         CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS sup,
           |         CAST(sum(n) AS BIGINT) AS tot
           |  FROM g GROUP BY 1),
           |chosen AS (SELECT CAST(min(level) AS INTEGER) AS chosen_level
           |           FROM audit WHERE sup * 10000 <= tot * 500)
           |SELECT chosen_level, geo, segment, bal_band, n
           |FROM g JOIN chosen ON g.level = chosen.chosen_level
           |WHERE n >= 5
           |ORDER BY geo, segment, bal_band""".stripMargin))

  /** Q10 — per-column table profile: the engine-side analog of the
    * reference query tool's column/dtype summary surface
    * (`utils-dev/s3_parquet_query.py:291-292` prints columns + dtypes;
    * the pandas workflow it supports is `describe()`-style profiling),
    * as a distributed plan: for every `orders` column — row count,
    * non-null count, exact distinct count, and TYPED min/max rendered
    * to strings (min/max computed on the native type and cast after
    * aggregation — lexicographic min over stringified numerics would be
    * wrong; doubles render through DECIMAL(12,2) because raw
    * double→string formatting is not portable across engines).
    *
    * Scale posture: one map-combinable aggregation computes all
    * count/min/max cells in a single scan (no Expand — plain
    * aggregates only); distinct counts come from one stack + groupBy
    * pass whose single distinct-aggregate per group avoids the
    * multi-countDistinct Expand blowup; output is columns-bounded.
    */
  /** W12 — RFM customer segmentation: the classic marketing-analytics
    * operator — each customer scored 1–5 on Recency (days since last
    * order), Frequency (order count), and Monetary (lifetime revenue),
    * segments = the (r, f, m) census. "555" is the champions cell,
    * "1xx" the churned tail.
    *
    * The quintile boundaries are VALUE-DETERMINISTIC, not `ntile`:
    * ntile splits ties by physical row order (irreproducible across
    * partitionings), so the scores here come from exact quintile
    * THRESHOLDS — the (i·N/5)-th largest value per dimension via
    * [[graft.operators.RadixSelect.kthLargest]] (one bounded-histogram
    * pass per dimension, never a global sort — at 10⁹ customers a
    * corpus-wide ntile window is a single-partition sort) — and ties at
    * a boundary all land in the HIGHER tile. Scoring is then a pure
    * per-row comparison against 12 broadcast thresholds.
    */
  val w12RfmSegments = QueryDef(
    "w12_rfm_segments",
    "RFM segmentation census: value-deterministic quintile scores via radix-select thresholds",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
      val vals = graft.PlanCache.persisted(s, s"w12-vals/$d") {
        val refd = o.agg(max(to_date(col("o_orderdate"))).as("ref"))
        o.groupBy(col("o_custkey").as("cust"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("vf"),
            (sum(dec2(col("o_totalprice"))) * 100).cast("long").as("vm"))
          .crossJoin(broadcast(refd))
          .withColumn("vr", -datediff(col("ref"), col("last_d")).cast("long"))
          .select("cust", "vr", "vf", "vm")
      }
      // all 12 quintile boundaries (3 dims × ranks 1..4) in ONE grouped
      // bounded-histogram pass: stack the three dimensions as rows and
      // let RadixSelect.thresholds group by dimension
      val stacked = vals.select(explode(array(
          struct(lit("r").as("dim"), col("vr").as("v")),
          struct(lit("f").as("dim"), col("vf").as("v")),
          struct(lit("m").as("dim"), col("vm").as("v")))).as("e"))
        .select(col("e.dim").as("dim"), col("e.v").as("v"))
        .withColumn("one", lit(1L))
      val ranks = vals.agg(count(lit(1)).as("n"))
        .select(explode(expr("array('r', 'f', 'm')")).as("dim"), col("n"))
        .select(col("dim"),
          explode(expr("array(1L, 2L, 3L, 4L)")).as("rank_id"), col("n"))
        .select(col("dim"), col("rank_id"),
          greatest(expr("(rank_id * n) div 5"), lit(1L)).as("budget"))
      val cells = for (p <- Seq("r", "f", "m"); i <- 1 to 4) yield
        max(when(col("dim") === p && col("rank_id") === i, col("thr")))
          .as(s"$p$i")
      val thresholds = graft.operators.RadixSelect
        .thresholds(stacked, Seq("dim"), "v", "one", ranks)
        .agg(cells.head, cells.tail: _*)
      def score(v: String, p: String) =
        (lit(5) - (col(v) < col(s"${p}1")).cast("int") -
          (col(v) < col(s"${p}2")).cast("int") -
          (col(v) < col(s"${p}3")).cast("int") -
          (col(v) < col(s"${p}4")).cast("int")).cast("long")
      vals
        .crossJoin(broadcast(thresholds))
        .withColumn("r_score", score("vr", "r"))
        .withColumn("f_score", score("vf", "f"))
        .withColumn("m_score", score("vm", "m"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"), sum(col("vm")).as("total_cents"))
        .orderBy("r_score", "f_score", "m_score")
    },
    Some {
      def trp(src: String, vcol: String, p: String) =
        s"""${p}tr AS (SELECT i, $vcol AS t FROM ks
           |        JOIN (SELECT $vcol, row_number() OVER (ORDER BY $vcol DESC) AS rn
           |              FROM vals) q ON q.rn = ks.k),
           |${p}p AS (SELECT max(CASE WHEN i = 1 THEN t END) AS ${p}1,
           |              max(CASE WHEN i = 2 THEN t END) AS ${p}2,
           |              max(CASE WHEN i = 3 THEN t END) AS ${p}3,
           |              max(CASE WHEN i = 4 THEN t END) AS ${p}4 FROM ${p}tr)""".stripMargin
      def sc(v: String, p: String) =
        s"""CAST(5 - (CASE WHEN $v < ${p}1 THEN 1 ELSE 0 END)
           |       - (CASE WHEN $v < ${p}2 THEN 1 ELSE 0 END)
           |       - (CASE WHEN $v < ${p}3 THEN 1 ELSE 0 END)
           |       - (CASE WHEN $v < ${p}4 THEN 1 ELSE 0 END) AS BIGINT)""".stripMargin
      s"""WITH custs AS (
         |  SELECT o_custkey AS cust, max(CAST(o_orderdate AS DATE)) AS last_d,
         |         CAST(count(*) AS BIGINT) AS vf,
         |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS vm
         |  FROM orders GROUP BY 1),
         |refd AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders),
         |vals AS (SELECT cust, -CAST(date_diff('day', last_d, ref) AS BIGINT) AS vr,
         |                vf, vm
         |         FROM custs CROSS JOIN refd),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
         |ks AS (SELECT CAST(i AS BIGINT) AS i, greatest((i * n) // 5, 1) AS k
         |       FROM nn, UNNEST([1, 2, 3, 4]) AS u(i)),
         |${trp("vals", "vr", "r")},
         |${trp("vals", "vf", "f")},
         |${trp("vals", "vm", "m")},
         |scored AS (SELECT v.*, ${sc("vr", "r")} AS r_score,
         |                  ${sc("vf", "f")} AS f_score,
         |                  ${sc("vm", "m")} AS m_score
         |           FROM vals v CROSS JOIN rp CROSS JOIN fp CROSS JOIN mp)
         |SELECT r_score, f_score, m_score,
         |       CAST(count(*) AS BIGINT) AS n_customers,
         |       CAST(sum(vm) AS BIGINT) AS total_cents
         |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    })

  /** W13 — per-group winsorized robust statistics: order values clipped
    * at the group's [p5, p95] boundaries before averaging — the outlier
    * treatment every ML feature pipeline applies before normalization
    * (a fat-finger order must not move the mean the model trains on).
    *
    * Both boundaries are tie-inclusive WEIGHTED order statistics from
    * [[graft.operators.RadixSelect.weightedThreshold]] (weight ≡ 1):
    * thr_hi = largest value whose ≥-count reaches n/20 (top-5% cut),
    * thr_lo = largest value whose ≥-count reaches n − n/20 (bottom-5%
    * cut) — value-deterministic, no per-group sort, one bounded
    * histogram pass per boundary. Clipping and the winsorized mean are
    * then pure per-row expressions + one agg, exact integer cents.
    */
  val w13WinsorizedStats = QueryDef(
    "w13_winsorized_stats",
    "per-priority winsorized [p5,p95] order-value means via radix-select boundaries",
    (s, d) => {
      val vals = graft.PlanCache.persisted(s, s"w13-vals/$d") {
        Tables.load(s, d, "orders").select(
          col("o_orderpriority").as("prio"),
          (dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
          lit(1L).as("one"))
      }
      val n = vals.groupBy("prio").agg(count(lit(1)).as("n"))
      def cut(budget: org.apache.spark.sql.Column, name: String) =
        graft.operators.RadixSelect.weightedThreshold(
            vals, Seq("prio"), "cents", "one",
            n.select(col("prio"), greatest(budget, lit(1L)).as("budget")))
          .select(col("prio"), col("thr").as(name))
      // broadcast: the cut frames are one row per group but sit behind
      // windows/aggs Catalyst cannot size — an unhinted join SMJ-shuffles
      // the whole scan (the 100x soak's w13 finding)
      vals
        .join(broadcast(cut(expr("n DIV 20"), "thr_hi")), Seq("prio"))
        .join(broadcast(cut(expr("n - n DIV 20"), "thr_lo")), Seq("prio"))
        .withColumn("w", least(greatest(col("cents"), col("thr_lo")),
          col("thr_hi")))
        .groupBy("prio")
        .agg(count(lit(1)).as("n"),
          min(col("thr_lo")).as("thr_lo"),
          min(col("thr_hi")).as("thr_hi"),
          sum((col("cents") < col("thr_lo")).cast("long")).as("n_clip_lo"),
          sum((col("cents") > col("thr_hi")).cast("long")).as("n_clip_hi"),
          expr("sum(cents) DIV count(1)").as("raw_mean_cents"),
          expr("sum(w) DIV count(1)").as("wins_mean_cents"))
        .orderBy("prio")
    },
    Some("""WITH vals AS (
           |  SELECT o_orderpriority AS prio,
           |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           |           AS cents
           |  FROM orders),
           |nn AS (SELECT prio, CAST(count(*) AS BIGINT) AS n FROM vals
           |       GROUP BY 1),
           |cw AS (SELECT prio, cents AS v,
           |              sum(count(*)) OVER (PARTITION BY prio
           |                                  ORDER BY cents DESC) AS cum
           |       FROM vals GROUP BY prio, cents),
           |hi AS (SELECT prio, max(v) AS thr_hi
           |       FROM cw JOIN nn USING (prio)
           |       WHERE cum >= greatest(n // 20, 1) GROUP BY prio),
           |lo AS (SELECT prio, max(v) AS thr_lo
           |       FROM cw JOIN nn USING (prio)
           |       WHERE cum >= greatest(n - n // 20, 1) GROUP BY prio)
           |SELECT prio, CAST(count(*) AS BIGINT) AS n,
           |       min(thr_lo) AS thr_lo, min(thr_hi) AS thr_hi,
           |       CAST(sum(CASE WHEN cents < thr_lo THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_clip_lo,
           |       CAST(sum(CASE WHEN cents > thr_hi THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_clip_hi,
           |       CAST(sum(cents) // count(*) AS BIGINT) AS raw_mean_cents,
           |       CAST(sum(least(greatest(cents, thr_lo), thr_hi)) // count(*)
           |            AS BIGINT) AS wins_mean_cents
           |FROM vals JOIN hi USING (prio) JOIN lo USING (prio)
           |GROUP BY prio ORDER BY prio""".stripMargin))

  /** Q13 — Benford first-digit audit: the classic fraud / data-quality
    * screen — the first significant digit of order values against
    * Benford's law P(d) = log₁₀(1 + 1/d), deviations in basis points.
    * Synthetic uniform-ish prices are NOT Benford-distributed and the
    * audit reports that honestly (large dev_bp) — the operator's job is
    * the measurement, not a pass verdict; Σ dev_bp (the L1
    * distance) is the alarm number a pipeline thresholds on.
    * One scan, a 9-row census, expected shares as integer constants
    * (⌊log₁₀(1+1/d)·10⁴⌋ — no floating point crosses the gate).
    */
  val q13BenfordAudit = QueryDef(
    "q13_benford_audit",
    "Benford first-digit distribution audit of order values, integer basis points",
    (s, d) => {
      import s.implicits._
      // floor(log10(1+1/d) * 10000) for d = 1..9
      val benford = Seq(3010L, 1760L, 1249L, 969L, 791L, 669L, 579L, 511L,
        457L)
      val exp = benford.zipWithIndex
        .map { case (bp, i) => (i + 1L, bp) }
        .toDF("digit", "benford_bp")
      val digits = Tables.load(s, d, "orders")
        .select(substring((dec2(col("o_totalprice")) * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .join(broadcast(exp), Seq("digit"))
        .withColumn("share_bp", expr("n * 10000 DIV total"))
        .withColumn("dev_bp", abs(col("share_bp") - col("benford_bp")))
        .select(col("digit"), col("n"), col("share_bp"), col("benford_bp"),
          col("dev_bp"))
        .orderBy("digit")
    },
    Some("""WITH digits AS (
           |  SELECT CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           |         CAST(count(*) AS BIGINT) AS n
           |  FROM orders GROUP BY 1),
           |exp AS (SELECT CAST(i AS BIGINT) AS digit,
           |               CAST([3010, 1760, 1249, 969, 791, 669, 579, 511,
           |                     457][i] AS BIGINT) AS benford_bp
           |        FROM UNNEST(generate_series(1, 9)) AS u(i)),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM digits)
           |SELECT digit, n, n * 10000 // total AS share_bp, benford_bp,
           |       abs(n * 10000 // total - benford_bp) AS dev_bp
           |FROM digits JOIN exp USING (digit) CROSS JOIN tot
           |ORDER BY digit""".stripMargin))

  /** E12 — per-key CUSUM: e11's "add a partition key" claim made real —
    * one CUSUM per order priority over monthly counts, a +33% step
    * planted in ONE key only (1-URGENT), and the monitor must say WHICH
    * series shifted: the planted key alarms (month 64 at sf0.01, 62 at
    * sf0.1), the other four stay silent, zero false alarms anywhere —
    * selectivity, not just detection. Monthly grain because per-key
    * weekly counts at sf0.01 are back in the noise regime e11's
    * calibration note documents (σ/μ ≈ 0.34); the planted step is
    * +33% (> e11's +20%) because a per-key series is 5× shorter in
    * mass — both knobs re-measured, not guessed.
    *
    * Same prefix-min identity, windows PARTITIONED BY the key — the
    * per-key state is two running window columns, shuffled once by
    * (key); baselines join back by broadcast (one row per key — the
    * 100×-soak lesson: post-agg tiny frames need the explicit hint).
    */
  val e12CusumPerKey = QueryDef(
    "e12_cusum_per_key",
    "per-priority CUSUM on monthly counts: planted +33% step in one key, selectivity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.load(s, d, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
        .agg(count(lit(1)).as("cnt"))
      val wk = Window.partitionBy("prio").orderBy("mo")
      val idx = monthly
        .withColumn("t", row_number().over(wk).cast("long"))
      val stats = idx.groupBy("prio").agg(count(lit(1)).as("n_months"))
        .select(col("prio"), col("n_months"),
          expr("n_months * 2 DIV 3").as("shift_t"))
      val base = idx.join(broadcast(stats), Seq("prio"))
      val pre = base.filter(col("t") < col("shift_t"))
        .groupBy("prio")
        .agg(sum(col("cnt")).as("total_pre"), count(lit(1)).as("n_pre"))
      val wp = Window.partitionBy("prio").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.join(broadcast(pre), Seq("prio"))
        .withColumn("x", col("cnt") +
          when(col("prio") === "1-URGENT" && col("t") >= col("shift_t"),
            expr("total_pre DIV n_pre DIV 3")).otherwise(0L))
        .withColumn("dev",
          col("n_pre") * col("x") - col("total_pre") -
            expr("total_pre DIV 10"))
        .withColumn("p", sum(col("dev")).over(wp))
        .withColumn("stat",
          col("p") - least(min(col("p")).over(wp), lit(0L)))
        .withColumn("alarm", (col("stat") >= col("total_pre") * 2).cast("long"))
        .groupBy("prio")
        .agg(max(col("n_months")).as("n_months"),
          max(col("shift_t")).as("shift_t"),
          min(when(col("alarm") === 1, col("t"))).as("first_alarm_t"),
          max(col("stat")).as("max_stat"),
          sum(when(col("t") < col("shift_t"), col("alarm")).otherwise(0L))
            .as("n_false_alarm_months"))
        .orderBy("prio")
    },
    Some("""WITH m AS (
           |  SELECT o_orderpriority AS prio,
           |         CAST(date_trunc('month', CAST(o_orderdate AS DATE))
           |              AS DATE) AS mo,
           |         CAST(count(*) AS BIGINT) AS cnt
           |  FROM orders GROUP BY 1, 2),
           |idx AS (SELECT prio, mo, cnt,
           |               CAST(row_number() OVER (PARTITION BY prio
           |                      ORDER BY mo) AS BIGINT) AS t
           |        FROM m),
           |st AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_months,
           |              CAST(count(*) * 2 // 3 AS BIGINT) AS shift_t
           |       FROM idx GROUP BY 1),
           |pre AS (SELECT prio, CAST(sum(cnt) AS BIGINT) AS total_pre,
           |               CAST(count(*) AS BIGINT) AS n_pre
           |        FROM idx JOIN st USING (prio) WHERE t < shift_t
           |        GROUP BY prio),
           |pl AS (SELECT i.prio, t, n_months, shift_t, total_pre, n_pre,
           |              cnt + CASE WHEN i.prio = '1-URGENT' AND t >= shift_t
           |                         THEN total_pre // n_pre // 3
           |                         ELSE 0 END AS x
           |       FROM idx i JOIN st USING (prio) JOIN pre USING (prio)),
           |dv AS (SELECT *, n_pre * x - total_pre - total_pre // 10 AS dev
           |       FROM pl),
           |ps AS (SELECT *, sum(dev) OVER (PARTITION BY prio ORDER BY t
           |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |              AS p FROM dv),
           |sc AS (SELECT *, p - least(min(p) OVER (PARTITION BY prio
           |                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
           |                 CURRENT ROW), 0) AS stat FROM ps),
           |al AS (SELECT *, CASE WHEN stat >= 2 * total_pre THEN 1 ELSE 0 END
           |         AS alarm FROM sc)
           |SELECT prio, max(n_months) AS n_months, max(shift_t) AS shift_t,
           |       min(CASE WHEN alarm = 1 THEN t END) AS first_alarm_t,
           |       CAST(max(stat) AS BIGINT) AS max_stat,
           |       CAST(sum(CASE WHEN t < shift_t THEN alarm ELSE 0 END)
           |            AS BIGINT) AS n_false_alarm_months
           |FROM al GROUP BY prio ORDER BY prio""".stripMargin))

  /** Q14 — right-to-be-forgotten cascade audit: for a deterministic
    * erasure-request set (1% of customers here), the full blast radius a
    * compliant delete must cover — the customer rows themselves, their
    * orders, the lineitems of those orders (two FK hops), and their
    * event history — counted per table with basis-point shares, plus the
    * cascade-consistency invariant (lineitems erased ≡ lineitems of
    * erased orders, so a partial cascade is visible as a mismatch).
    * The privacy family's missing execution-side member: q8/q9 audit
    * release anonymity, q12 pseudonymizes, q14 scopes actual erasure.
    *
    * Scale: the request set is a broadcast semi-join onto each fact
    * table (the 100 TB tables are scanned once each, no shuffles beyond
    * the order→lineitem hop, which joins on the FK the tables would be
    * bucketed by); counts are map-combinable.
    */
  val q14ErasureCascade = QueryDef(
    "q14_erasure_cascade",
    "GDPR erasure blast radius: per-table cascade counts for a 1% request set",
    (s, d) => {
      val req = Tables.load(s, d, "customer")
        .filter(col("c_custkey") % 97 === 13)
        .select(col("c_custkey").as("k"))
      val cust = Tables.load(s, d, "customer")
      val ord = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      val ev = Tables.load(s, d, "events")
      val erasedOrders = ord.join(broadcast(req),
        col("o_custkey") === col("k"), "left_semi")
      // fully in-plan (no driver-side counts): per table, the erased
      // semi-join count × the total count as 1-row frames, unioned
      def row(table: String, erased: org.apache.spark.sql.DataFrame,
          full: org.apache.spark.sql.DataFrame) =
        erased.agg(count(lit(1)).as("n_erased"))
          .crossJoin(broadcast(full.agg(count(lit(1)).as("n_total"))))
          .select(lit(table).as("tbl"), col("n_erased"), col("n_total"),
            expr("n_erased * 10000 DIV greatest(n_total, 1)").as("share_bp"))
      row("customer",
          cust.join(broadcast(req), col("c_custkey") === col("k"),
            "left_semi"), cust)
        .unionByName(row("orders", erasedOrders, ord))
        .unionByName(row("lineitem",
          li.join(erasedOrders.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi"), li))
        .unionByName(row("events",
          ev.join(broadcast(req), col("user_id") === col("k"),
            "left_semi"), ev))
        .orderBy("tbl")
    },
    Some("""WITH req AS (SELECT c_custkey AS k FROM customer
           |            WHERE c_custkey % 97 = 13),
           |eo AS (SELECT o_orderkey FROM orders
           |       WHERE o_custkey IN (SELECT k FROM req)),
           |c AS (SELECT 'customer' AS tbl,
           |             CAST((SELECT count(*) FROM customer
           |                   WHERE c_custkey IN (SELECT k FROM req)) AS BIGINT)
           |               AS n_erased,
           |             CAST((SELECT count(*) FROM customer) AS BIGINT)
           |               AS n_total),
           |o AS (SELECT 'orders', CAST((SELECT count(*) FROM eo) AS BIGINT),
           |             CAST((SELECT count(*) FROM orders) AS BIGINT)),
           |l AS (SELECT 'lineitem',
           |             CAST((SELECT count(*) FROM lineitem
           |                   WHERE l_orderkey IN (SELECT o_orderkey FROM eo))
           |                  AS BIGINT),
           |             CAST((SELECT count(*) FROM lineitem) AS BIGINT)),
           |e AS (SELECT 'events',
           |             CAST((SELECT count(*) FROM events
           |                   WHERE user_id IN (SELECT k FROM req)) AS BIGINT),
           |             CAST((SELECT count(*) FROM events) AS BIGINT))
           |SELECT tbl, n_erased, n_total,
           |       n_erased * 10000 // greatest(n_total, 1) AS share_bp
           |FROM (SELECT * FROM c UNION ALL SELECT * FROM o
           |      UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e)
           |ORDER BY tbl""".stripMargin))

  /** Q16 — schema/stat drift audit (the data-contract check run on every
    * new drop): events split at the time midpoint, every column profiled
    * on both halves in ONE stacked pass — null rate and distinct count
    * per (column, half), deltas in basis points. q6 tracks one column's
    * VALUE distribution; q16 watches the whole schema's SHAPE (a
    * upstream producer silently nulling a field or collapsing an enum
    * shows up here before any value-level audit fires).
    *
    * Scale: the per-column stack is an explode of a literal 4-struct
    * array (map-side, ×4 rows), then ONE groupBy (column, half) with a
    * single distinct aggregate per group — no multi-countDistinct
    * Expand (q10's discipline); output is columns-bounded.
    */
  val q16SchemaDrift = QueryDef(
    "q16_schema_drift",
    "per-column null-rate and distinct-count drift, early vs late half",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val mid = ev.agg(((min(unix_micros(col("ts"))) +
        max(unix_micros(col("ts")))) / 2).cast("long").as("mid_us"))
      val stacked = ev.crossJoin(broadcast(mid))
        .withColumn("half",
          when(unix_micros(col("ts")) < col("mid_us"), "early")
            .otherwise("late"))
        .select(col("half"), explode(array(
          struct(lit("user_id").as("c"),
            col("user_id").cast("string").as("v")),
          struct(lit("event_type").as("c"), col("event_type").as("v")),
          struct(lit("value").as("c"), col("value").cast("string").as("v")),
          struct(lit("props").as("c"), col("props").as("v")))).as("e"))
        .select(col("half"), col("e.c").as("c"), col("e.v").as("v"))
      val prof = stacked.groupBy("c", "half")
        .agg(count(lit(1)).as("n"),
          sum(col("v").isNull.cast("long")).as("n_null"),
          countDistinct(col("v")).as("n_distinct"))
        .withColumn("null_bp", expr("n_null * 10000 DIV n"))
      prof.filter(col("half") === "early")
        .select(col("c"), col("n").as("early_n"),
          col("null_bp").as("early_null_bp"),
          col("n_distinct").as("early_distinct"))
        .join(prof.filter(col("half") === "late")
          .select(col("c"), col("n").as("late_n"),
            col("null_bp").as("late_null_bp"),
            col("n_distinct").as("late_distinct")), Seq("c"))
        .withColumn("null_drift_bp",
          abs(col("early_null_bp") - col("late_null_bp")))
        .withColumn("distinct_ratio_bp",
          expr("late_distinct * 10000 DIV greatest(early_distinct, 1)"))
        .orderBy("c")
    },
    Some("""WITH mid AS (
           |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
           |              AS BIGINT) AS mid_us
           |  FROM events),
           |stacked AS (
           |  SELECT CASE WHEN epoch_us(ts) < mid_us THEN 'early'
           |              ELSE 'late' END AS half, u.c, u.v
           |  FROM events CROSS JOIN mid
           |  CROSS JOIN LATERAL (VALUES
           |    ('user_id', CAST(user_id AS VARCHAR)),
           |    ('event_type', event_type),
           |    ('value', CAST("value" AS VARCHAR)),
           |    ('props', props)) AS u(c, v)),
           |prof AS (
           |  SELECT c, half, CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
           |              AS BIGINT) AS n_null,
           |         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
           |  FROM stacked GROUP BY 1, 2),
           |p2 AS (SELECT *, n_null * 10000 // n AS null_bp FROM prof)
           |SELECT e.c, e.n AS early_n, e.null_bp AS early_null_bp,
           |       e.n_distinct AS early_distinct,
           |       l.n AS late_n, l.null_bp AS late_null_bp,
           |       l.n_distinct AS late_distinct,
           |       abs(e.null_bp - l.null_bp) AS null_drift_bp,
           |       l.n_distinct * 10000 // greatest(e.n_distinct, 1)
           |         AS distinct_ratio_bp
           |FROM (SELECT * FROM p2 WHERE half = 'early') e
           |JOIN (SELECT * FROM p2 WHERE half = 'late') l USING (c)
           |ORDER BY c""".stripMargin))

  /** E11 — CUSUM changepoint detection over the weekly order-count
    * series, the drift monitor a pipeline runs on every ingested fact
    * stream ("did volume shift?"). A step shift is PLANTED IN-PLAN at ⅔
    * of the series (+20% of the pre-shift mean — the x48 measured-recall
    * discipline applied to time series): the output reports the planted
    * shift index, the first alarm, the detection delay, and pre-shift
    * false-alarm weeks, all deterministic and oracle-replayed. Weekly
    * grain is the calibration: daily counts at sf0.01 average ~6
    * (Poisson σ/μ ≈ 0.4 — a +20% step drowns; measured 341 false-alarm
    * days), weekly ≈ 44 (σ/μ ≈ 0.15 — measured 0 false alarms, delay
    * 21 weeks at BOTH sf0.01 and sf0.1 with k = δ/2, h = 2·mean).
    *
    * The CUSUM recursion S_t = max(0, S_{t−1} + dev_t) is NOT computed
    * recursively: S_t ≡ P_t − min(0, min_{j≤t} P_j) with P the running
    * sum of deviations — two stacked prefix windows over the
    * calendar-bounded daily series (same partitioning and sort, ONE
    * exchange), the form that scales to per-key CUSUM by adding a
    * partition key. Exact integer math: deviations scaled by n_pre so
    * mean subtraction needs no division (dev = n_pre·x − total_pre −
    * allowance, allowance = 10% of the pre-shift mean = δ/2, the
    * CUSUM-optimal choice; threshold = 2 pre-shift-means·n_pre).
    */
  val e11CusumChangepoint = QueryDef(
    "e11_cusum_changepoint",
    "CUSUM changepoint on weekly order counts, planted +20% step, prefix-min identity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, d, "orders")
        .groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("date"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("date")
      val idx = daily.withColumn("t", row_number().over(w).cast("long"))
      val stats = idx.agg(count(lit(1)).as("n_weeks"))
        .select(col("n_weeks"), expr("n_weeks * 2 DIV 3").as("shift_t"))
      val base = idx.crossJoin(broadcast(stats))
      val pre = base.filter(col("t") < col("shift_t"))
        .agg(sum(col("cnt")).as("total_pre"), count(lit(1)).as("n_pre"))
      val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.crossJoin(broadcast(pre))
        .withColumn("x", col("cnt") +
          when(col("t") >= col("shift_t"),
            expr("total_pre DIV n_pre DIV 5")).otherwise(0L))
        .withColumn("dev",
          col("n_pre") * col("x") - col("total_pre") -
            expr("total_pre DIV 10"))
        .withColumn("p", sum(col("dev")).over(wp))
        .withColumn("stat",
          col("p") - least(min(col("p")).over(wp), lit(0L)))
        .withColumn("alarm",
          (col("stat") >= col("total_pre") * 2).cast("long"))
        .agg(
          max(col("n_weeks")).as("n_weeks"),
          max(col("shift_t")).as("shift_t"),
          min(when(col("alarm") === 1, col("t"))).as("first_alarm_t"),
          (min(when(col("alarm") === 1, col("t"))) - max(col("shift_t")))
            .as("detection_delay"),
          max(col("stat")).as("max_stat"),
          sum(when(col("t") < col("shift_t"), col("alarm")).otherwise(0L))
            .as("n_false_alarm_weeks"))
    },
    Some("""WITH daily AS (
           |  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
           |           AS date,
           |         CAST(count(*) AS BIGINT) AS cnt
           |  FROM orders GROUP BY 1),
           |idx AS (SELECT date, cnt,
           |               CAST(row_number() OVER (ORDER BY date) AS BIGINT) AS t
           |        FROM daily),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
           |              CAST(count(*) * 2 // 3 AS BIGINT) AS shift_t FROM idx),
           |pre AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_pre,
           |               CAST(count(*) AS BIGINT) AS n_pre
           |        FROM idx, st WHERE t < shift_t),
           |pl AS (SELECT t, n_weeks, shift_t, total_pre, n_pre,
           |              cnt + CASE WHEN t >= shift_t
           |                         THEN total_pre // n_pre // 5 ELSE 0 END AS x
           |       FROM idx, st, pre),
           |dv AS (SELECT *, n_pre * x - total_pre - total_pre // 10 AS dev
           |       FROM pl),
           |ps AS (SELECT *, sum(dev) OVER (ORDER BY t ROWS BETWEEN
           |                 UNBOUNDED PRECEDING AND CURRENT ROW) AS p FROM dv),
           |sc AS (SELECT *, p - least(min(p) OVER (ORDER BY t ROWS BETWEEN
           |                 UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS stat
           |       FROM ps),
           |al AS (SELECT *, CASE WHEN stat >= 2 * total_pre THEN 1 ELSE 0 END
           |         AS alarm
           |       FROM sc)
           |SELECT max(n_weeks) AS n_weeks, max(shift_t) AS shift_t,
           |       min(CASE WHEN alarm = 1 THEN t END) AS first_alarm_t,
           |       min(CASE WHEN alarm = 1 THEN t END) - max(shift_t)
           |         AS detection_delay,
           |       CAST(max(stat) AS BIGINT) AS max_stat,
           |       CAST(sum(CASE WHEN t < shift_t THEN alarm ELSE 0 END)
           |            AS BIGINT) AS n_false_alarm_weeks
           |FROM al""".stripMargin))

  /** Q12 — consistent keyed pseudonymization with a referential-integrity
    * audit: replace the customer key with a salted keyed hash
    * (`graft_md5u60('cust:' || key)` — in production the salt is a
    * secret; the pipeline shape is identical) CONSISTENTLY across
    * `customer` and `orders`, and audit the two properties a
    * pseudonymized release must keep: (1) injectivity — distinct keys
    * map to distinct pseudonyms (collisions = keys − pseudonyms, must
    * be 0); (2) join preservation — the customer⋈orders pair count is
    * unchanged when joining on pseudonyms instead of keys (a collision
    * would silently MERGE two customers' order histories; `joined_post ≥
    * joined_pre` detects exactly that). The privacy-engineering
    * complement to q8/q9: k-anonymity generalizes quasi-identifiers,
    * pseudonymization protects the direct identifier while keeping the
    * schema joinable.
    *
    * Scale posture: pseudonymization is a pure per-row expression (no
    * shuffle — re-derivable on any cluster, like the x10 split); the
    * audit is two count-distinct aggregates and two equi-joins on
    * key/pseudonym. Nothing beyond the joins the tables already do.
    */
  val q12Pseudonymization = QueryDef(
    "q12_pseudonymization",
    "salted keyed pseudonymization of custkey across customer/orders + injectivity and join-preservation audit",
    (s, d) => {
      def pseud(c: org.apache.spark.sql.Column) =
        call_function("graft_md5u60", concat(lit("cust:"), c.cast("string")))
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("k")).withColumn("p", pseud(col("k")))
      val ords = Tables.load(s, d, "orders")
        .select(col("o_custkey").as("k")).withColumn("p", pseud(col("k")))
      def tableAudit(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("k")).as("n_keys"),
          countDistinct(col("p")).as("n_pseudonyms"))
          .select(lit(name).as("entity"), col("n_rows"), col("n_keys"),
            col("n_pseudonyms"),
            (col("n_keys") - col("n_pseudonyms")).as("collisions"),
            lit(0L).as("joined_pre"), lit(0L).as("joined_post"),
            when(col("n_keys") === col("n_pseudonyms"), "ok")
              .otherwise("collision").as("verdict"))
      val pre = cust.select("k").distinct().join(ords, Seq("k"))
        .agg(count(lit(1)).as("joined_pre"))
      val post = cust.select("p").distinct().join(ords, Seq("p"))
        .agg(count(lit(1)).as("joined_post"))
      val joinAudit = pre.crossJoin(broadcast(post))
        .select(lit("custkey_join").as("entity"), lit(0L).as("n_rows"),
          lit(0L).as("n_keys"), lit(0L).as("n_pseudonyms"),
          lit(0L).as("collisions"), col("joined_pre"), col("joined_post"),
          when(col("joined_pre") === col("joined_post"), "ok")
            .otherwise("merged").as("verdict"))
      tableAudit(cust, "customer").unionByName(tableAudit(ords, "orders"))
        .unionByName(joinAudit)
        .orderBy("entity")
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey AS k,
           |         CAST(md5_number_lower('cust:' || CAST(c_custkey AS VARCHAR)) >> 4
           |              AS BIGINT) AS p
           |  FROM customer),
           |ords AS (
           |  SELECT o_custkey AS k,
           |         CAST(md5_number_lower('cust:' || CAST(o_custkey AS VARCHAR)) >> 4
           |              AS BIGINT) AS p
           |  FROM orders),
           |ca AS (SELECT 'customer' AS entity,
           |              CAST(count(*) AS BIGINT) AS n_rows,
           |              CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           |              CAST(count(DISTINCT p) AS BIGINT) AS n_pseudonyms
           |       FROM cust),
           |oa AS (SELECT 'orders' AS entity,
           |              CAST(count(*) AS BIGINT) AS n_rows,
           |              CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           |              CAST(count(DISTINCT p) AS BIGINT) AS n_pseudonyms
           |       FROM ords),
           |pre AS (SELECT CAST(count(*) AS BIGINT) AS joined_pre
           |        FROM (SELECT DISTINCT k FROM cust) c JOIN ords o ON c.k = o.k),
           |post AS (SELECT CAST(count(*) AS BIGINT) AS joined_post
           |         FROM (SELECT DISTINCT p FROM cust) c JOIN ords o ON c.p = o.p),
           |tbl AS (
           |  SELECT entity, n_rows, n_keys, n_pseudonyms,
           |         n_keys - n_pseudonyms AS collisions,
           |         CAST(0 AS BIGINT) AS joined_pre,
           |         CAST(0 AS BIGINT) AS joined_post,
           |         CASE WHEN n_keys = n_pseudonyms THEN 'ok'
           |              ELSE 'collision' END AS verdict
           |  FROM (SELECT * FROM ca UNION ALL SELECT * FROM oa)),
           |jn AS (
           |  SELECT 'custkey_join' AS entity, CAST(0 AS BIGINT) AS n_rows,
           |         CAST(0 AS BIGINT) AS n_keys, CAST(0 AS BIGINT) AS n_pseudonyms,
           |         CAST(0 AS BIGINT) AS collisions, joined_pre, joined_post,
           |         CASE WHEN joined_pre = joined_post THEN 'ok'
           |              ELSE 'merged' END AS verdict
           |  FROM pre CROSS JOIN post)
           |SELECT * FROM tbl UNION ALL SELECT * FROM jn ORDER BY entity""".stripMargin))

  val q10ColumnProfile = QueryDef(
    "q10_column_profile",
    "per-column profile of orders: nulls, exact distincts, typed min/max",
    (s, d) => {
      val names = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      def castStr(n: String)(c: org.apache.spark.sql.Column) =
        if (n == "o_totalprice")
          c.cast(org.apache.spark.sql.types.DecimalType(12, 2)).cast("string")
        else c.cast("string")
      val o = Tables.load(s, d, "orders")
      val aggs = count(lit(1)).as("n_rows") +: names.flatMap { n =>
        Seq(count(col(n)).as(s"${n}_nn"),
          castStr(n)(min(col(n))).as(s"${n}_min"),
          castStr(n)(max(col(n))).as(s"${n}_max"))
      }
      val wide = o.agg(aggs.head, aggs.tail: _*)
      val perCol = wide.select(col("n_rows"),
        explode(array(names.map(n => struct(
          lit(n).as("column_name"),
          col(s"${n}_nn").as("n_nonnull"),
          col(s"${n}_min").as("min_val"),
          col(s"${n}_max").as("max_val"))): _*)).as("e"))
        .select(col("e.column_name"), col("n_rows"), col("e.n_nonnull"),
          col("e.min_val"), col("e.max_val"))
      // distinct pass: raw-value string cast is injective per column in
      // both engines, so the COUNT matches even though the rendering of
      // a raw double differs — only counts cross the engine boundary
      val dist = o.select(explode(array(names.map(n => struct(
          lit(n).as("column_name"),
          col(n).cast("string").as("v"))): _*)).as("e"))
        .select(col("e.column_name"), col("e.v"))
        .groupBy("column_name")
        .agg(countDistinct(col("v")).as("n_distinct"))
      perCol.join(dist, Seq("column_name"))
        .select(col("column_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy("column_name")
    },
    Some {
      val cols = Seq(
        ("o_orderkey", "CAST(%s AS VARCHAR)"),
        ("o_custkey", "CAST(%s AS VARCHAR)"),
        ("o_orderstatus", "CAST(%s AS VARCHAR)"),
        ("o_totalprice", "CAST(CAST(%s AS DECIMAL(12,2)) AS VARCHAR)"),
        ("o_orderdate", "CAST(%s AS VARCHAR)"),
        ("o_orderpriority", "CAST(%s AS VARCHAR)"))
      cols.map { case (n, fmt) =>
        val mn = fmt.format(s"min($n)")
        val mx = fmt.format(s"max($n)")
        s"""SELECT '$n' AS column_name,
           |       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           |       CAST(count($n) AS BIGINT) AS n_nonnull,
           |       CAST(count(DISTINCT $n) AS BIGINT) AS n_distinct,
           |       $mn AS min_val, $mx AS max_val
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    })

  /** E10 — time-series gap filling with linear interpolation: the daily
    * revenue series of 'P'-status orders (a sparse slice — 2,119 of the
    * 2,404 spine days have data at sf0.01) re-gridded onto the complete
    * calendar spine, missing days linearly interpolated between the
    * nearest known neighbors. This is the resample/asfreq primitive
    * every dashboarding and forecasting pipeline needs between the raw
    * facts and a model — without it a moving average (w8) silently
    * treats a gap as "day didn't happen".
    *
    * Exactness: interpolation is integer-cent arithmetic —
    * `prev + (next−prev)·Δ div span` (truncating integer division,
    * identical in both engines — Spark `DIV` and DuckDB `//` both
    * truncate toward zero, verified including negative slopes) —
    * never a double ratio. Edge days with only one known neighbor carry
    * it. Scale posture: the spine is calendar-bounded (O(days),
    * data-independent — the e9 argument), so the single-partition
    * ordered window over it is bounded regardless of fact volume; the
    * daily aggregate underneath is the usual map-combinable shuffle.
    */
  val e10GapFill = QueryDef(
    "e10_gap_fill",
    "calendar-spine gap fill of sparse daily revenue, exact linear interpolation",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus") === "P")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("cents"))
      val spine = daily
        .agg(min(col("date")).as("lo"), max(col("date")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("date"))
      val w = Window.orderBy("date")
      val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("date"), "left")
        .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wp))
        .withColumn("pd", last(when(col("cents").isNotNull, col("date")),
          ignoreNulls = true).over(wp))
        .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wf))
        .withColumn("nd", first(when(col("cents").isNotNull, col("date")),
          ignoreNulls = true).over(wf))
        .withColumn("filled_cents",
          when(col("cents").isNotNull, col("cents"))
            .when(col("pc").isNotNull && col("nc").isNotNull,
              expr("pc + ((nc - pc) * datediff(date, pd)) DIV datediff(nd, pd)"))
            .otherwise(coalesce(col("pc"), col("nc"))))
        .select(col("date"), col("filled_cents"),
          col("cents").isNull.as("is_interpolated"))
        .orderBy("date")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS date,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
           |  FROM orders WHERE o_orderstatus = 'P' GROUP BY 1),
           |spine AS (
           |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date
           |  FROM (SELECT min(date) AS lo, max(date) AS hi FROM daily)),
           |j AS (SELECT s.date, d.cents FROM spine s LEFT JOIN daily d USING (date)),
           |x AS (SELECT date, cents,
           |        last_value(cents IGNORE NULLS) OVER
           |          (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
           |        last_value(CASE WHEN cents IS NOT NULL THEN date END IGNORE NULLS) OVER
           |          (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
           |        first_value(cents IGNORE NULLS) OVER
           |          (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
           |        first_value(CASE WHEN cents IS NOT NULL THEN date END IGNORE NULLS) OVER
           |          (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           |      FROM j)
           |SELECT date,
           |       CAST(CASE WHEN cents IS NOT NULL THEN cents
           |                 WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
           |                   pc + ((nc - pc) * date_diff('day', pd, date))
           |                        // date_diff('day', pd, nd)
           |                 ELSE COALESCE(pc, nc) END AS BIGINT) AS filled_cents,
           |       cents IS NULL AS is_interpolated
           |FROM x ORDER BY date""".stripMargin))

  /** Q19 — l-diversity + t-closeness audit: the two privacy measures
    * k-anonymity (q8/q9) cannot see. A group can be ≥k yet reveal its
    * members' sensitive value when the group is HOMOGENEOUS (no
    * diversity) or merely SKEWED toward one value (close to no other
    * group looks like it). Per released quasi-identifier group
    * (region, segment — q8's level-2 lattice), over the ordinal
    * sensitive attribute (account-balance band):
    *  - distinct l-diversity: #distinct bands in the group (flag < 3);
    *  - t-closeness: Earth Mover's Distance between the group's band
    *    distribution and the global one, under the ordered-category
    *    ground distance (flag > 0.2).
    *
    * EMD exactness: for ordinal categories, EMD = Σᵢ |Pᵢ−Qᵢ| cumulative
    * / (m−1). Every cumulative difference is kept as the INTEGER
    * N·Cᵢ − n·Gᵢ (group size n, corpus N, cumulative counts C/G), so the
    * only FP op is the final basis-point division — bit-identical in
    * both engines. The zero-cell problem (a band absent from a group
    * still advances the global cumulative) is solved by evaluating on
    * the full group×band grid — O(groups·bands), group-bounded, never
    * row-scaled.
    */
  val q19LDiversityTCloseness = QueryDef(
    "q19_l_diversity_t_closeness",
    "per-QI-group distinct l-diversity + ordinal-EMD t-closeness vs global",
    (s, d) => {
      val joined = graft.PlanCache.checkpointed(s, s"q8-joined:$d") {
        Tables.load(s, d, "customer")
          .join(broadcast(Tables.load(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.load(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_name").as("nation"), col("r_name").as("region"),
            col("c_mktsegment").as("segment"),
            floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      }
      val cells = joined.groupBy("region", "segment", "bal_band")
        .agg(count(lit(1)).as("c"))
      val groups = cells.groupBy("region", "segment")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("l_distinct"))
      val glob = cells.groupBy("bal_band").agg(sum(col("c")).as("g"))
      val wB = org.apache.spark.sql.expressions.Window.orderBy("bal_band")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val bands = glob
        .withColumn("gcum", sum(col("g")).over(wB))
        .crossJoin(broadcast(glob.agg(sum(col("g")).as("nn"),
          count(lit(1)).as("m"))))
        .select(col("bal_band"), col("gcum"), col("nn"), col("m"))
      val grid = groups.crossJoin(broadcast(bands))
        .join(cells, Seq("region", "segment", "bal_band"), "left")
        .na.fill(0L, Seq("c"))
      val wG = org.apache.spark.sql.expressions.Window
        .partitionBy("region", "segment").orderBy("bal_band")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid
        .withColumn("ccum", sum(col("c")).over(wG))
        .withColumn("diff", abs(col("nn") * col("ccum") - col("n") * col("gcum")))
        .groupBy("region", "segment")
        .agg(max(col("n")).as("n"), sum(col("diff")).as("sum_d"),
          max(col("nn")).as("nn"), max(col("m")).as("m"))
        .join(groups.select(col("region"), col("segment"),
          col("l_distinct")), Seq("region", "segment"))
        .select(col("region"), col("segment"), col("n"), col("l_distinct"),
          (col("l_distinct") >= 3).as("meets_l3"),
          expr("(sum_d * 10000L) div (n * nn * (m - 1))").as("emd_bp"))
        .withColumn("meets_t02", col("emd_bp") <= 2000)
        .orderBy("region", "segment")
    },
    Some("""WITH j AS (
           |  SELECT r_name AS region, c_mktsegment AS segment,
           |         CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band
           |  FROM customer
           |  JOIN nation ON c_nationkey = n_nationkey
           |  JOIN region ON n_regionkey = r_regionkey),
           |cells AS (SELECT region, segment, bal_band,
           |                 CAST(count(*) AS BIGINT) AS c
           |          FROM j GROUP BY 1, 2, 3),
           |groups AS (SELECT region, segment, CAST(sum(c) AS BIGINT) AS n,
           |                  CAST(count(*) AS BIGINT) AS l_distinct
           |           FROM cells GROUP BY 1, 2),
           |gdist AS (SELECT bal_band, CAST(sum(c) AS BIGINT) AS g
           |          FROM cells GROUP BY 1),
           |tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
           |               CAST(count(*) AS BIGINT) AS m FROM gdist),
           |bands AS (SELECT bal_band,
           |                 CAST(sum(g) OVER (ORDER BY bal_band
           |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum,
           |                 nn, m
           |          FROM gdist, tot),
           |grid AS (SELECT gr.region, gr.segment, gr.n, b.bal_band,
           |                b.gcum, b.nn, b.m, COALESCE(c.c, 0) AS c
           |         FROM groups gr CROSS JOIN bands b
           |         LEFT JOIN cells c ON c.region = gr.region
           |                          AND c.segment = gr.segment
           |                          AND c.bal_band = b.bal_band),
           |cum AS (SELECT *,
           |          CAST(sum(c) OVER (PARTITION BY region, segment
           |               ORDER BY bal_band
           |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum
           |        FROM grid),
           |agg AS (SELECT region, segment, max(n) AS n,
           |               CAST(sum(abs(nn * ccum - n * gcum)) AS BIGINT)
           |                 AS sum_d,
           |               max(nn) AS nn, max(m) AS m
           |        FROM cum GROUP BY 1, 2)
           |SELECT a.region, a.segment, a.n, g.l_distinct,
           |       g.l_distinct >= 3 AS meets_l3,
           |       CAST((a.sum_d * 10000) // (a.n * a.nn * (a.m - 1))
           |         AS BIGINT) AS emd_bp,
           |       CAST((a.sum_d * 10000) // (a.n * a.nn * (a.m - 1))
           |         AS BIGINT) <= 2000 AS meets_t02
           |FROM agg a JOIN groups g USING (region, segment)
           |ORDER BY a.region, a.segment""".stripMargin))

  /** E13 — seasonal forecast backtest: per-day-of-week mean forecasting
    * with a naive (overall-mean) baseline, scored by WAPE on a 28-day
    * holdout. The classic marts question "is revenue where the forecast
    * said it would be" reduced to its exactly-reproducible core:
    *  - split = the last 28 order-active days (row_number over the
    *    bounded calendar spine, same both engines);
    *  - forecast(d) = train-period mean revenue of d's weekday, in whole
    *    cents with floor division — a per-dow mean in exact integers;
    *  - error = weighted absolute percentage error in basis points,
    *    10000·Σ|actual−fc| div Σactual, per dow and overall, plus the
    *    naive baseline's WAPE so the seasonal lift is visible in-row.
    *
    * Everything after the decimal-cents cast is long arithmetic, so the
    * backtest hash-gates with no tolerance. Scale: one shuffle to daily
    * grain (map-side combinable), one bounded window over the calendar
    * spine, 7-row/1-row broadcast joins — at 100 TB the only corpus-sized
    * pass is the first aggregation.
    *
    * Day-of-week numbering: Spark `dayofweek` is 1=Sunday..7; DuckDB
    * `dayofweek` is 0=Sunday..6, so the oracle adds 1.
    */
  val e13SeasonalForecast = QueryDef(
    "e13_seasonal_forecast",
    "per-weekday mean revenue forecast, 28-day holdout, exact WAPE bp vs naive",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("date"))
        .agg(sum((col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long")).as("cents"))
      val idx = daily.withColumn("rk",
        row_number().over(Window.orderBy(col("date").desc)))
      val train = idx.filter(col("rk") > 28)
      val test = idx.filter(col("rk") <= 28)
      val dowStats = train.groupBy(dayofweek(col("date")).as("dow"))
        .agg(sum("cents").as("dow_cents"), count(lit(1)).as("n_train_days"))
      val overall = train.agg(
        sum("cents").as("tot_cents"), count(lit(1)).as("tot_days"))
      val scored = test
        .select(col("date"), dayofweek(col("date")).as("dow"), col("cents"))
        .join(broadcast(dowStats), "dow")
        .crossJoin(broadcast(overall))
        .withColumn("fc", expr("dow_cents DIV n_train_days"))
        .withColumn("nv", expr("tot_cents DIV tot_days"))
      val totals = scored.agg(
        sum(abs(col("cents") - col("fc"))).as("ae_s"),
        sum(abs(col("cents") - col("nv"))).as("ae_n"),
        sum(col("cents")).as("act"))
      scored.groupBy(col("dow").cast("long").as("dow"))
        .agg(
          max("n_train_days").as("n_train_days"),
          count(lit(1)).as("n_test_days"),
          max("fc").as("fc_cents_per_day"),
          sum("cents").as("actual_cents"),
          sum(abs(col("cents") - col("fc"))).as("abs_err_cents"))
        .crossJoin(broadcast(totals))
        .select(col("dow"), col("n_train_days"), col("n_test_days"),
          col("fc_cents_per_day"), col("actual_cents"), col("abs_err_cents"),
          expr("10000 * abs_err_cents DIV actual_cents").as("wape_bp_dow"),
          expr("10000 * ae_s DIV act").as("wape_bp_seasonal"),
          expr("10000 * ae_n DIV act").as("wape_bp_naive"))
        .orderBy("dow")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS date,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100
           |           AS BIGINT) AS cents
           |  FROM orders GROUP BY 1),
           |idx AS (SELECT date, cents,
           |               row_number() OVER (ORDER BY date DESC) AS rk
           |        FROM daily),
           |train AS (SELECT * FROM idx WHERE rk > 28),
           |test AS (SELECT * FROM idx WHERE rk <= 28),
           |ds AS (SELECT dayofweek(date) + 1 AS dow,
           |              CAST(sum(cents) AS BIGINT) AS dow_cents,
           |              CAST(count(*) AS BIGINT) AS n_train_days
           |       FROM train GROUP BY 1),
           |ov AS (SELECT CAST(sum(cents) AS BIGINT) AS tot_cents,
           |              CAST(count(*) AS BIGINT) AS tot_days FROM train),
           |scored AS (
           |  SELECT t.date, dayofweek(t.date) + 1 AS dow, t.cents,
           |         dow_cents // n_train_days AS fc,
           |         tot_cents // tot_days AS nv,
           |         n_train_days
           |  FROM test t JOIN ds ON dayofweek(t.date) + 1 = ds.dow
           |  CROSS JOIN ov),
           |tot AS (SELECT CAST(sum(abs(cents - fc)) AS BIGINT) AS ae_s,
           |               CAST(sum(abs(cents - nv)) AS BIGINT) AS ae_n,
           |               CAST(sum(cents) AS BIGINT) AS act
           |        FROM scored)
           |SELECT CAST(dow AS BIGINT) AS dow,
           |       max(n_train_days) AS n_train_days,
           |       CAST(count(*) AS BIGINT) AS n_test_days,
           |       CAST(max(fc) AS BIGINT) AS fc_cents_per_day,
           |       CAST(sum(cents) AS BIGINT) AS actual_cents,
           |       CAST(sum(abs(cents - fc)) AS BIGINT) AS abs_err_cents,
           |       CAST(10000 * sum(abs(cents - fc)) // sum(cents) AS BIGINT)
           |         AS wape_bp_dow,
           |       CAST(10000 * max(ae_s) // max(act) AS BIGINT)
           |         AS wape_bp_seasonal,
           |       CAST(10000 * max(ae_n) // max(act) AS BIGINT)
           |         AS wape_bp_naive
           |FROM scored CROSS JOIN tot
           |GROUP BY dow ORDER BY dow""".stripMargin))

  /** E14 — exact autocorrelation ladder on daily revenue: Pearson
    * correlation of the series with itself at CALENDAR lags 1/7/28 days
    * (pairs exist only where both dates traded — lag by date, not by
    * row, so gaps don't smear the alignment). Lag-7 dominating lag-1
    * is the weekly-seasonality fingerprint; lag-28 separates monthly
    * effects — the diagnostic that decides e13's seasonal-model grain.
    *
    * Exactness: daily cents quantize to 1e3-cent units with floor
    * division (keeps every DuckDB HUGEINT moment under 10³⁸ through
    * ~10⁵-day series at 10¹³ cents/day — and the replay overflows
    * loudly, never silently); the engine side collects the DAILY frame
    * (bounded by the CALENDAR, never the fact table — the w15
    * bounded-collect contract) and finishes in driver BigInt, exact at
    * any revenue scale. sign ∈ {-1,0,1}; r² in bp with truncating
    * division; degenerate lags (under 2 pairs or zero variance) read
    * sign 0 / r² 0.
    */
  /** The q22 core over a generic one-column `uid` (string) population —
    * exposed so the spec can plant biased populations with closed-form
    * SRM verdicts.
    */
  private[analytics] def srmOf(users: org.apache.spark.sql.DataFrame,
      salt: String): org.apache.spark.sql.DataFrame = {
    val assigned = users.select(
      when(pmod(graft.functions.CrossHash.md5u60(
        concat(col("uid"), lit("#" + salt))), lit(100L)) < 50, "A")
        .otherwise("B").as("variant"))
    val census = assigned.groupBy("variant").agg(count(lit(1)).as("n_users"))
    val stats = census.agg(
        sum(col("n_users")).as("n"),
        coalesce(sum(when(col("variant") === "A", col("n_users"))), lit(0L))
          .as("a"))
      .select(col("n"), col("a"),
        expr("""((2 * a - n) * (2 * a - n) * 10000) div greatest(n, 1)""")
          .as("chi2_1e4"))
      .select(col("n"), col("chi2_1e4"),
        (col("chi2_1e4") > 38410L).as("srm_flag")) // chi²₁ 95% = 3.841
    census.crossJoin(broadcast(stats))
      .select(col("variant"), col("n_users"),
        expr("(n_users * 10000) div n").as("share_bp"),
        (expr("(n_users * 10000) div n") - 5000L).as("dev_bp"),
        col("chi2_1e4"), col("srm_flag"))
      .orderBy("variant")
  }

  /** Q22 — A/B assignment + sample-ratio-mismatch audit: deterministic
    * 50/50 variant assignment by the engine-portable md5u60 hash (the
    * same user lands in the same variant on every engine and every
    * re-run — no state, no randomness), plus the SRM check every
    * experimentation platform runs before trusting a readout: a biased
    * split means the ASSIGNMENT or LOGGING pipeline is broken and the
    * experiment is unreadable regardless of its metrics. The χ²₁
    * statistic reduces exactly for a 2-cell 50/50 design —
    * χ² = (2a−n)²/n — so the audit is pure integer arithmetic
    * (×10⁴ fixed point, truncating) with the 95% line at 38,410.
    *
    * One scan, one 2-cell census, O(1) everything else.
    */
  val q22SrmAudit = QueryDef(
    "q22_srm_audit",
    "deterministic A/B assignment census + exact chi-square sample-ratio-mismatch audit",
    (s, d) => srmOf(Tables.load(s, d, "customer")
      .select(col("c_custkey").cast("string").as("uid")), "exp1"),
    Some("""WITH assigned AS (
           |  SELECT CASE WHEN CAST(md5_number_lower(
           |             CAST(c_custkey AS VARCHAR) || '#exp1') >> 4 AS BIGINT)
           |             % 100 < 50
           |         THEN 'A' ELSE 'B' END AS variant
           |  FROM customer),
           |census AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_users
           |           FROM assigned GROUP BY 1),
           |stats AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n,
           |            CAST(COALESCE(SUM(CASE WHEN variant = 'A'
           |                  THEN n_users END), 0) AS BIGINT) AS a
           |          FROM census),
           |s2 AS (SELECT n,
           |         ((2 * a - n) * (2 * a - n) * 10000) // GREATEST(n, 1)
           |           AS chi2_1e4
           |       FROM stats)
           |SELECT c.variant, c.n_users,
           |       (c.n_users * 10000) // s2.n AS share_bp,
           |       (c.n_users * 10000) // s2.n - 5000 AS dev_bp,
           |       s2.chi2_1e4,
           |       s2.chi2_1e4 > 38410 AS srm_flag
           |FROM census c CROSS JOIN s2 ORDER BY c.variant""".stripMargin))

  /** The e14 driver fold over a (epoch_day → quantized value) series —
    * exposed for the spec's planted calendars. Returns one
    * (lag, n_pairs, sign, r2_bp) tuple per lag, exact BigInt.
    */
  private[analytics] def acfOf(series: Map[Long, Long],
      lags: Seq[Int]): Seq[(Long, Long, Long, Long)] =
    lags.map { lag =>
      val pairs = series.toSeq.collect {
        case (ed, x) if series.contains(ed + lag) => (x, series(ed + lag))
      }
      val n = BigInt(pairs.length)
      if (n < 2) (lag.toLong, n.toLong, 0L, 0L)
      else {
        val (sx, sy) = (pairs.map(p => BigInt(p._1)).sum,
          pairs.map(p => BigInt(p._2)).sum)
        val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
        val syy = pairs.map(p => BigInt(p._2) * p._2).sum
        val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
        val (cov, vx, vy) =
          (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
        if (vx == 0 || vy == 0) (lag.toLong, n.toLong, 0L, 0L)
        else (lag.toLong, n.toLong, cov.signum.toLong,
          ((cov * cov * 10000) / (vx * vy)).toLong)
      }
    }

  val e14Autocorrelation = QueryDef(
    "e14_autocorrelation",
    "exact daily-revenue autocorrelation at calendar lags 1/7/28 (sign + r² bp)",
    (s, d) => {
      val daily = graft.PlanCache.persisted(s, s"q7-daily:$d") {
        Tables.load(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("order_date"))
          .agg((sum(dec2(col("o_totalprice"))) * 100).cast("long").as("cents"))
      }
      val series = daily.select(
          datediff(col("order_date"), lit("1970-01-01")).cast("long").as("ed"),
          expr("cents div 1000").as("q"))
        .collect() // bounded by the calendar: O(days), never fact-sized
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rows = acfOf(series, Seq(1, 7, 28)).map {
        case (lag, n, sign, r2) => org.apache.spark.sql.Row(lag, n, sign, r2)
      }
      val schema = org.apache.spark.sql.types.StructType(
        Seq("lag_days", "n_pairs", "acf_sign", "acf_r2_bp").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("lag_days")
    },
    Some("""WITH daily AS (
           |  SELECT CAST(o_orderdate AS DATE) AS order_date,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
           |  FROM orders GROUP BY 1),
           |s AS (SELECT date_diff('day', DATE '1970-01-01', order_date) AS ed,
           |             cents // 1000 AS q
           |      FROM daily),
           |lags AS (SELECT CAST(l AS BIGINT) AS lag_days
           |         FROM UNNEST([1, 7, 28]) AS t(l)),
           |pairs AS (SELECT lg.lag_days, a.q AS x, b.q AS y
           |          FROM lags lg
           |          JOIN s a ON TRUE
           |          JOIN s b ON b.ed = a.ed + lg.lag_days),
           |m AS (SELECT lag_days, CAST(count(*) AS HUGEINT) AS n,
           |        CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
           |        CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
           |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
           |        CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
           |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           |      FROM pairs GROUP BY 1),
           |c AS (SELECT lag_days, n,
           |        n * sxy - sx * sy AS cov,
           |        n * sxx - sx * sx AS vx,
           |        n * syy - sy * sy AS vy
           |      FROM m)
           |SELECT lg.lag_days,
           |       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_pairs,
           |       CAST(CASE WHEN c.n IS NULL OR c.n < 2 OR c.vx = 0 OR c.vy = 0
           |                 THEN 0
           |                 WHEN c.cov > 0 THEN 1 WHEN c.cov < 0 THEN -1
           |                 ELSE 0 END AS BIGINT) AS acf_sign,
           |       CAST(CASE WHEN c.n IS NULL OR c.n < 2 OR c.vx = 0 OR c.vy = 0
           |                 THEN 0
           |                 ELSE (c.cov * c.cov * 10000) // (c.vx * c.vy)
           |            END AS BIGINT) AS acf_r2_bp
           |FROM lags lg LEFT JOIN c USING (lag_days)
           |ORDER BY lg.lag_days""".stripMargin))

  /** The e15 driver fold: `(duration, n_at_risk, n_events)` event rows
    * → Kaplan–Meier survival in 1e12 fixed point. Per-step floor with a
    * BigInt intermediate (S·(n−e) at 10¹⁰ customers overflows long; the
    * floored result always fits). Exposed for the spec's hand-computed
    * fixtures.
    */
  private[analytics] def kmFold(rows: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long, Long)] = {
    var s = BigInt(1000000000000L)
    rows.sortBy(_._1).map { case (dur, n, e) =>
      s = s * (n - e) / n // nonneg BigInt division = floor, ≡ HUGEINT //
      (dur, n, e, s.toLong)
    }
  }

  /** E15 — customer-retention survival curve: Kaplan–Meier product-limit
    * (Kaplan & Meier 1958) over customer lifetimes with right-censoring —
    * the retention analytics a warehouse team ships next to cohort KPIs,
    * and the one the naive "fraction still active after d days" gets
    * WRONG because it throws censored customers away. Churn event = no
    * order in the final 90 days of the corpus; lifetime = first→last
    * order for churned customers, first→corpus-end for censored ones
    * (they are known alive THROUGH the observation end, and the product-
    * limit uses exactly that information: they leave the risk set at
    * their censoring day without contributing an event).
    *
    * Exactness discipline: S_i = ⌊S_{i-1}·(n_i−e_i)/n_i⌋ in 1e12 units
    * (the x72 fixed-point-iteration rule — per-step floor makes the
    * chain bit-identical across engines and partitionings); the oracle
    * replays it as a recursive CTE in HUGEINT.
    *
    * Scale posture: per-customer min/max is one combinable agg; the
    * at-risk window and the driver fold run over the CALENDAR-BOUNDED
    * per-duration frame (≤ corpus span in days — the a13/e14 bounded-
    * frame precedent), never customer-sized.
    */
  val e15RetentionSurvival = QueryDef(
    "e15_retention_survival",
    "Kaplan-Meier retention curve: exact fixed-point product-limit over churn events, right-censored at corpus end",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.load(s, d, "orders")
      val mx = orders.agg(max(to_date(col("o_orderdate"))).as("mx"))
      val pc = orders.groupBy(col("o_custkey"))
        .agg(to_date(min(col("o_orderdate"))).as("f"),
          to_date(max(col("o_orderdate"))).as("l"))
        .crossJoin(broadcast(mx))
        .select(
          when(datediff(col("mx"), col("l")) > 90, 1L).otherwise(0L)
            .as("churned"),
          when(datediff(col("mx"), col("l")) > 90,
            datediff(col("l"), col("f")).cast("long"))
            .otherwise(datediff(col("mx"), col("f")).cast("long")).as("dur"))
      val perDay = pc.groupBy("dur")
        .agg(sum(col("churned")).as("ev"),
          sum(lit(1L) - col("churned")).as("cen"))
      val tot = pc.agg(count(lit(1)).as("n"))
      // unpartitioned window over the calendar-bounded per-day frame
      val w = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val events = perDay.crossJoin(broadcast(tot))
        .withColumn("n_at_risk", col("n") -
          coalesce(sum(col("ev") + col("cen")).over(w), lit(0L)))
        .filter(col("ev") > 0)
        .select("dur", "n_at_risk", "ev")
        .collect() // bounded by the calendar: O(distinct durations)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val rows = kmFold(events).map { case (dur, n, e, sv) =>
        org.apache.spark.sql.Row(dur, n, e, sv)
      }
      val schema = org.apache.spark.sql.types.StructType(
        Seq("duration_days", "n_at_risk", "n_events", "survival_1e12")
          .map(c => org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("duration_days")
    },
    Some("""WITH RECURSIVE pc AS (
           |  SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
           |         CAST(max(o_orderdate) AS DATE) AS l
           |  FROM orders GROUP BY 1),
           |mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS m FROM orders),
           |fl AS (
           |  SELECT CASE WHEN date_diff('day', l, m) > 90 THEN 1 ELSE 0 END
           |           AS churned,
           |         CAST(CASE WHEN date_diff('day', l, m) > 90
           |              THEN date_diff('day', f, l)
           |              ELSE date_diff('day', f, m) END AS BIGINT) AS dur
           |  FROM pc CROSS JOIN mx),
           |pd AS (SELECT dur, CAST(sum(churned) AS BIGINT) AS ev,
           |              CAST(sum(1 - churned) AS BIGINT) AS cen
           |       FROM fl GROUP BY 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fl),
           |ar AS MATERIALIZED (
           |  SELECT dur, ev,
           |         (SELECT n FROM tot) - CAST(coalesce(sum(ev + cen) OVER
           |           (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
           |            AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
           |  FROM pd),
           |ed AS MATERIALIZED (
           |  SELECT CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS i,
           |         dur, n_at_risk, ev
           |  FROM ar WHERE ev > 0),
           |km AS (
           |  SELECT i, dur, n_at_risk, ev,
           |         CAST(1000000000000 AS HUGEINT) * (n_at_risk - ev)
           |           // n_at_risk AS sv
           |  FROM ed WHERE i = 1
           |  UNION ALL
           |  SELECT e.i, e.dur, e.n_at_risk, e.ev,
           |         k.sv * (e.n_at_risk - e.ev) // e.n_at_risk
           |  FROM km k JOIN ed e ON e.i = k.i + 1)
           |SELECT dur AS duration_days, n_at_risk, ev AS n_events,
           |       CAST(sv AS BIGINT) AS survival_1e12
           |FROM km ORDER BY duration_days""".stripMargin))

  /** The e16 driver fold: pooled per-event-day rows
    * `(n_i, na_i, d_i, da_i)` → the log-rank statistic in scaled
    * integers. Per-day floors (quantized at 1e6) keep every term inside
    * bounded magnitudes at ANY corpus size: e6 ≤ d·10⁶, t1 ≤ d·10⁶,
    * t2 ≤ 2.5·10⁵ (the nA(n−nA)/n² ≤ ¼ bound), so v12 = t1·t2 and the
    * final (O6−E6)²·10⁴ all fit HUGEINT even at 10¹⁰ customers — the
    * reordering that makes the 128-bit oracle replay possible.
    * Returns (o_a, e_a_1e6, var_1e12, chi2_1e4).
    */
  private[analytics] def logRankFold(rows: Seq[(Long, Long, Long, Long)])
      : (Long, Long, Long, Long) = {
    var o = BigInt(0); var e6 = BigInt(0); var v12 = BigInt(0)
    rows.foreach { case (n, na, d, da) =>
      if (d > 0 && n > 0) {
        o += da
        e6 += BigInt(d) * na * 1000000L / n
        if (n > 1) {
          val t1 = BigInt(d) * (n - d) * 1000000L / (n - 1)
          val t2 = BigInt(na) * (n - na) * 1000000L / (BigInt(n) * n)
          v12 += t1 * t2
        }
      }
    }
    val diff = o * 1000000L - e6
    val chi2 = if (v12 > 0) diff * diff * 10000L / v12 else BigInt(0)
    (o.toLong, e6.toLong, v12.toLong, chi2.toLong)
  }

  /** E16 — log-rank cohort retention comparison (Mantel 1966): do two
    * customer cohorts churn at the same rate? The A/B answer e15's
    * single curve cannot give — comparing final survival points ignores
    * WHEN the curves separate; the log-rank statistic accumulates
    * observed-minus-expected events over every pooled event day with
    * the hypergeometric variance, censoring handled exactly as in e15.
    * Cohorts: BUILDING-segment customers vs the rest.
    *
    * Scale posture: one per-customer combinable agg ⋈ broadcast segment
    * map; per-group at-risk from a grp-partitioned window over the
    * calendar-bounded per-day frame; the fold runs on the driver over
    * pooled event days (bounded). χ²·10⁴ against the 3.841 critical
    * value (1 df, α=0.05), q22's convention.
    */
  val e16LogRankCohorts = QueryDef(
    "e16_logrank_cohorts",
    "log-rank test between customer cohorts: exact scaled O-E/variance fold over pooled churn days",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val orders = Tables.load(s, d, "orders")
      val mx = orders.agg(max(to_date(col("o_orderdate"))).as("mx"))
      val seg = Tables.load(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
            .as("grp"))
      val pc = orders.groupBy(col("o_custkey"))
        .agg(to_date(min(col("o_orderdate"))).as("f"),
          to_date(max(col("o_orderdate"))).as("l"))
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .crossJoin(broadcast(mx))
        .select(col("grp"),
          when(datediff(col("mx"), col("l")) > 90, 1L).otherwise(0L)
            .as("churned"),
          when(datediff(col("mx"), col("l")) > 90,
            datediff(col("l"), col("f")).cast("long"))
            .otherwise(datediff(col("mx"), col("f")).cast("long")).as("dur"))
      val pd = pc.groupBy("dur", "grp")
        .agg(sum(col("churned")).as("ev"),
          sum(lit(1L) - col("churned")).as("cen"))
      // zero-filled (day × grp) grid so the per-group cumulative window
      // sees every pooled day — calendar-bounded on both axes
      val grid = pd.select("dur").distinct()
        .crossJoin(broadcast(Seq(0L, 1L).toDF("grp")))
      val tots = pc.groupBy("grp").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("grp").orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ar = grid.join(pd, Seq("dur", "grp"), "left")
        .select(col("dur"), col("grp"),
          coalesce(col("ev"), lit(0L)).as("ev"),
          coalesce(col("cen"), lit(0L)).as("cen"))
        .join(broadcast(tots), Seq("grp"))
        .withColumn("nr", col("n") -
          coalesce(sum(col("ev") + col("cen")).over(w), lit(0L)))
      val pooled = ar.groupBy("dur")
        .agg(sum(col("nr")).as("n_i"),
          sum(when(col("grp") === 1L, col("nr")).otherwise(0L)).as("na"),
          sum(col("ev")).as("d_i"),
          sum(when(col("grp") === 1L, col("ev")).otherwise(0L)).as("da"))
        .filter(col("d_i") > 0)
        .collect() // bounded by the calendar: O(pooled event days)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      val totals = tots.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (o, e6, v12, chi2) = logRankFold(pooled)
      Seq((totals.getOrElse(1L, 0L), totals.getOrElse(0L, 0L), o, e6, v12,
        chi2, chi2 > 38410L))
        .toDF("n_cohort_a", "n_cohort_b", "o_a", "e_a_1e6", "var_1e12",
          "chi2_1e4", "curves_differ")
    },
    Some("""WITH pc AS (
           |  SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS f,
           |         CAST(max(o_orderdate) AS DATE) AS l
           |  FROM orders GROUP BY 1),
           |mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS m FROM orders),
           |seg AS (SELECT c_custkey,
           |          CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
           |            AS grp
           |        FROM customer),
           |fl AS (
           |  SELECT s.grp,
           |         CASE WHEN date_diff('day', l, m) > 90 THEN 1 ELSE 0 END
           |           AS churned,
           |         CAST(CASE WHEN date_diff('day', l, m) > 90
           |              THEN date_diff('day', f, l)
           |              ELSE date_diff('day', f, m) END AS BIGINT) AS dur
           |  FROM pc JOIN seg s ON s.c_custkey = pc.o_custkey CROSS JOIN mx),
           |pd AS (SELECT dur, grp, CAST(sum(churned) AS BIGINT) AS ev,
           |              CAST(sum(1 - churned) AS BIGINT) AS cen
           |       FROM fl GROUP BY 1, 2),
           |grid AS (SELECT d.dur, g.grp
           |         FROM (SELECT DISTINCT dur FROM pd) d
           |         CROSS JOIN (VALUES (CAST(0 AS BIGINT)),
           |                            (CAST(1 AS BIGINT))) g(grp)),
           |tots AS (SELECT grp, CAST(count(*) AS BIGINT) AS n
           |         FROM fl GROUP BY 1),
           |ar AS (
           |  SELECT g.dur, g.grp, coalesce(p.ev, 0) AS ev,
           |         t.n - CAST(coalesce(sum(coalesce(p.ev, 0) +
           |             coalesce(p.cen, 0)) OVER
           |           (PARTITION BY g.grp ORDER BY g.dur
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS BIGINT) AS nr
           |  FROM grid g LEFT JOIN pd p ON p.dur = g.dur AND p.grp = g.grp
           |       JOIN tots t ON t.grp = g.grp),
           |pooled AS MATERIALIZED (
           |  SELECT dur, CAST(sum(nr) AS BIGINT) AS n_i,
           |         CAST(sum(CASE WHEN grp = 1 THEN nr ELSE 0 END) AS BIGINT)
           |           AS na,
           |         CAST(sum(ev) AS BIGINT) AS d_i,
           |         CAST(sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
           |           AS da
           |  FROM ar GROUP BY 1),
           |terms AS (
           |  SELECT da,
           |         CAST(d_i AS HUGEINT) * na * 1000000 // n_i AS e6,
           |         CASE WHEN n_i > 1 THEN
           |           (CAST(d_i AS HUGEINT) * (n_i - d_i) * 1000000
           |              // (n_i - 1)) *
           |           (CAST(na AS HUGEINT) * (n_i - na) * 1000000
           |              // (CAST(n_i AS HUGEINT) * n_i))
           |         ELSE CAST(0 AS HUGEINT) END AS v12
           |  FROM pooled WHERE d_i > 0 AND n_i > 0),
           |agg AS (SELECT CAST(coalesce(sum(da), 0) AS HUGEINT) AS o,
           |               CAST(coalesce(sum(e6), 0) AS HUGEINT) AS e6,
           |               CAST(coalesce(sum(v12), 0) AS HUGEINT) AS v12
           |        FROM terms),
           |chi AS (SELECT o, e6, v12,
           |          CASE WHEN v12 > 0 THEN
           |            (o * 1000000 - e6) * (o * 1000000 - e6) * 10000 // v12
           |          ELSE CAST(0 AS HUGEINT) END AS chi2
           |        FROM agg)
           |SELECT
           |  (SELECT n FROM tots WHERE grp = 1) AS n_cohort_a,
           |  (SELECT n FROM tots WHERE grp = 0) AS n_cohort_b,
           |  CAST(o AS BIGINT) AS o_a, CAST(e6 AS BIGINT) AS e_a_1e6,
           |  CAST(v12 AS BIGINT) AS var_1e12,
           |  CAST(chi2 AS BIGINT) AS chi2_1e4,
           |  chi2 > 38410 AS curves_differ
           |FROM chi""".stripMargin))

  val defs: Seq[QueryDef] = Seq(e1Rollup, e2IntersectExcept,
    e3NtileCumeDist, w8MovingAvg, e4Pivot, e5Unpivot, e6Cube,
    e7GroupingSets, w9FirstLast, q7OutlierDays, q8KAnonymity,
    q9KAnonymousRelease, q10ColumnProfile, q12Pseudonymization,
    w12RfmSegments, w13WinsorizedStats, q13BenfordAudit, q14ErasureCascade, q16SchemaDrift,
    e8OrderedListagg, e11CusumChangepoint, e12CusumPerKey,
    e9RecursiveMonthSpine, e10GapFill, w11SessionPaths,
    st1SessionsBatch, st10SessionWindow, q19LDiversityTCloseness,
    e13SeasonalForecast, e14Autocorrelation, q22SrmAudit,
    e15RetentionSurvival, e16LogRankCohorts)
}
