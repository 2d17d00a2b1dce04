package graft.lakehouse

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-gated layout queries: the Z-order operator's skipping math,
  * provable in ANSI SQL so the correctness gate covers the interleave
  * itself (ZOrderSpec covers the physical rewrite + footer stats).
  */
object LayoutQueries {

  /** Q18 — z-order skipping audit: quantifies WHY a z-ordered layout
    * prunes where a linear sort cannot. Orders are bucketized on
    * (o_custkey, order day) into 8-bit equi-width integer buckets,
    * Morton-interleaved by the real operator ([[ZOrder.zvalue]] — the
    * oracle re-derives the interleave bit-by-bit, so the curve math is
    * oracle-proven), and dealt into 64 model "files" two ways: linear
    * (sorted by custkey, then day) and z-ordered (sorted by the Morton
    * value). A file is TOUCHED by the 1996 date stripe iff its
    * [min day, max day] range intersects it — exactly the footer
    * min/max test a stats-based planner applies. The audit reports,
    * per layout: files touched, rows inside touched files, and the
    * matching-row total (identical across layouts, pinning row
    * preservation).
    *
    * Scale note: the model's file deal replays `ntile` semantics
    * EXACTLY (first `n mod 64` files take ⌈n/64⌉ rows) but with no
    * global window (the r15 verdict's scale smell): each layout range-
    * repartitions on its sort key, takes pid-local row numbers from a
    * pid-PARTITIONED window, and derives global positions through a
    * ≤P-row per-partition-count stitch (broadcast non-equi join, the
    * x70 boundary discipline) — so the widest sort in the plan is
    * per-partition. The DuckDB oracle keeps the literal `ntile`, which
    * the position formula matches row-for-row on the unique sort keys.
    * The production write path is [[ZOrder.layout]] (range repartition
    * + per-file sort); at 100 TB you run this audit on a SAMPLE or
    * directly on footer stats ([[SnapshotTable.filesStats]]), which is
    * O(files).
    */
  val q18ZOrderSkipping = QueryDef(
    "q18_zorder_skipping",
    "z-order vs linear layout: files touched by a date-stripe predicate",
    (s, d) => {
      val files = 64
      val o = Tables.load(s, d, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("day"))
      val bounds = o.agg(
        min(col("ck")).as("mnc"), max(col("ck")).as("mxc"),
        min(col("day")).as("mnd"), max(col("day")).as("mxd"),
        count(lit(1)).as("n"))
      // exact integer equi-width buckets into [0, 255] — arithmetic is
      // mirrored verbatim in the oracle so both engines bucket alike
      val b = o.crossJoin(broadcast(bounds))
        .withColumn("bx", expr("CASE WHEN mxc <= mnc THEN 0L " +
          "ELSE ((ck - mnc) * 255L) div (mxc - mnc) END"))
        .withColumn("by", expr("CASE WHEN mxd <= mnd THEN 0L " +
          "ELSE ((day - mnd) * 255L) div (mxd - mnd) END"))
        .withColumn("zval", ZOrder.zvalue(Seq(col("bx"), col("by")), 8))
      val lo = datediff(lit("1996-01-01").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      val hi = datediff(lit("1996-12-31").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      // the de-windowed ntile dealer is the SHARED [[ZOrder.ntileDeal]]
      // (range repartition + pid-local row numbers + ≤P-row boundary
      // stitch, memoized per layout + dir): the audit's footer-stats
      // model and the production exact layout ([[ZOrder.layoutExact]])
      // replay one implementation, pinned by one ZOrderSpec differential.
      // Sort keys are unique (o_orderkey tiebreak), so the dealt file
      // ids are partitioning-independent — the DuckDB oracle's literal
      // ntile matches row-for-row.
      def dealtBy(layout: String, sortCols: Seq[org.apache.spark.sql.Column]) =
        ZOrder.ntileDeal(b, sortCols, files, s"q18/deal-$layout/$d")
          .select(lit(layout).as("layout"), col("__file").as("f"), col("day"))
      val long2 = dealtBy("linear",
          Seq(col("ck"), col("day"), col("o_orderkey")))
        .unionAll(dealtBy("zorder", Seq(col("zval"), col("o_orderkey"))))
      val perFile = long2.groupBy("layout", "f").agg(
        count(lit(1)).as("rows"),
        min(col("day")).as("mnday"), max(col("day")).as("mxday"),
        sum(when(col("day").between(lo, hi), 1L).otherwise(0L))
          .as("matched"))
      perFile.groupBy("layout").agg(
        count(lit(1)).cast("long").as("n_files"),
        sum(when(col("mnday") <= hi && col("mxday") >= lo, 1L)
          .otherwise(0L)).as("files_touched"),
        sum(when(col("mnday") <= hi && col("mxday") >= lo, col("rows"))
          .otherwise(0L)).as("rows_in_touched"),
        sum(col("matched")).as("rows_matching"))
        .withColumn("touched_share",
          col("files_touched").cast("double") / col("n_files"))
        .orderBy("layout")
    },
    Some("""WITH o AS (
           |  SELECT o_orderkey,
           |         o_custkey AS ck,
           |         CAST(date_diff('day', DATE '1970-01-01',
           |              CAST(o_orderdate AS DATE)) AS BIGINT) AS day
           |  FROM orders),
           |b AS (
           |  SELECT min(ck) AS mnc, max(ck) AS mxc,
           |         min(day) AS mnd, max(day) AS mxd FROM o),
           |bk AS (
           |  SELECT o.*,
           |         CASE WHEN mxc <= mnc THEN 0
           |              ELSE ((ck - mnc) * 255) // (mxc - mnc) END AS bx,
           |         CASE WHEN mxd <= mnd THEN 0
           |              ELSE ((day - mnd) * 255) // (mxd - mnd) END AS by
           |  FROM o, b),
           |z AS (
           |  SELECT *,
           |         (((bx >> 0) & 1) << 0)  | (((by >> 0) & 1) << 1)  |
           |         (((bx >> 1) & 1) << 2)  | (((by >> 1) & 1) << 3)  |
           |         (((bx >> 2) & 1) << 4)  | (((by >> 2) & 1) << 5)  |
           |         (((bx >> 3) & 1) << 6)  | (((by >> 3) & 1) << 7)  |
           |         (((bx >> 4) & 1) << 8)  | (((by >> 4) & 1) << 9)  |
           |         (((bx >> 5) & 1) << 10) | (((by >> 5) & 1) << 11) |
           |         (((bx >> 6) & 1) << 12) | (((by >> 6) & 1) << 13) |
           |         (((bx >> 7) & 1) << 14) | (((by >> 7) & 1) << 15) AS zval
           |  FROM bk),
           |dealt AS (
           |  SELECT day,
           |         ntile(64) OVER (ORDER BY zval, o_orderkey) AS f_zorder,
           |         ntile(64) OVER (ORDER BY ck, day, o_orderkey) AS f_linear
           |  FROM z),
           |long2 AS (
           |  SELECT 'linear' AS layout, f_linear AS f, day FROM dealt
           |  UNION ALL
           |  SELECT 'zorder' AS layout, f_zorder AS f, day FROM dealt),
           |stripe AS (
           |  SELECT CAST(date_diff('day', DATE '1970-01-01',
           |              DATE '1996-01-01') AS BIGINT) AS lo,
           |         CAST(date_diff('day', DATE '1970-01-01',
           |              DATE '1996-12-31') AS BIGINT) AS hi),
           |per_file AS (
           |  SELECT layout, f, CAST(count(*) AS BIGINT) AS rows,
           |         min(day) AS mnday, max(day) AS mxday,
           |         CAST(sum(CASE WHEN day BETWEEN lo AND hi
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS matched
           |  FROM long2, stripe GROUP BY layout, f)
           |SELECT layout,
           |       CAST(count(*) AS BIGINT) AS n_files,
           |       CAST(sum(CASE WHEN mnday <= hi AND mxday >= lo
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           |       CAST(sum(CASE WHEN mnday <= hi AND mxday >= lo
           |                     THEN rows ELSE 0 END) AS BIGINT) AS rows_in_touched,
           |       CAST(sum(matched) AS BIGINT) AS rows_matching,
           |       CAST(sum(CASE WHEN mnday <= hi AND mxday >= lo
           |                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
           |         AS touched_share
           |FROM per_file, stripe
           |GROUP BY layout, lo, hi
           |ORDER BY layout""".stripMargin))

  def defs: Seq[QueryDef] = Seq(q18ZOrderSkipping)
}
