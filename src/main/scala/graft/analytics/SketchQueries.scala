package graft.analytics

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Re-mergeable distinct-count sketches — the engine's version of the
  * reference's ClickHouse `uniq` MVs (A7-A9) as *stored, mergeable* state:
  * per-day HLL sketches (Apache DataSketches via Spark's built-in
  * `hll_sketch_agg`) that union to any coarser grain without rescanning
  * events. This is exactly how a 100 TB deployment serves "distinct users
  * this month" from daily partials.
  *
  * Oracle interface: the sketch binary and its estimate are
  * engine-specific, so the oracle-compared columns are the ones both
  * engines CAN agree on — day count, the exact distinct total, and a
  * tolerance verdict (`within_2pct`, 1/0). DataSketches HLL is
  * deterministic on identical input, so the verdict is stable: if the
  * union path degrades (wrong merge, lossy downgrade), the verdict flips
  * and the row hash-mismatches. `SketchSemanticsSpec` keeps the
  * finer-grained merge-law and accuracy assertions.
  */
object SketchQueries {

  /** X8 — per-day user sketches (lgK=14, ~0.8% RSE) unioned to one overall
    * estimate, hash-compared to DuckDB via the exact count + tolerance
    * verdict. The 1×1 scalar join is a broadcast, not a data shuffle.
    */
  val x8HllMergeable = QueryDef(
    "x8_hll_mergeable",
    "daily HLL user sketches -> union -> estimate within 2% of exact",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val merged = ev
        .groupBy(to_date(col("ts")).as("date"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("user_sketch"))
        .agg(
          count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("user_sketch")))
            .as("merged_estimate"))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_total"))
      merged.join(exact)
        .select(
          col("n_days"),
          col("exact_total"),
          (abs(col("merged_estimate").cast("double") - col("exact_total")) <=
            col("exact_total") * lit(0.02)).cast("long").as("within_2pct"))
    },
    Some("""SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total,
           |       CAST(1 AS BIGINT) AS within_2pct
           |FROM events""".stripMargin))

  val defs: Seq[QueryDef] = Seq(x8HllMergeable)
}
