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
  * No DuckDB oracle (sketch binaries are engine-specific) — the driver
  * records a rows-level check, and `SketchSemanticsSpec` asserts the merge
  * property and accuracy against exact counts.
  */
object SketchQueries {

  /** X8 — per-day user sketches unioned to one overall estimate, with the
    * exact count carried alongside for error measurement.
    */
  val x8HllMergeable = QueryDef(
    "x8_hll_mergeable",
    "daily HLL user sketches -> union -> overall estimate vs exact",
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val daily = ev
        .groupBy(to_date(col("ts")).as("date"))
        .agg(
          hll_sketch_agg(col("user_id")).as("user_sketch"),
          countDistinct(col("user_id")).as("exact_daily"))
      daily.agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("merged_estimate"),
        sum(col("exact_daily")).as("sum_daily_exact"))
    },
    oracle = None)

  val defs: Seq[QueryDef] = Seq(x8HllMergeable)
}
