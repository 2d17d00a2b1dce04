package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST11 — streaming distribution-drift monitor: the q6 batch audit
  * (`q6_distribution_drift`) as a LIVE quality gate over an ingest
  * stream.
  *
  * A static baseline — bin counts from the trusted early corpus, with
  * the value bounds that define the binning — is computed once and
  * broadcast. Incoming values bucketize with the SAME integer bin rule
  * (min/max from the baseline only, so bins never move as data arrives),
  * and a streaming aggregation maintains the running per-bin count in
  * update mode. Each trigger appends the updated groups via the
  * mergeable-sink pattern ([[StreamingAggs.appendPartials]]); the serve
  * side merges latest-per-bin and joins the baseline to emit basis-point
  * drift per bin.
  *
  * This is q6 recomputed continuously WITHOUT rescanning history: the
  * running count is the history. At 100 TB/day the batch audit costs a
  * full fact scan per run; the streaming form costs each event once,
  * and the serve-side join is over ≤ 10 bins. All shares are exact
  * integer basis points (count·10000 div total) — the drift table is
  * bit-identical to the batch audit on the same data, which is exactly
  * what [[graft.streaming.DriftMonitorSpec]] pins.
  *
  * Reference anchor: the drift screen the reference runs as a batch
  * validation step (monitoring/ alert rules); re-expressed Spark-first
  * as Structured Streaming + broadcast baseline.
  */
object DriftMonitor {

  /** The q6 bin rule: 10 equal-width integer bins over the BASELINE's
    * [min, max], clamped at both ends so out-of-range live values land
    * in the edge bins instead of crashing or silently dropping.
    */
  def bucketize(df: DataFrame, minC: Long, maxC: Long): DataFrame =
    df.withColumn("bin",
      least(lit(9L), greatest(lit(0L),
        expr(s"((cents - ${minC}L) * 10) div ${maxC - minC + 1}L"))))

  /** Baseline from the trusted corpus: per-bin counts + total, bounds
    * taken from the data itself (they parameterize [[bucketize]] for the
    * live side too).
    */
  final case class Baseline(bins: DataFrame, total: Long, minC: Long, maxC: Long)

  def baseline(trusted: DataFrame): Baseline = {
    // one scan for bounds + total (not one each), then one for the bins
    val b = trusted.agg(min(col("cents")).as("min_c"), max(col("cents")).as("max_c"),
      count(lit(1)).as("n")).head()
    require(b.getLong(2) > 0,
      "drift baseline is empty: the trusted window matched no rows")
    val (minC, maxC) = (b.getLong(0), b.getLong(1))
    val bins = bucketize(trusted, minC, maxC)
      .groupBy("bin").agg(count(lit(1)).as("n_early"))
    Baseline(bins, b.getLong(2), minC, maxC)
  }

  /** The streaming side: running per-bin counts of the live values, to
    * run in update mode (cumulative group values re-emitted per trigger —
    * pair with [[StreamingAggs.appendPartials]] +
    * [[StreamingAggs.mergeOnRead]] on the serve side).
    */
  def binCounts(stream: DataFrame, base: Baseline): DataFrame =
    bucketize(stream, base.minC, base.maxC)
      .groupBy("bin").agg(count(lit(1)).as("n_late"))

  /** Serve-side drift table: merged live counts vs the baseline, exact
    * basis points, one row per bin present on either side. Matches the
    * q6 batch audit column-for-column.
    */
  def drift(spark: SparkSession, served: DataFrame, base: Baseline): DataFrame = {
    val t = served.agg(coalesce(sum(col("n_late")), lit(0L)).as("t_late")).head().getLong(0)
    served.join(base.bins, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
      .withColumn("early_bp", expr(s"(n_early * 10000) div ${base.total}L"))
      .withColumn("late_bp", expr(s"(n_late * 10000) div ${math.max(t, 1L)}L"))
      .withColumn("drift_bp", abs(col("early_bp") - col("late_bp")))
      .orderBy("bin")
  }
}
