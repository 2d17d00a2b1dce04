package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST38 — streaming exposure/SRM monitor: the live form of the q22
  * experiment audit. Sample-ratio mismatch is a LOGGING failure — one
  * arm's exposures silently drop — and every hour it runs unnoticed is
  * an hour of unreadable experiment; the monitor keeps the running
  * per-variant exposure census as data arrives and raises the alarm the
  * batch audit would only catch at readout time.
  *
  * Bounded state, the [[CalibrationMonitor]] discipline: exposures are
  * assigned their variant by the same engine-portable md5u60 hash the
  * batch q22 uses (per-row expression, shuffle-free, stateless — the
  * SAME user lands in the SAME variant in the gate, the monitor, and
  * the batch audit), per-variant running counts are an update-mode
  * aggregation with O(variants) state, and the serve side merges the
  * latest counters and computes the exact 2-cell χ² —
  * (2a−n)²·10⁴ div n, 95% line 38,410 — in plain longs.
  *
  * DEDUPLICATION IS THE CALLER'S CONTRACT: SRM is defined over unique
  * units, so feed the monitor through the dedup gate (ST5/ST11) if the
  * exposure stream can repeat users; the monitor itself counts rows.
  *
  * [[graft.streaming.ExposureMonitorSpec]] pins stream ≡ batch census
  * equality, chunking invariance, the monitor ≡ q22 verdict on the same
  * population, and a planted one-arm-drop alarm.
  */
object ExposureMonitor {

  /** (variant) projection of a `uid` (string) exposure frame — streaming
    * and batch sides share this single definition, and it is exactly the
    * q22 assignment, so gate/monitor/audit can never disagree.
    */
  def assigned(df: DataFrame, salt: String): DataFrame =
    df.select(
      when(pmod(graft.functions.CrossHash.md5u60(
        concat(col("uid"), lit("#" + salt))), lit(100L)) < 50, "A")
        .otherwise("B").as("variant"))

  /** Update-mode running exposure census: pair with
    * [[StreamingAggs.appendPartials]] + [[StreamingAggs.mergeOnRead]]
    * (key = variant) on the serve side.
    */
  def census(stream: DataFrame, salt: String): DataFrame =
    assigned(stream, salt).groupBy("variant")
      .agg(count(lit(1)).as("n_users"))

  /** SRM verdict from a merged (variant, n_users) census:
    * (n_a, n_b, chi2_1e4, alarm). Exact integer χ²₁ for the 2-cell
    * 50/50 design; degenerate empty censuses read 0 with no alarm.
    */
  def verdict(census: DataFrame, line1e4: Long = 38410L)
      : (Long, Long, Long, Boolean) = {
    val cells = census.select("variant", "n_users")
      .collect() // bounded: one row per variant
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = cells.getOrElse("A", 0L)
    val b = cells.getOrElse("B", 0L)
    val n = a + b
    if (n == 0) (0L, 0L, 0L, false)
    else {
      val d = BigInt(2 * a - n)
      val chi2 = (d * d * 10000 / n).toLong
      (a, b, chi2, chi2 > line1e4)
    }
  }
}
