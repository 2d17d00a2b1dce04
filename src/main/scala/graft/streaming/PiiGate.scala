package graft.streaming

import graft.quality.Pii
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST26 — streaming PII scrub at the ingest door: every arriving
  * document is redacted ([[graft.quality.Pii.redact]]) and flagged
  * per detector class BEFORE it reaches any corpus sink — the privacy
  * twin of the DLQ split (T7) and the live form of t30/q17.
  *
  * Streaming posture: the scrub is a pure per-row expression chain —
  * stateless, shuffle-free, split-invariant by construction (no state
  * store, so batch boundaries cannot change a verdict, and replays are
  * idempotent given idempotent sinks). The audit wing is a standard
  * watermarked update-mode aggregation: per (window, kind) hit counts,
  * O(windows·kinds) state regardless of stream length.
  *
  * At 100 TB/day the scrub composes onto the ingest scan with zero
  * added exchanges; only the audit counts (already partial-aggregated
  * map-side) shuffle.
  */
object PiiGate {

  /** Per-class hit flags + redacted text + `had_pii`. Works identically
    * on static and streaming frames (`textCol` must exist). */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withFlags = Pii.detectors.foldLeft(df) { case (d, (kind, pat)) =>
      d.withColumn(s"hit_$kind", col(textCol).rlike(pat))
    }
    withFlags
      .withColumn("redacted", Pii.redact(col(textCol)))
      .withColumn("had_pii",
        Pii.detectors.map { case (k, _) => col(s"hit_$k") }
          .reduce(_ || _))
  }

  /** The gate: (clean originals, scrubbed offenders). Offenders carry
    * only the REDACTED text — the raw value must not cross the gate.
    * Both routes come back in the INGEST schema: the per-detector
    * `hit_*` / `had_pii` audit columns stay inside [[scrub]]/[[audit]],
    * so downstream sinks see no schema drift versus the source.
    */
  def route(df: DataFrame, textCol: String = "text"): (DataFrame, DataFrame) = {
    val s = scrub(df, textCol)
    // re-select in the source's column ORDER too — the rename would
    // otherwise leave the offenders' text column at the end
    val ingest = df.columns.map(col).toSeq
    (s.filter(!col("had_pii")).select(ingest: _*),
      s.filter(col("had_pii")).drop(textCol)
        .withColumnRenamed("redacted", textCol)
        .select(ingest: _*))
  }

  /** Audit wing: watermarked per-hour, per-detector hit counts — the
    * compliance dashboard feed. `tsCol` is an event-time timestamp. */
  def audit(df: DataFrame, tsCol: String, textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val flagged = scrub(df, textCol)
      .withWatermark(tsCol, watermark)
    val stacked = flagged.select(col(tsCol),
      explode(array(Pii.detectors.map { case (k, _) =>
        struct(lit(k).as("kind"), col(s"hit_$k").as("hit"))
      }: _*)).as("d"))
      .select(col(tsCol), col("d.kind"), col("d.hit"))
    stacked
      .groupBy(window(col(tsCol), "1 hour"), col("kind"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("n_hit"),
        count(lit(1)).as("n_docs"))
  }
}
