package graft.streaming

import graft.quality.{Contract, ContractRule}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST34 — streaming data-contract gate: the q20 contract compiler at the
  * door. Each micro-batch is flagged row-by-row against the declared
  * rules ([[Contract.flag]] — one projection, no aggregation, no
  * shuffle), clean rows pass through in the ingest schema, violating
  * rows land in a quarantine sink carrying the names of the rules they
  * broke plus the batch id — the dbt-test-as-circuit-breaker pattern
  * (reject bad rows at ingest instead of discovering them in the mart
  * run), same family as the DLQ split (T7/S12) and [[PiiGate]] but
  * driven by a declarative rule table rather than hand-written
  * predicates.
  *
  * Stateless per batch: verdicts depend only on (row, rules), so batch
  * splits and checkpoint replays cannot change any row's destination;
  * per-batch-dir overwrite sinks make replays no-ops. The clean side
  * carries exactly the ingest columns (the PiiGate route lesson — no
  * audit columns leaking into downstream schemas).
  */
object ContractGate {

  /** Split one (micro-)batch: (clean — ingest schema, quarantine —
    * ingest schema + `violated` array).
    */
  def route(batch: DataFrame, rules: Seq[ContractRule])
      : (DataFrame, DataFrame) = {
    val flagged = Contract.flag(batch, rules)
    val clean = flagged.filter(size(col("violated")) === 0).drop("violated")
    val quarantine = flagged.filter(size(col("violated")) > 0)
    (clean, quarantine)
  }

  /** Live drive: route each micro-batch into per-batch overwrite dirs
    * (replay-idempotent) under `outDir`/clean and `outDir`/quarantine.
    */
  def start(incoming: DataFrame, rules: Seq[ContractRule], outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val (clean, quarantine) = route(b, rules)
        clean.write.mode("overwrite")
          .parquet(s"$outDir/clean/batch_id=$id")
        quarantine.withColumn("batch_id", lit(id))
          .write.mode("overwrite")
          .parquet(s"$outDir/quarantine/batch_id=$id")
      }
      .start()
}
