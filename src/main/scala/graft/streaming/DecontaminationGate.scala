package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.text.CurationQueries

/** ST18 — STREAMING eval-set decontamination: the live form of the x51
  * screen. Every arriving document is checked for a verbatim 13-gram
  * overlap with a frozen benchmark snapshot (the GPT-3/PaLM rule) and
  * routed clean/quarantine — the gate a 100 TB ingest runs so benchmark
  * text never reaches the training corpus in the first place, instead of
  * being stripped by a batch sweep after the fact.
  *
  * Scale/streaming posture:
  *  - The verdict is STATELESS per document: contamination depends only
  *    on (doc, benchmark), so no state store is needed, batch boundaries
  *    cannot change any verdict, and replay is trivially deterministic.
  *  - The benchmark gram set is a PERSISTED DISTRIBUTED frame (distinct
  *    13-grams), not a driver collect: an eval suite is benchmark-bounded
  *    but can still be millions of grams — it stays an executor-side
  *    build side (AQE broadcasts when small), never a `typedLit`.
  *    Materialized once per TTL ([[RefreshingDimension]] contract, the
  *    [[graft.similarity.StreamingAnn]] snapshot discipline): batches
  *    between refreshes judge against ONE immutable snapshot, so a
  *    benchmark update becomes visible at TTL expiry, never mid-stream.
  *  - Per batch: map-only gram fan-out + one gram-keyed left-semi join
  *    + two id-keyed joins back onto the batch — the exact x51 plan
  *    shape, batch-sized probe side.
  *  - The per-batch-directory overwrite sink makes foreachBatch replay
  *    idempotent (a re-delivered batch replaces itself).
  */
final class DecontaminationGate(
    benchmark: SparkSession => DataFrame, // (doc_id, text)
    ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[(DataFrame, Long)] = None
  @volatile private var refreshes: Long = 0L

  /** Times the benchmark gram set was (re)built — snapshot observability. */
  def refreshCount: Long = refreshes

  /** The current benchmark gram snapshot, rebuilding if older than the
    * TTL. The `count()` materializes the persisted frame NOW, pinning
    * the snapshot against later benchmark-source changes.
    */
  private def currentGrams(spark: SparkSession): DataFrame = synchronized {
    val now = clock()
    snapshot match {
      case Some((g, at)) if now - at < ttlMs => g
      case _ =>
        val fresh = CurationQueries
          .grams13(benchmark(spark), Seq("doc_id"))
          .select("g").distinct().persist()
        fresh.count()
        snapshot.foreach(_._1.unpersist())
        refreshes += 1
        snapshot = Some((fresh, now))
        fresh
    }
  }

  /** Route one (micro-)batch of documents `(doc_id, source, text, ...)`:
    * (clean, quarantined). A document is quarantined iff it shares at
    * least one verbatim 13-gram with the benchmark snapshot — exactly
    * the batch x51 / [[CurationQueries.contaminatedDocs]] rule.
    */
  def route(batch: DataFrame): (DataFrame, DataFrame) = {
    val bg = currentGrams(batch.sparkSession)
    val hits = CurationQueries.grams13(batch.select("doc_id", "text"), Seq("doc_id"))
      .join(bg, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    (batch.join(hits, Seq("doc_id"), "left_anti"),
      batch.join(hits, Seq("doc_id"), "left_semi"))
  }

  /** Route + persist one batch, idempotent on replay by per-batch-dir
    * overwrite (the [[graft.similarity.StreamingAnn.writeBatch]] rule).
    */
  def writeBatch(batch: DataFrame, id: Long, cleanDir: String,
      quarantineDir: String): Unit = {
    val (clean, dirty) = route(batch)
    clean.write.mode("overwrite").parquet(s"$cleanDir/batch_id=$id")
    dirty.write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$id")
  }

  /** Wire a streaming document frame through the gate into partitioned
    * clean/quarantine logs (`batch_id` partition discovery on read).
    */
  def start(docs: DataFrame, cleanDir: String, quarantineDir: String,
      checkpointDir: String, triggerMs: Long = 500): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, id, cleanDir, quarantineDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()
}
