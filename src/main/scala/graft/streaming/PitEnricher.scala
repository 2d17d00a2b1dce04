package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST33 — streaming point-in-time SCD2 enrichment: cdc4's temporal
  * lookup at the door. Each arriving fact (a probe `(id, probe_lsn)` —
  * an event carrying the dimension key and its position on the change
  * log) is joined to the dimension version that was valid AT that LSN;
  * probes before the key's birth or after its delete MISS (null
  * attributes), never fall forward or serve stale versions. This is the
  * feature-store serving rule: enriching a training fact with any other
  * version leaks the future into the example.
  *
  * Discipline: the SCD2 version frame (cdc3's `[from, to)` intervals) is
  * FROZEN at fit time — a live batch never re-derives the dimension
  * (the StreamingRetrieval frozen-corpus rule; a refresh is a new
  * `fit`, exactly like [[RefreshingDimension]]'s TTL swap). Verdicts
  * depend only on (probe, frozen intervals), so the operator is
  * stateless per batch: batch-split invariance and replay idempotence
  * are exact, and the per-batch-dir overwrite sink makes a checkpoint
  * replay a no-op.
  *
  * Scale posture: an EQUI-join on the dimension key with the interval
  * test as residual — per-key candidate set is that key's version
  * count, at most one version matches, output = probe count. Identical
  * to batch cdc4 by construction (and pinned row-for-row in the spec).
  */
object PitEnricher {

  /** Frozen SCD2 intervals (vid, status, price, vfrom, vto, version_no). */
  final case class Index(versions: DataFrame)

  /** Freeze + persist a version frame shaped like
    * [[graft.cdc.CdcQueries.scd2Versions]]'s output.
    */
  def fit(scd2: DataFrame): Index = {
    val v = scd2.select(
      col("id").as("vid"), col("status"),
      col("total_price").cast("double").as("price"),
      col("__source_lsn").as("vfrom"), col("next_lsn").as("vto"),
      col("version_no")).persist()
    v.count()
    Index(v)
  }

  def release(idx: Index): Unit = { idx.versions.unpersist(); () }

  /** Enrich a (micro-)batch of probes (id, probe_lsn): one output row
    * per probe — (id, probe_lsn, status, price, version_no), attributes
    * null on a temporal miss.
    */
  def enrich(probes: DataFrame, idx: Index): DataFrame =
    probes.join(idx.versions,
        col("id") === col("vid") && col("vfrom") <= col("probe_lsn") &&
          (col("vto").isNull || col("probe_lsn") < col("vto")),
        "left")
      .select(col("id"), col("probe_lsn"), col("status"), col("price"),
        col("version_no"))

  /** Live drive: enrich each micro-batch against the frozen index into
    * per-batch overwrite dirs (replay-idempotent).
    */
  def start(probes: DataFrame, idx: Index, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    probes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        enrich(b, idx).write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$id")
      }
      .start()
}
