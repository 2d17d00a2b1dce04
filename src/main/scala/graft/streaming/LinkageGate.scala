package graft.streaming

import graft.dedup.LinkageQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST22 — streaming record linkage: the x63 entity-resolution operator
  * as a LIVE gate — each arriving record (a new signup, a CRM import
  * row) resolved against a FROZEN reference index before it is allowed
  * to mint a new entity id. The production question batch x63 audits
  * retrospectively ("how many duplicates did we accumulate?") asked at
  * the door instead ("is this record someone we already know?").
  *
  * Discipline: the reference index — records exploded under BOTH
  * blocking keys (name prefix ∪ nation/balance band, x63's passes),
  * df-capped the same way, persisted — is built once at fit time; a
  * live batch never re-indexes the reference (StreamingRetrieval's
  * frozen-corpus rule). Per micro-batch the arriving records explode
  * under the same two keys, equi-join the index, score with the SAME
  * [[LinkageQueries.scoreOf]] expression as batch x63, and keep the
  * best candidate per arrival (max score, smallest reference id on
  * ties — a deterministic argmax via struct max, no window). Stateless
  * per batch: verdicts depend only on (record, frozen index), so
  * replay and batch-split invariance are exact, which
  * [[graft.streaming.LinkageGateSpec]] pins.
  *
  * Scale posture: candidates per arrival are bounded by its two blocks
  * (df-capped); the index join is a shuffle/broadcast equi-join on the
  * block key — never all-pairs of (arrivals × reference); score is a
  * codegen'd per-row expression.
  */
object LinkageGate {

  /** Frozen reference index: records under both block keys, capped. */
  final case class Index(byKey: DataFrame)

  private def keyed(recs: DataFrame): DataFrame =
    recs.withColumn("bkey", LinkageQueries.nameKey)
      .unionByName(recs.withColumn("bkey", LinkageQueries.bandKey))

  /** Build + persist the index from reference records
    * (rid, name, nat, bal_c, seg). Blocks over the x63 cap are dropped
    * (broadcast anti-join) — an over-cap block is exact dedup's job.
    */
  def fit(reference: DataFrame): Index = {
    val k = keyed(reference)
    val hot = k.groupBy("bkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > LinkageQueries.BLOCK_CAP).select("bkey")
    val idx = k.join(broadcast(hot), Seq("bkey"), "left_anti")
      .select(col("bkey"), col("rid").as("rid_ref"),
        col("name").as("name_ref"), col("nat").as("nat_ref"),
        col("bal_c").as("bal_c_ref"), col("seg").as("seg_ref"))
      .persist()
    idx.count()
    Index(idx)
  }

  def release(idx: Index): Unit = { idx.byKey.unpersist(); () }

  /** Resolve a (micro-)batch of arriving records (in_id, name, nat,
    * bal_c, seg) against the frozen index: one row per arrival —
    * (in_id, best_ref, best_score, verdict) with verdict ∈
    * match / possible / new (x63's thresholds; no candidate = new,
    * best_ref = -1).
    */
  def resolve(incoming: DataFrame, idx: Index): DataFrame = {
    val inK = keyed(incoming.select(col("in_id"), col("name"), col("nat"),
        col("bal_c"), col("seg")))
      .select(col("bkey"), col("in_id"), col("name").as("name_in"),
        col("nat").as("nat_in"), col("bal_c").as("bal_c_in"),
        col("seg").as("seg_in"))
    val scored = inK.join(idx.byKey, "bkey")
      .select(col("in_id"),
        LinkageQueries.scoreOf("in", "ref").as("score"), col("rid_ref"))
      // the same (arrival, reference) pair can surface via both blocks;
      // the argmax below is duplicate-insensitive (same score both times)
      .groupBy("in_id")
      .agg(max(struct(col("score"), (-col("rid_ref")).as("nrid")))
        .as("best"))
      .select(col("in_id"), col("best.score").as("best_score"),
        (-col("best.nrid")).as("best_ref"))
    incoming.select(col("in_id")).distinct()
      .join(scored, Seq("in_id"), "left")
      .withColumn("best_ref", coalesce(col("best_ref"), lit(-1L)))
      .withColumn("best_score", coalesce(col("best_score"), lit(-1000L)))
      .withColumn("verdict",
        when(col("best_score") >= 30, "match")
          .when(col("best_score") >= 10, "possible")
          .otherwise(lit("new")))
      .select("in_id", "best_ref", "best_score", "verdict")
  }

  /** Wire as a foreachBatch stage: per micro-batch, resolve and append
    * verdicts to `outDir` keyed by batch id (replay-idempotent per-batch
    * dirs, the StreamingAnn sink discipline).
    */
  def start(incoming: DataFrame, idx: Index, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        resolve(b, idx).write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$id")
      }
      .start()
}
