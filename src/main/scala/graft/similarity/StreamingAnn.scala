package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ST15 — streaming ANN serving: a query-vector stream answered from the
  * persisted IVF index, micro-batch by micro-batch. This is the online
  * half of the retrieval split the index already supports offline —
  * [[Ivf.buildIndex]]/[[Ivf.save]] is the (expensive, schedulable)
  * training path, [[Ivf.append]] the growth path, and this class the
  * serving path: each micro-batch of arriving queries probes the same
  * `partitionBy(cid)` list layout with [[Ivf.topK]], so a probe touches
  * only its `nprobe` list directories regardless of index size.
  *
  * Snapshot semantics, deliberately mirroring
  * [[graft.streaming.RefreshingDimension]]: the index handle (lists +
  * centroids) reloads at most once per TTL. A loaded parquet frame pins
  * its file listing at load time, so between reloads every batch serves
  * from ONE immutable index snapshot — vectors added via [[Ivf.append]]
  * become query-visible at the next TTL expiry, never mid-snapshot
  * (ragged results from a half-seen append cannot happen). Serving is
  * stateless per batch — no streaming state store — and the sink is
  * replay-idempotent: each batch overwrites its own `batch_id=<id>`
  * directory, so a foreachBatch re-delivery after restart replaces
  * rather than duplicates ([[writeBatch]]).
  *
  * Scale posture: the centroid table (k rows) broadcasts inside
  * [[Ivf.topK]]; the batch×list join is an equi-join on `cid`; per-batch
  * cost is O(batch · nprobe · list) — independent of stream history.
  */
final class StreamingAnn(
    indexDir: String,
    ttlMs: Long,
    nprobe: Int = 2,
    k: Int = 5,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[((DataFrame, DataFrame), Long)] = None
  @volatile private var loads: Long = 0L

  /** Times the index was (re)loaded — snapshot/TTL observability. */
  def loadCount: Long = loads

  /** The current index snapshot, reloading if older than the TTL. */
  private def current(spark: SparkSession): (DataFrame, DataFrame) =
    synchronized {
      val now = clock()
      snapshot match {
        case Some((idx, at)) if now - at < ttlMs => idx
        case _ =>
          val fresh = Ivf.load(spark, indexDir)
          loads += 1
          snapshot = Some((fresh, now))
          fresh
      }
    }

  /** Serve one (micro-)batch of queries `(vec_id, embedding)` → top-k
    * rows `(q_id, vec_id, cos_sim, rk)` against the freshest snapshot.
    */
  def serveBatch(batch: DataFrame): DataFrame = {
    val (index, cents) = current(batch.sparkSession)
    Ivf.topK(index, cents, batch, nprobe, k)
  }

  /** Serve + persist one batch into `outDir/batch_id=<id>` with
    * OVERWRITE: foreachBatch can re-deliver a batch id after a restart,
    * and a plain append would duplicate that batch's result rows — the
    * per-batch-directory overwrite makes replay idempotent (the retried
    * batch replaces itself). Reading `outDir` discovers `batch_id` as a
    * partition column.
    */
  def writeBatch(batch: DataFrame, id: Long, outDir: String): Unit =
    serveBatch(batch).write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

  /** Wire a streaming query frame through per-batch serving into a
    * partitioned result log (`q_id, vec_id, cos_sim, rk` + `batch_id`
    * partition).
    */
  def start(queries: DataFrame, outDir: String, checkpointDir: String,
      triggerMs: Long = 500): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(batch, id, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()
}
