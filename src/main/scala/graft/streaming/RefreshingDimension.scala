package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J5 — stream-side dimension lookup with TTL refresh: the Spark-native
  * replacement for the reference's per-executor Guava cache over JDBC
  * (`.kiro/specs/realtime-analytics-speed-layer/design.md:390-429`).
  *
  * Instead of N executors each caching 100k rows and hitting the database
  * on miss, the driver reloads the dimension at most once per TTL and the
  * enrich step is a broadcast hash join — every executor gets the same
  * consistent snapshot, misses coalesce to a default, and the stream side
  * never shuffles. Call [[enrich]] inside `foreachBatch` (or on a static
  * frame): each micro-batch picks up the freshest snapshot within TTL.
  */
final class RefreshingDimension(
    load: SparkSession => DataFrame,
    ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[(DataFrame, Long)] = None
  @volatile private var loads: Long = 0L

  /** Number of times the underlying loader ran (observability/tests). */
  def loadCount: Long = loads

  /** Current dimension snapshot, reloading if older than the TTL. */
  def current(spark: SparkSession): DataFrame = synchronized {
    val now = clock()
    snapshot match {
      case Some((df, at)) if now - at < ttlMs => df
      case prev =>
        val fresh = load(spark).persist()
        fresh.count() // materialize before swapping in
        loads += 1
        snapshot = Some((fresh, now))
        prev.foreach(_._1.unpersist())
        fresh
    }
  }

  /** Broadcast-join enrichment with default on miss. The dim key is
    * renamed before the join: `drop(dimKey)` on a shared name would drop
    * BOTH sides' columns (Dataset.drop matches by name, not reference).
    */
  def enrich(batch: DataFrame, batchKey: String, dimKey: String,
      valueCol: String, default: String): DataFrame = {
    val dim = current(batch.sparkSession)
      .select(col(dimKey).as("__dim_key"), col(valueCol))
    batch
      .join(broadcast(dim), batch(batchKey) === dim("__dim_key"), "left")
      .drop("__dim_key")
      .withColumn(valueCol, coalesce(col(valueCol), lit(default)))
  }
}
