package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** In-memory pinned materialized view, maintained incrementally from a
  * streaming aggregation's update-mode output.
  *
  * The reference serves dashboards from ClickHouse MVs whose merged state
  * is RAM-resident (`.kiro/specs/realtime-analytics-speed-layer/
  * design.md:256-303`); the disk parts exist for durability, reads never
  * wait on them. The Spark-native equivalent: `foreachBatch` hands this
  * class each trigger's partial rows (update mode re-emits the cumulative
  * value of every group the batch touched — bounded by the MV grain, e.g.
  * hour-windows × tiers, NOT by the fact volume), [[update]] merges them
  * newest-wins into a map and publishes an immutable snapshot, and the
  * serving layer reads that snapshot with zero I/O. Durability is an
  * ASYNC parquet snapshot (latest-wins, single writer thread): a slow or
  * stalled disk delays recovery-point freshness, never visibility — on
  * restart the streaming checkpoint replays state anyway, so the parquet
  * copy only serves external readers.
  *
  * Scale posture: the collect per trigger is O(groups touched), the same
  * bounded-metadata contract as Percentiles' histogram partials; the map
  * holds one row per live MV group. At 100 TB the fact stream is wide but
  * the MV grain is calendar × enum — still tiny.
  */
final class PinnedMv(keyCols: Seq[String], snapshotPath: Option[String] = None)
    extends AutoCloseable {

  @volatile private var current: Map[Seq[Any], Row] = Map.empty
  @volatile private var lastError: Option[Throwable] = None
  @volatile private var failedWrites: Int = 0
  // captured on first update: the writer thread has no thread-local
  // active session (foreachBatch runs on stream-execution threads)
  @volatile private var sess: SparkSession = null
  // latest-wins pending snapshot: the writer thread always persists the
  // newest published state; intermediate versions are skippable because
  // each snapshot is the full (tiny) MV, not a delta.
  private val pending = new java.util.concurrent.atomic.AtomicReference[Seq[Row]](null)
  @volatile private var closed = false
  private val wake = new Object
  // declared last: the thread body touches `pending`/`closed`/`wake`,
  // which must already be initialized when it starts
  private val writer = snapshotPath.map { _ =>
    val th = new Thread(() => drainSnapshots(), "pinned-mv-snapshot")
    th.setDaemon(true)
    th.start()
    th
  }

  /** Merge one micro-batch's update-mode partials (newest batch wins per
    * group — ReplacingMergeTree semantics, same contract as
    * [[StreamingAggs.mergeOnRead]]). Called from `foreachBatch`, i.e.
    * single-threaded per query; readers see the published snapshot.
    */
  def update(batch: DataFrame, batchId: Long): Unit = {
    if (sess == null) sess = batch.sparkSession
    val rows = batch.collect() // bounded by MV grain, see class doc
    if (rows.nonEmpty) {
      val merged = current ++ rows.map { r =>
        keyCols.map(c => r.get(r.fieldIndex(c)): Any) -> r
      }
      current = merged
      if (snapshotPath.isDefined) {
        pending.set(merged.values.toSeq)
        wake.synchronized(wake.notifyAll())
      }
    }
  }

  /** Current snapshot rows (immutable, zero I/O). */
  def rows: Seq[Row] = current.values.toSeq

  /** Sum of a long column over the snapshot — the dashboard point-read. */
  def sumLong(colName: String): Long =
    current.values.foldLeft(0L) { (acc, r) =>
      val i = r.fieldIndex(colName)
      acc + (if (r.isNullAt(i)) 0L else r.getLong(i))
    }

  /** Snapshot as a DataFrame (for dashboard rollups / tests). Empty-state
    * calls need a schema source, so this requires at least one update.
    */
  def toDF(spark: SparkSession): DataFrame = {
    val rs = current.values.toSeq
    require(rs.nonEmpty, "PinnedMv.toDF before any update")
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      rs.head.schema)
  }

  /** Async-writer failure count + last error: a persistently failing
    * snapshot path must be visible to callers, not swallowed (a dead
    * durability path is a real regression even while serving stays up).
    */
  def snapshotFailures: Int = failedWrites
  def snapshotError: Option[Throwable] = lastError

  private def drainSnapshots(): Unit = {
    while (!closed) {
      val batch = pending.getAndSet(null)
      if (batch == null) wake.synchronized { if (pending.get() == null && !closed) wake.wait(200) }
      else writeSnapshot(batch)
    }
    // final flush so close() leaves the newest state on disk
    val last = pending.getAndSet(null)
    if (last != null) writeSnapshot(last)
  }

  private def writeSnapshot(batch: Seq[Row]): Unit =
    try {
      val path = snapshotPath.get
      val spark = sess
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(batch).asJava),
        batch.head.schema)
        .coalesce(1).write.mode("overwrite").parquet(path)
    } catch {
      case scala.util.control.NonFatal(e) =>
        failedWrites += 1
        lastError = Some(e)
    }

  override def close(): Unit = {
    closed = true
    wake.synchronized(wake.notifyAll())
    writer.foreach(_.join(10000))
  }
}
