package graft.streaming

import graft.operators.BloomPrune
import graft.operators.BloomPrune.BloomModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST27 — streaming existence prefilter: route arriving events by
  * whether their key CAN exist in a large reference set (registered
  * users, known devices, live order keys) WITHOUT joining the reference
  * per micro-batch — the streaming face of
  * [[graft.operators.BloomPrune]].
  *
  * Contract (the Bloom asymmetry, made routing semantics):
  *  - `unknown` side is EXACT: no false negatives ⇒ a row routed
  *    unknown is CERTAINLY absent from the reference snapshot. This is
  *    the side you can act on unconditionally (fraud alert, DLQ,
  *    cold-start path).
  *  - `maybeKnown` side carries ≈fpr false positives: it is a
  *    PREFILTER, not a verdict — downstream either tolerates (metrics)
  *    or confirms with the real join, now over a fraction of the
  *    stream.
  *
  * Freeze discipline (QualityGate/RefreshingDimension contract): the
  * filter is fit from the reference AT MOST once per TTL — the driver
  * pull is m/64 longs BY CONSTRUCTION regardless of reference size, so
  * refresh cost never grows with the dimension. Between refreshes every
  * batch probes ONE immutable literal array — stateless, shuffle-free,
  * split-invariant, replay-idempotent.
  *
  * Sizing at scale: the literal-array probe holds comfortably to
  * m = 2²⁷ (16 MiB of longs, fpr < 1% at ~10⁷ keys with k = 4); a
  * 10⁹-key reference needs the probe-side array shipped as a broadcast
  * rather than a plan literal — same bits, different transport — which
  * is a `fit`-compatible extension, not a semantics change.
  */
final class BloomGate(
    reference: SparkSession => DataFrame,
    keyCol: String,
    ttlMs: Long,
    mBits: Int = 1 << 20,
    k: Int = 4,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[(BloomModel, Long)] = None
  @volatile private var fits: Long = 0L

  /** Times the reference was re-scanned (observability/tests). */
  def fitCount: Long = fits

  /** Current filter, refit if older than the TTL. */
  def currentModel(spark: SparkSession): BloomModel = synchronized {
    val now = clock()
    snapshot match {
      case Some((m, at)) if now - at < ttlMs => m
      case _ =>
        val m = BloomPrune.fit(reference(spark), col(keyCol), mBits, k)
        fits += 1
        snapshot = Some((m, now))
        m
    }
  }

  /** Adds `maybe_known` (true = possibly in the reference; false =
    * certainly not). Pure expression — composes into any batch plan. */
  def flag(batch: DataFrame, batchKeyCol: String): DataFrame =
    batch.withColumn("maybe_known",
      BloomPrune.mightContain(currentModel(batch.sparkSession),
        col(batchKeyCol)))

  /** The gate: (maybeKnown, certainlyUnknown). */
  def route(batch: DataFrame, batchKeyCol: String): (DataFrame, DataFrame) = {
    val f = flag(batch, batchKeyCol)
    (f.filter(col("maybe_known")).drop("maybe_known"),
      f.filter(!col("maybe_known")).drop("maybe_known"))
  }
}
