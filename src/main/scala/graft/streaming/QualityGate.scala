package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-in-the-loop STREAMING curation: score every arriving document
  * with the t28-style learned quality model (curated-vs-background
  * token-rate contrast, [[graft.text.TextQueries.qualityWeights]]) and
  * gate accept/reject — the live form of the batch x25/x29 curation
  * gates, with a LEARNED signal instead of hand-written rules.
  *
  * Scale/streaming posture:
  *  - Scoring is a PER-ROW expression — `aggregate(tokens, Σ w[tok])`
  *    over a literal map of the model — so the scoring stage is
  *    shuffle-free and stateless: it composes into any micro-batch plan
  *    (including `foreachBatch` sinks) without widening state or adding
  *    an exchange, and the same column works on a static frame.
  *  - The model snapshot is TTL-refreshed at most once per TTL (same
  *    contract as [[RefreshingDimension]]): retraining happens on the
  *    driver path at refresh time, micro-batches in between reuse the
  *    materialized map.
  *  - The map is capped to the `topM` weights by |w_ppm| (deterministic
  *    tie-break on token) — the model stays bounded no matter how large
  *    the training vocabulary grows; dropped tail tokens score 0, which
  *    is exact for any token whose |weight| ranks below the cap.
  *  - Scores are exact integer ppm sums with ONE final double division —
  *    identical to the batch t28 definition, so stream ≡ batch is an
  *    equality, not a tolerance ([[graft.text.QualityGateSpec]]).
  */
final class QualityGate(
    train: SparkSession => DataFrame, // (tok, w_ppm)
    ttlMs: Long,
    topM: Int = 10000,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[(Map[String, Long], Long)] = None
  @volatile private var trains: Long = 0L

  /** Times the trainer ran (observability/tests). */
  def trainCount: Long = trains

  /** Current model map, retraining if older than the TTL. The collect is
    * bounded by `topM` (never vocabulary-sized) — the same
    * bounded-metadata contract as the other driver-side model pulls.
    */
  def currentModel(spark: SparkSession): Map[String, Long] = synchronized {
    val now = clock()
    snapshot match {
      case Some((m, at)) if now - at < ttlMs => m
      case _ =>
        val m = train(spark)
          .orderBy(abs(col("w_ppm")).desc, col("tok"))
          .limit(topM)
          .collect()
          .map(r => r.getString(0) -> r.getLong(1))
          .toMap
        trains += 1
        snapshot = Some((m, now))
        m
    }
  }

  /** Score a (micro-)batch of documents: adds exact `wsum`/`n_toks`, the
    * `score_ppm` double, and the `accepted` verdict (score > 0 ⇔ the
    * doc's unigram profile sits closer to the curated centroid). Pure
    * column expressions — no shuffle, no state.
    */
  def score(batch: DataFrame): DataFrame = {
    val model = typedLit(currentModel(batch.sparkSession))
    val toks = split(col("text"), " ")
    batch
      .withColumn("n_toks", size(toks).cast("long"))
      .withColumn("wsum",
        aggregate(toks, lit(0L),
          (acc, t) => acc + coalesce(element_at(model, t), lit(0L))))
      .withColumn("score_ppm",
        col("wsum").cast("double") / col("n_toks"))
      .withColumn("accepted", col("wsum") > 0)
  }

  /** The gate: (accepted docs, rejected docs) — route the reject side to
    * a quarantine sink, as the DLQ split does for malformed events.
    */
  def route(batch: DataFrame): (DataFrame, DataFrame) = {
    val scored = score(batch)
    (scored.filter(col("accepted")), scored.filter(!col("accepted")))
  }
}
