package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST20 — STREAMING DSIR importance gating: the live form of the x55
  * selection, completing the family (x55 batch census, x58 fixed-quota,
  * ST20 online). Every arriving document is scored with the frozen
  * target-vs-raw hashed-ngram model and routed by the importance-ratio
  * rule (`w > 0` ⇔ the doc looks more like the curated target than like
  * the raw pool) — the filter a 100 TB ingest runs so off-target text
  * never lands in the training corpus.
  *
  * Scale/streaming posture (the [[QualityGate]] discipline, with one
  * crucial upgrade): the scoring map is [[graft.text.CurationQueries.dsirModel]]'s
  * B = 256 rows — bounded BY CONSTRUCTION (a hashed feature space,
  * not a vocabulary), so the driver pull is 256 longs and needs no
  * top-M cap. Scoring is a pure per-row expression — tokens ∪ bigrams
  * via array ops, bucket via the portable md5 expression, weight sum
  * via `aggregate` over the literal map — shuffle-free and stateless,
  * so it composes into any micro-batch plan. Model retrains at most
  * once per TTL; batches in between score against one frozen snapshot.
  * Scores are exact integers: stream ≡ batch x55 is an equality.
  */
final class DsirGate(
    train: SparkSession => DataFrame, // (b, wt) — exactly B rows
    ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  @volatile private var snapshot: Option[(Map[Long, Long], Long)] = None
  @volatile private var trains: Long = 0L

  /** Times the trainer ran (observability/tests). */
  def trainCount: Long = trains

  /** Current model map, retraining if older than the TTL. The collect
    * is exactly B = 256 rows — bounded metadata, never corpus-shaped.
    */
  def currentModel(spark: SparkSession): Map[Long, Long] = synchronized {
    val now = clock()
    snapshot match {
      case Some((m, at)) if now - at < ttlMs => m
      case _ =>
        val m = train(spark).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        trains += 1
        snapshot = Some((m, now))
        m
    }
  }

  /** Score a (micro-)batch of documents: adds the exact `w_doc`
    * importance weight and the `selected` verdict — per-row expressions
    * only, identical math to the batch x55.
    */
  def score(batch: DataFrame): DataFrame = {
    graft.GraftExtensions.ensure(batch.sparkSession)
    val model = typedLit(currentModel(batch.sparkSession))
    val toks = split(col("text"), " ")
    // unigrams ∪ bigrams as one array, then fold weights over it
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    def wOf(f: Column): Column = coalesce(
      element_at(model,
        pmod(call_function("graft_md5u60", f),
          lit(graft.text.CurationQueries.DSIR_BUCKETS))),
      lit(0L))
    batch
      .withColumn("w_doc",
        aggregate(concat(toks, bigrams), lit(0L), (acc, f) => acc + wOf(f)))
      .withColumn("selected", col("w_doc") > 0)
  }

  /** The gate: (selected docs, rejected docs). */
  def route(batch: DataFrame): (DataFrame, DataFrame) = {
    val scored = score(batch)
    (scored.filter(col("selected")), scored.filter(!col("selected")))
  }
}
