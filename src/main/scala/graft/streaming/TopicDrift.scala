package graft.streaming

import graft.text.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ST16 — streaming topic-share drift monitor: the x46 topic model as a
  * LIVE distribution gate over a document ingest stream — "is today's
  * crawl drifting from the corpus mix the training recipe was designed
  * for?" asked continuously instead of per batch-audit.
  *
  * Everything learned is FROZEN at fit time from the trusted corpus and
  * broadcast: the integer idf table (a live batch must not re-derive
  * document frequencies from itself — the feature space would move),
  * the k-means centroids, and the baseline topic shares. Live documents
  * featurize against the frozen idf, assign by the same cosine argmax,
  * and per-batch topic counts append to a count log; the serve side
  * merges counts and emits exact basis-point shares vs the baseline —
  * the [[DriftMonitor]] pattern with a LEARNED binning rule (topics)
  * instead of value ranges.
  *
  * Scale posture: scoring is stateless per batch (broadcast model, no
  * state store); the count log grows one row per (batch, topic); the
  * drift table is K rows. At 100 TB/day each document is touched once.
  */
object TopicDrift {

  final case class Model(
      idf: DataFrame,
      cent: DataFrame,
      cnorm: DataFrame,
      baseCounts: DataFrame, // topic, n_base
      baseTotal: Long,
      k: Long)

  /** Learn the model from the trusted corpus `(doc_id, text)`: frozen
    * idf → hashed vectors → seed `doc_id % k` → one Lloyd round →
    * baseline topic census. All components are materialized (persisted
    * + counted) so serving never recomputes the corpus passes.
    */
  def fit(trusted: DataFrame, k: Long = 8L): Model = {
    graft.GraftExtensions.ensure(trusted.sparkSession)
    val idf = TextQueries.idfOf(trusted).persist()
    idf.count()
    val w = TextQueries.hashedWeightsOf(trusted, idf)
    val seed = trusted.select(col("doc_id"),
      pmod(col("doc_id"), lit(k)).as("cid0"))
    val (cent0, cnorm0) = TextQueries.topicCentroids(w, seed)
    val cent = cent0.persist(); cent.count()
    val cnorm = cnorm0.persist(); cnorm.count()
    val baseCounts = TextQueries
      .topicAssign(w, trusted.select(col("doc_id")), cent, cnorm, k)
      .groupBy("topic").agg(count(lit(1)).as("n_base"))
      .persist()
    val baseTotal = baseCounts.agg(sum(col("n_base"))).head().getLong(0)
    Model(idf, cent, cnorm, baseCounts, baseTotal, k)
  }

  def release(m: Model): Unit =
    Seq(m.idf, m.cent, m.cnorm, m.baseCounts).foreach(_.unpersist())

  /** Assign one batch of documents to topics (stateless: frozen idf +
    * broadcast centroids; docs with no known tokens keep `doc_id % k`).
    */
  def assignBatch(batch: DataFrame, m: Model): DataFrame = {
    graft.GraftExtensions.ensure(batch.sparkSession)
    TextQueries.topicAssign(
      TextQueries.hashedWeightsOf(batch, m.idf),
      batch.select(col("doc_id")), m.cent, m.cnorm, m.k)
  }

  /** Assign + persist one batch's topic counts into
    * `outDir/batch_id=<id>` with OVERWRITE: these rows are per-batch
    * DELTAS (unlike the cumulative update-mode partials
    * [[StreamingAggs.mergeOnRead]] dedups at read time), so a
    * foreachBatch re-delivery after restart would double-count under a
    * plain append — the per-batch-directory overwrite makes replay
    * idempotent.
    */
  def writeCounts(batch: DataFrame, m: Model, id: Long, outDir: String): Unit =
    assignBatch(batch, m)
      .groupBy("topic").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

  /** Wire a `(doc_id, text)` stream through per-batch assignment into
    * the partitioned count log `(topic, n)` + `batch_id` partition.
    */
  def start(docs: DataFrame, m: Model, outDir: String, checkpointDir: String,
      triggerMs: Long = 500): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeCounts(batch, m, id, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()

  /** Serve-side drift table from the merged count log: per topic, live
    * vs baseline share in exact basis points and the absolute drift.
    */
  def drift(spark: SparkSession, outDir: String, m: Model): DataFrame = {
    val served = spark.read.parquet(outDir)
      .groupBy("topic").agg(sum(col("n")).as("n_live"))
    val total = served.agg(coalesce(sum(col("n_live")), lit(0L)))
      .head().getLong(0)
    require(total > 0, "topic drift: no live documents served yet")
    served.join(m.baseCounts, Seq("topic"), "full_outer")
      .select(col("topic"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_live"), lit(0L)).as("n_live"))
      .withColumn("base_bp", expr(s"(n_base * 10000) div ${m.baseTotal}L"))
      .withColumn("live_bp", expr(s"(n_live * 10000) div ${total}L"))
      .withColumn("drift_bp", abs(col("live_bp") - col("base_bp")))
      .orderBy("topic")
  }
}
