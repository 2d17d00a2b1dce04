package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.Tables
import graft.text.TextQueries

/** ST19 — STREAMING hybrid retrieval: the live x57. Query TEXT arrives
  * as a stream of `(q_id, text)` rows; each micro-batch runs the same
  * two legs as the batch operator — BM25 against the corpus inverted
  * index, cosine in the hashed tf-idf space — and fuses them by
  * reciprocal rank, serving top-5 per query. This is the online half of
  * the RAG split: x49/x56/x57 are the offline index-building view,
  * ST15 serves pre-embedded vectors, ST19 serves raw text end to end.
  *
  * Scale/streaming posture:
  *  - ALL corpus statistics (tf/dl/doc-count/idf for BM25; idf + hashed
  *    vectors + norms for the dense leg) are persisted distributed
  *    frames materialized ONCE per TTL — the [[graft.similarity.StreamingAnn]]
  *    snapshot discipline. Between refreshes every batch serves against
  *    one immutable index; a corpus update becomes visible at TTL
  *    expiry, never mid-stream. Crucially the QUERY featurization uses
  *    the FROZEN idf (a live batch must not re-derive document
  *    frequencies from itself — [[TextQueries.idfOf]]'s contract).
  *  - Per batch the query side is broadcast into both legs (the
  *    inverted-index access path), candidates are
  *    O(corpus-postings-matched), fusion touches 2 × top-20 × |batch|
  *    rows. Stateless per batch — no state store.
  *  - Per-batch-directory overwrite sink: replay-idempotent.
  */
final class StreamingRetrieval(
    corpusDir: String,
    ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Index(tf: DataFrame, dl: DataFrame, nt: DataFrame,
      idfLex: DataFrame, idfDense: DataFrame, w: DataFrame, norms: DataFrame) {
    def frames: Seq[DataFrame] = Seq(tf, dl, nt, idfLex, idfDense, w, norms)
  }

  @volatile private var snapshot: Option[(Index, Long)] = None
  @volatile private var builds: Long = 0L

  /** Times the corpus index was (re)built — snapshot observability. */
  def buildCount: Long = builds

  private def current(spark: SparkSession): Index = synchronized {
    val now = clock()
    snapshot match {
      case Some((idx, at)) if now - at < ttlMs => idx
      case _ =>
        graft.GraftExtensions.ensure(spark)
        val (tf, dl, nt, idfLex) = TextQueries.bm25Corpus(spark, corpusDir,
          cached = false)
        val docsF = Tables.load(spark, corpusDir, "documents")
        val idfDense = TextQueries.idfOf(docsF)
        val w = TextQueries.hashedWeightsOf(docsF, idfDense)
        val norms = w.groupBy("doc_id")
          .agg(sum(col("wsum") * col("wsum")).as("ss"))
        val idx = Index(tf, dl, nt, idfLex, idfDense, w, norms)
        // persist in dependency order and materialize NOW — derived
        // frames hit the already-cached parents via the CacheManager,
        // and the count() pins every frame against later corpus-dir
        // changes (one immutable snapshot per TTL)
        idx.frames.foreach { f => f.persist(); f.count() }
        snapshot.foreach(_._1.frames.foreach(_.unpersist()))
        builds += 1
        snapshot = Some((idx, now))
        idx
    }
  }

  /** Serve one (micro-)batch of `(q_id, text)` queries → fused top-5
    * rows `(q_id, rk, hit_doc, rrf_fp, n_legs)` against the freshest
    * snapshot — bit-identical to the batch x57 for the same queries.
    */
  def serveBatch(batch: DataFrame): DataFrame = {
    val idx = current(batch.sparkSession)
    val q = batch.select(col("q_id").as("q_doc"), col("text"))
    val lex = TextQueries.bm25Against(idx.tf, idx.dl, idx.nt, idx.idfLex,
      TextQueries.queryTerms(q))
    val wq = TextQueries
      .hashedWeightsOf(q.select(col("q_doc").as("doc_id"), col("text")),
        idx.idfDense)
      .select(col("doc_id").as("q_doc"), col("bucket"), col("wsum").as("qw"))
    val den = TextQueries.denseAgainst(idx.w, idx.norms, wq)
    TextQueries.fuseRrf(lex, den).withColumnRenamed("q_doc", "q_id")
  }

  /** Serve + persist one batch, idempotent on replay by per-batch-dir
    * overwrite (the StreamingAnn rule).
    */
  def writeBatch(batch: DataFrame, id: Long, outDir: String): Unit =
    serveBatch(batch).write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

  /** Wire a streaming `(q_id, text)` frame through per-batch serving
    * into a partitioned result log.
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
