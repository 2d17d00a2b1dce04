package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** ST29 — streaming IVF index maintenance: the missing middle of the ANN
  * lifecycle. [[Ivf.buildIndex]]/[[Ivf.save]] is the offline training
  * path and [[StreamingAnn]] the frozen-snapshot serving path; this
  * operator keeps the index CURRENT between retrains: micro-batches of
  * arriving vectors are routed to the EXISTING centroids (one
  * broadcast-argmin pass per batch — the stored lists are never read)
  * and appended into the index layout, while a drift trigger watches the
  * appended mass and marks a re-train due when the frozen centroids no
  * longer represent the corpus.
  *
  * Exactly-once across restarts without sink transactions: each batch
  * lands as its own `appends/batch_id=<id>` directory written with
  * OVERWRITE (the [[StreamingAnn.writeBatch]] idiom) — a foreachBatch
  * re-delivery after a crash replaces the batch's directory instead of
  * duplicating its vectors. The base `lists/` layout is untouched by
  * appends, so a concurrent [[StreamingAnn]] serving snapshot is never
  * half-updated.
  *
  * Drift policy (the "new-list mass threshold" trigger): appended mass is
  * compared per centroid against the baseline list sizes captured when
  * the maintainer attached. Re-train is due when EITHER the global
  * appended fraction crosses `globalPpm` (the corpus has outgrown the
  * centroids) or some single centroid's appended fraction crosses
  * `perListPpm` (arrivals concentrate where the quantizer has no
  * resolution — the classic IVF hot-list failure). [[retrain]] then
  * re-Lloyds over base ∪ appends, rewrites the index in place, and
  * clears the appends — the standard serving-vs-training split: appends
  * keep recall NOW, retrain restores list balance on a schedule.
  *
  * Scale posture: per batch, cost is O(batch × k) for the argmin plus a
  * partitioned write of the batch — independent of index size; the drift
  * check reads only parquet COUNTS (file metadata, no row scan); only
  * [[retrain]] touches the full corpus, and that is the point of having
  * a trigger instead of a timer.
  */
final class IvfMaintainer(
    val indexDir: String,
    globalPpm: Long = 200000L, // 20% appended overall
    perListPpm: Long = 1000000L) { // 100% appended on one list

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  private def appendsDir = s"$indexDir/appends"

  /** Baseline per-cid list sizes, captured lazily at first use and reset
    * by [[retrain]] — the denominator of the drift ratios.
    */
  @volatile private var baselineCache: Option[Map[Long, Long]] = None

  private def baseline(s: SparkSession): Map[Long, Long] = {
    baselineCache match {
      case Some(b) => b
      case None =>
        val b = s.read.parquet(s"$indexDir/lists")
          .groupBy(col("cid").cast("long").as("cid")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        baselineCache = Some(b)
        b
    }
  }

  private def appendsFrame(s: SparkSession): Option[DataFrame] = {
    val p = java.nio.file.Paths.get(appendsDir)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val hasBatch = {
        val l = java.nio.file.Files.list(p)
        try {
          val it = scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
          it.exists(_.getFileName.toString.startsWith("batch_id="))
        } finally l.close()
      }
      if (!hasBatch) None
      else Some(s.read.parquet(appendsDir)
        .withColumn("cid", col("cid").cast("long")))
    }
  }

  /** Route one micro-batch `(vec_id, embedding)` to the existing
    * centroids and land it as `appends/batch_id=<id>` (overwrite ⇒
    * replay-idempotent). Returns the number of vectors appended.
    */
  def appendBatch(batch: DataFrame, batchId: Long): Long = {
    val s = spark(batch)
    val cents = s.read.parquet(s"$indexDir/centroids")
    val assigned = Ivf.assign(batch, cents)
    assigned.write.mode("overwrite").partitionBy("cid")
      .parquet(s"$appendsDir/batch_id=$batchId")
    s.read.parquet(s"$appendsDir/batch_id=$batchId").count()
  }

  /** The maintained index: base lists ∪ appends, plus the (frozen)
    * centroids — drop-in for [[Ivf.load]]'s pair, so [[Ivf.topK]] probes
    * see appended vectors exactly where a from-scratch assignment against
    * the same centroids would place them.
    */
  def load(s: SparkSession): (DataFrame, DataFrame) = {
    val (base, cents) = Ivf.load(s, indexDir)
    val lists = appendsFrame(s) match {
      case Some(a) => base.unionByName(
        a.select(base.columns.map(col).toIndexedSeq: _*))
      case None => base
    }
    (lists, cents)
  }

  /** Per-centroid drift report: `(cid, base_n, appended_n, drift_ppm)`.
    * Fractions are exact integer ppm; a cid that gained vectors but had
    * an EMPTY baseline list reads as perListPpm-saturating (greatest(
    * base_n, 1) denominator).
    */
  def driftReport(s: SparkSession): DataFrame = {
    import s.implicits._
    val base = baseline(s).toSeq.toDF("cid", "base_n")
    val appended = appendsFrame(s) match {
      case Some(a) => a.groupBy("cid").agg(count(lit(1)).as("appended_n"))
      case None => Seq.empty[(Long, Long)].toDF("cid", "appended_n")
    }
    base.join(appended, Seq("cid"), "full_outer")
      .na.fill(0L, Seq("base_n", "appended_n"))
      .withColumn("drift_ppm",
        expr("appended_n * 1000000 DIV greatest(base_n, 1)"))
      .orderBy("cid")
  }

  /** True when the drift policy says the centroids no longer represent
    * the corpus — the maintainer keeps appending either way; this flag is
    * the scheduler's signal to run [[retrain]].
    */
  def retrainDue(s: SparkSession): Boolean = {
    val rep = driftReport(s)
      .agg(sum("appended_n").as("a"), sum("base_n").as("b"),
        max("drift_ppm").as("worst"))
      .head()
    val appended = rep.getLong(0)
    val base = math.max(rep.getLong(1), 1L)
    appended * 1000000L / base >= globalPpm ||
      rep.getLong(2) >= perListPpm
  }

  /** Full re-Lloyd over base ∪ appends, seeded from the CURRENT
    * assignment (warm start — appended vectors enter at their routed
    * cid), rewritten in place; appends are cleared and the drift
    * baseline resets. A crash mid-retrain leaves a rebuilt base plus
    * stale appends — re-appending is idempotent per batch directory and
    * re-running retrain converges, so the operation is safe to retry.
    */
  def retrain(s: SparkSession, iterations: Int = 2): Unit = {
    val (lists, _) = load(s)
    // warm start: seed the Lloyd rounds from the current (routed)
    // assignment, carried as seed_cid so buildIndex's own cid column
    // doesn't collide; sever lineage from the dirs being rewritten
    val vectors = lists.select(col("vec_id"), col("embedding"),
      col("cid").as("seed_cid")).localCheckpoint(true)
    val (index0, cents) = Ivf.buildIndex(
      vectors, seedAssign = col("seed_cid"), iterations)
    val index = index0.drop("seed_cid")
    Ivf.save(index, cents, indexDir)
    Seq(index0, cents).foreach(Ivf.dropCheckpoint)
    Ivf.dropCheckpoint(vectors)
    // clear served appends AFTER the rebuilt index is committed
    val p = java.nio.file.Paths.get(appendsDir)
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        st.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally st.close()
    }
    baselineCache = None
  }

  /** Wire a streaming vector frame `(vec_id, embedding)` into per-batch
    * maintenance. Kafka is a `format` swap on the caller's readStream.
    */
  def start(vectors: DataFrame, checkpointDir: String,
      triggerMs: Long = 500): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(batch, id); ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()
}
