package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextQueries
import org.apache.spark.sql.functions._

/** Streaming model-gated curation: the live scorer must agree EXACTLY
  * with the batch t28 definition (integer ppm sums, one final division),
  * train at most once per TTL, stay bounded under the top-M cap, and add
  * no shuffle to the scoring stage.
  */
class QualityGateSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def gate(ttlMs: Long = Long.MaxValue, topM: Int = 10000,
      clock: () => Long = () => 0L) =
    new QualityGate(TextQueries.qualityWeights(_, sf01), ttlMs, topM, clock)

  test("streamed micro-batch scores equal the batch t28 scores exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val g = gate()
    val docs = Tables.load(spark, sf01, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map[Long, (Long, Long, Boolean)]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        g.score(batch).select("doc_id", "wsum", "n_toks", "accepted")
          .collect().foreach(r => seen.synchronized {
            seen(r.getLong(0)) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
          })
        ()
      }
      .start()
    try {
      val (half1, half2) = docs.splitAt(docs.length / 2)
      mem.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(half2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val batchT28 = TextQueries.t28QualityModel.run(spark, sf01)
      .select("doc_id", "wsum", "n_toks", "selected").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(seen.size === batchT28.size)
    assert(seen.toMap === batchT28,
      "stream scoring must equal the batch t28 definition exactly")
    assert(g.trainCount === 1, "model must train once within TTL")
  }

  test("model retrains only after TTL expiry") {
    var now = 0L
    val g = gate(ttlMs = 1000, clock = () => now)
    g.currentModel(spark)
    now = 500
    g.currentModel(spark)
    assert(g.trainCount === 1)
    now = 1500
    g.currentModel(spark)
    assert(g.trainCount === 2)
  }

  test("top-M cap bounds the model; uncapped tail tokens score zero") {
    val g3 = gate(topM = 3)
    val m = g3.currentModel(spark)
    assert(m.size === 3)
    // the capped model keeps the 3 largest |weights|
    val full = gate().currentModel(spark)
    val top3 = full.toSeq.sortBy { case (t, w) => (-math.abs(w), t) }
      .take(3).toMap
    assert(m === top3)
  }

  test("scoring stage is shuffle-free and splits accept/reject completely") {
    val g = gate()
    val docs = Tables.load(spark, sf01, "documents").select("doc_id", "text")
    val scored = g.score(docs)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-row scoring must not shuffle:\n$plan")
    val (acc, rej) = g.route(docs)
    assert(acc.count() + rej.count() === docs.count())
    assert(acc.filter(col("wsum") <= 0).count() === 0)
    assert(rej.filter(col("wsum") > 0).count() === 0)
  }
}
