package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import graft.text.CurationQueries
import org.apache.spark.sql.functions._

/** ST20 DSIR gate: the live per-row scorer must agree EXACTLY with the
  * batch x55 weights, train once per TTL, and route by the same
  * importance-ratio rule.
  */
class DsirGateSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def gate(clock: () => Long = () => 0L, ttlMs: Long = Long.MaxValue) =
    new DsirGate(CurationQueries.dsirModel(_, sf01), ttlMs, clock)

  test("streamed micro-batch weights equal the batch x55 weights exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val g = gate()
    val batchW = CurationQueries.dsirScores(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // stream the raw pool (the docs x55 scores) in two batches
    val raw = Tables.load(spark, sf01, "documents")
      .filter(!col("source").isInCollection(
        graft.text.TextQueries.CURATED_SOURCES))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val seen = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        g.score(batch).select("doc_id", "w_doc", "selected")
          .collect().foreach(r => seen.synchronized {
            seen(r.getLong(0)) = (r.getLong(1), r.getBoolean(2))
          })
        ()
      }.start()
    try {
      val (h1, h2) = raw.splitAt(raw.length / 2)
      mem.addData(h1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(h2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.keySet === batchW.keySet)
    batchW.foreach { case (id, w) =>
      assert(seen(id)._1 === w, s"doc $id diverged from batch x55")
      assert(seen(id)._2 === (w > 0), s"doc $id verdict diverged")
    }
    assert(g.trainCount === 1L, "model must train once across batches")
  }

  test("route splits by the importance-ratio rule; TTL refresh retrains") {
    import spark.implicits._
    @volatile var now = 0L
    val g = gate(clock = () => now, ttlMs = 1000L)
    val docs = Seq((1L, "alpha beta gamma"), (2L, "one two three"))
      .toDF("doc_id", "text")
    val (sel, rej) = g.route(docs)
    assert(sel.count() + rej.count() === 2L)
    assert(g.trainCount === 1L)
    g.score(docs).collect()
    assert(g.trainCount === 1L, "mid-TTL batches must reuse the model")
    now = 5000L
    g.score(docs).collect()
    assert(g.trainCount === 2L, "TTL expiry must retrain")
  }
}
