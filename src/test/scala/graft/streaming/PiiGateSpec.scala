package graft.streaming

import graft.SparkSpec
import graft.quality.{Pii, PiiQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII scrub: stream ≡ batch redaction exactly (stateless ⇒
  * split-invariant), routing never leaks raw text, and the audit wing
  * counts planted classes per window.
  */
class PiiGateSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "clean prose about spark tables",
    2L -> "mail jo.doe@example.org for the report",
    3L -> "escalate to 25-989-741-2988 after hours",
    4L -> "card 4111111111111111 charged twice",
    5L -> "ssn 123-45-6789 on the form",
    6L -> "login from 10.0.0.7 flagged",
    7L -> "all clean here too")

  test("scrub on a stream equals the batch redaction on any split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map[Long, (String, Boolean)]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        PiiGate.scrub(batch).select("doc_id", "redacted", "had_pii")
          .collect().foreach(r => seen.synchronized {
            seen(r.getLong(0)) = (r.getString(1), r.getBoolean(2))
          })
        ()
      }.start()
    try {
      mem.addData(docs.take(3))
      q.processAllAvailable()
      mem.addData(docs.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val batch = PiiGate.scrub(docs.toDF("doc_id", "text"))
      .select("doc_id", "redacted", "had_pii").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(seen.toMap === batch)
    assert(batch(1L)._1 == "clean prose about spark tables")
    assert(!batch(1L)._2 && batch(4L)._2)
    assert(batch(4L)._1 == "card [CARD] charged twice")
  }

  test("route: offenders cross the gate with REDACTED text only, " +
    "clean rows pass through untouched") {
    val (clean, scrubbed) = PiiGate.route(docs.toDF("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
    val leaked = scrubbed.filter(
      Pii.detectors.map { case (_, p) => col("text").rlike(p) }
        .reduce(_ || _)).count()
    assert(leaked == 0, "raw PII crossed the gate")
    // both routes come back in the INGEST schema (names AND order): the
    // hit_*/had_pii audit columns live in scrub()/audit() only, so
    // downstream sinks see no schema drift versus the source
    assert(clean.columns.toSeq === Seq("doc_id", "text"))
    assert(scrubbed.columns.toSeq === Seq("doc_id", "text"))
    assert(scrubbed.count() == 5)
  }

  test("audit wing counts planted classes per window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:10:00")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val audited = PiiGate.audit(mem.toDF().toDF("ts", "text"), "ts")
    val q = audited.writeStream.outputMode("update")
      .format("memory").queryName("pii_audit").start()
    try {
      mem.addData(docs.map { case (_, t) => (t0, t) })
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("pii_audit")
      .select("kind", "n_hit", "n_docs").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(counts("email") == ((1L, 7L)))
    assert(counts("phone") == ((1L, 7L)))
    assert(counts("ssn") == ((1L, 7L)))
    assert(counts("ipv4") == ((1L, 7L)))
    assert(counts("ccard_candidate") == ((1L, 7L)))
    spark.sql("DROP TABLE IF EXISTS pii_audit")
  }

  test("the gate scrubs real planted blobs end to end (same chain as t30)") {
    // t30 oracle-gates the redaction chain against DuckDB; this pins the
    // STREAM-facing entry point onto the same outcome on the same rows.
    val blobs = PiiQueries.t30PiiRedact.run(spark, sfDir)
    assert(blobs.filter(col("redacted").contains("[CARD]")).count() ==
      blobs.count())
    assert(blobs.filter(col("redacted").contains("[PHONE]")).count() ==
      blobs.count())
  }
}
