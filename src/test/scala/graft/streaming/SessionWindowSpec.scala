package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// top-level: Dataset encoders cannot derive for spec-nested case classes
final case class SWEvent(user_id: Long, ts: Timestamp)

/** Native `session_window` (ST10) in a REAL streaming query: watermarked
  * append-mode sessions close exactly like the batch expression. The
  * boundary is INCLUSIVE: an event at exactly gap distance MERGES
  * (windows merge when the next start <= current end), so only a gap
  * STRICTLY greater than the gap duration starts a new session — the
  * semantics the st10 oracle mirrors with `> gap`, same as st1.
  */
class SessionWindowSpec extends SparkSpec {

  private val base = 1600000000000L // fixed epoch ms
  private def ev(u: Long, offsetMin: Long, extraMs: Long = 0): SWEvent =
    SWEvent(u, new Timestamp(base + offsetMin * 60000L + extraMs))

  test("streaming session_window closes sessions on watermark; boundary merges exact-gap events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SWEvent]
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then one 45 min
      // after the second (gap 45 > 30 → new session)
      // user 3: two events at EXACTLY 30 min distance → windows touch,
      // so they MERGE into one session (the inclusive boundary)
      mem.addData(ev(1, 0), ev(1, 10), ev(1, 55), ev(3, 0), ev(3, 30))
      q.processAllAvailable()
      // watermark jump: everything above closes
      mem.addData(ev(9, 600))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, start_us, end_us, n_events FROM sw_out ORDER BY user_id, start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val us = (m: Long) => (base + m * 60000L) * 1000L
      assert(rows.toSeq === Seq(
        (1L, us(0), us(10), 2L),
        (1L, us(55), us(55), 1L),
        (3L, us(0), us(30), 2L)))

      // batch twin over the same events produces the identical sessions
      val batch = Seq(ev(1, 0), ev(1, 10), ev(1, 55), ev(3, 0), ev(3, 30))
        .toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          unix_micros(min(col("ts"))).as("start_us"),
          unix_micros(max(col("ts"))).as("end_us"))
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(batch.toSeq === rows.toSeq)
    } finally q.stop()
  }
}
