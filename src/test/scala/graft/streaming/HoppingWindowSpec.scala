package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

// top-level: Dataset encoders cannot derive for spec-nested case classes
final case class HWEvent(user_id: Long, ts: Timestamp)

/** A16's hopping windows in a REAL streaming query: the watermarked
  * append-mode stream emits exactly the windows the batch expression
  * produces once the watermark closes them (each event lands in 4
  * overlapping 1h/15min windows).
  */
class HoppingWindowSpec extends SparkSpec {

  private val base = 1600000200000L // NOT hop-aligned (83rd min of the hour)
  private def ev(u: Long, offMin: Long) = HWEvent(u, new Timestamp(base + offMin * 60000L))

  // count(*) only: countDistinct is unsupported in streaming aggs (the
  // batch a16 oracle keeps the distinct-user column)
  private def hopAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("start_us"),
        col("n_events"))

  test("streamed hopping windows equal the batch expression once closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[HWEvent]
    val q = hopAgg(mem.toDF().withWatermark("ts", "30 minutes"))
      .writeStream.format("memory").queryName("hop_out")
      .outputMode("append").start()
    val data = Seq(ev(1, 0), ev(2, 0), ev(1, 20))
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // advance the watermark far past every window end → all closed
      mem.addData(ev(9, 600))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT start_us, n_events FROM hop_out ORDER BY start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val batch = hopAgg(data.toDF()).orderBy("start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(batch.length === 5,
        s"3 events 20 min apart must span 5 distinct windows, got ${batch.length}")
      assert(streamed.toSeq === batch.toSeq,
        s"stream ${streamed.toSeq} != batch ${batch.toSeq}")
      // every event is in exactly 4 windows
      assert(batch.map(_._2).sum === data.length * 4)
    } finally q.stop()
  }
}
