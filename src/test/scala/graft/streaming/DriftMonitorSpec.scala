package graft.streaming

import graft.{Parity, SparkSpec, SparkEntry}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ST11 — the streaming drift monitor must be bit-identical to the
  * oracle-gated q6 batch audit on the same data: baseline from the early
  * half, the late half streamed through a real update-mode query in
  * several triggers, served via mergeable partials + merge-on-read.
  */
class DriftMonitorSpec extends SparkSpec {

  private def halves(): (DataFrame, DataFrame) = {
    val o = Tables.load(spark, sfDir, "orders")
      .select((Parity.dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
        to_date(col("o_orderdate")).as("od"))
    (o.filter(col("od") < "1997-01-01").select("cents"),
      o.filter(col("od") >= "1997-01-01").select("cents"))
  }

  test("streamed drift table equals the q6 batch audit on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val (early, late) = halves()
    val base = DriftMonitor.baseline(early)

    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val mem = MemoryStream[Long]
    val q = DriftMonitor
      .binCounts(mem.toDF().withColumnRenamed("value", "cents"), base)
      .writeStream.outputMode("update")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingAggs.appendPartials(b, id, dir))
      .start()
    try {
      // three triggers: the running counts must accumulate across batches,
      // and merge-on-read must keep each bin's newest cumulative row
      val cents = late.collect().map(_.getLong(0))
      val third = math.max(1, cents.length / 3)
      cents.grouped(third).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val served = StreamingAggs.mergeOnRead(spark, dir, Seq("bin"))
    val streamed = DriftMonitor.drift(spark, served, base)
      .collect().map(_.toSeq).toSeq

    val batch = SparkEntry.queries("q6_distribution_drift")(spark, sfDir)
      .collect().map(_.toSeq).toSeq

    assert(streamed === batch,
      s"stream/batch drift divergence:\nstream=$streamed\nbatch=$batch")
  }

  test("an empty trusted window fails loudly, not with an NPE") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      DriftMonitor.baseline(Seq.empty[Long].toDF("cents"))
    }
    assert(e.getMessage.contains("baseline is empty"))
  }

  test("out-of-range live values clamp into the edge bins (bins never move)") {
    import spark.implicits._
    val base = DriftMonitor.baseline(Seq(100L, 200L, 300L).toDF("cents"))
    val live = DriftMonitor
      .bucketize(Seq(-50L, 99L, 301L, 5000L).toDF("cents"), base.minC, base.maxC)
      .select("bin").as[Long].collect().sorted
    assert(live === Array(0L, 0L, 9L, 9L),
      "values outside the baseline range must land in bins 0/9")
  }
}
