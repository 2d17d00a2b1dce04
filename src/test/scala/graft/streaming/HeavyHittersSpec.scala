package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ST13 — streamed Count-Min cells must accumulate to the batch sketch
  * exactly, and probe estimates must equal the oracle-gated x22 values.
  */
class HeavyHittersSpec extends SparkSpec {

  test("streamed CMS cells equal the batch sketch; probes match x22") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val keys = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey")).as[Long].collect()

    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val mem = MemoryStream[Long]
    val q = HeavyHitters.cells(mem.toDF().toDF("key"))
      .writeStream.outputMode("update")
      .foreachBatch((b: DataFrame, id: Long) =>
        StreamingAggs.appendPartials(b, id, dir))
      .start()
    try {
      val third = math.max(1, keys.length / 3)
      keys.grouped(third).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val served = StreamingAggs.mergeOnRead(spark, dir, Seq("r", "bucket"))
    val servedCells = served
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    val batchCells = HeavyHitters.cells(
        Tables.load(spark, sfDir, "lineitem").select(col("l_partkey").as("key")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(servedCells.nonEmpty && servedCells === batchCells,
      "streamed running cells must equal the batch sketch")

    // probe estimates from streamed state == the x22 batch query's column
    val probes = Tables.load(spark, sfDir, "part")
      .filter(col("p_partkey") <= 10).select(col("p_partkey").as("key"))
    val streamedEst = HeavyHitters.estimate(probes, served)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val x22 = graft.SparkEntry.queries("x22_countmin")(spark, sfDir)
      .select(col("p_partkey"), col("est_count"), col("true_count"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(x22.nonEmpty)
    x22.foreach { case (k, est, truth) =>
      assert(streamedEst(k) === est,
        s"streamed estimate for $k = ${streamedEst(k)} != x22's $est")
      assert(streamedEst(k) >= truth, s"CM guarantee violated for $k")
    }
  }
}
