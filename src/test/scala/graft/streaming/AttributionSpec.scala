package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import java.nio.file.Files

/** ST8 — stream-stream interval join: the streaming attribution output
  * must equal the identical plan evaluated statically (watermarks are
  * no-ops in batch; a single AvailableNow batch has no late data, so the
  * stream drops nothing and the sets must match exactly).
  */
class AttributionSpec extends SparkSpec {

  test("streaming view->purchase pairs equal the batch interval join") {
    val base = Files.createTempDirectory("graft-attr").toString
    val inDir = Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      inDir.resolve("events.parquet"))

    val cfg = SpeedLayer.Config(inDir.toString, s"$base/out", s"$base/chk")
    val streamed = Attribution.viewPurchasePairs(
      SpeedLayer.eventStream(spark, cfg))
    val q = streamed.writeStream
      .format("memory").queryName("st8_pairs")
      .option("checkpointLocation", s"$base/chk/pairs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    val batch = Attribution.viewPurchasePairs(
      SpeedLayer.adapt(spark.read.schema(Tables.events)
        .parquet(inDir.toString)))

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      df.select("purchase_id", "view_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet

    val s1 = pairSet(spark.table("st8_pairs"))
    val s2 = pairSet(batch)
    assert(s2.nonEmpty, "the corpus must produce attribution pairs")
    assert(s1 === s2, "stream and batch interval joins must emit the same pairs")

    // interval semantics: every pair's view precedes its purchase by <= 1h
    val bad = batch.filter(
      org.apache.spark.sql.functions.col("view_ts") >
        org.apache.spark.sql.functions.col("purchase_ts")).count()
    assert(bad === 0)
  }
}
