package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST13 — streaming frequency / heavy-hitter monitor: "how often has key
  * k appeared, ever" over an unbounded stream with O(depth · width)
  * state.
  *
  * The x22 Count-Min sketch is mergeable by construction — cells are
  * sums over FIXED row-salted md5 buckets, so adding per-batch cell
  * deltas gives exactly the sketch of the concatenated stream. The
  * streaming side is therefore a plain update-mode aggregation onto
  * ≤ depth·width cells (state never grows with keys or stream length),
  * appended as mergeable partials; the serve side merges latest cells
  * and answers point-frequency probes with the CM `min` over the key's
  * depth buckets — est ≥ true always, overestimate bounded by the
  * width-wise collision mass.
  *
  * Same sketch, same buckets, same cells as the oracle-gated x22 batch
  * query ([[graft.analytics.SketchQueries.cmsBuckets]] is the single
  * shared definition) — [[graft.streaming.HeavyHittersSpec]] pins
  * streamed cells ≡ batch cells and streamed probe estimates ≡ x22's.
  */
object HeavyHitters {

  /** Update-mode running cell counts for a key stream (column `key`). */
  def cells(stream: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame = {
    graft.GraftExtensions.ensure(stream.sparkSession)
    stream
      .select(graft.analytics.SketchQueries.cmsBuckets(col("key"), depth, width))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (column `key`) against a
    * merged cell frame `(r, bucket, cnt)`: CM minimum over the key's
    * buckets. Cells broadcast — they are sketch-sized, never data-sized.
    */
  def estimate(probes: DataFrame, mergedCells: DataFrame,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    graft.GraftExtensions.ensure(probes.sparkSession)
    probes
      .select(col("key"),
        graft.analytics.SketchQueries.cmsBuckets(col("key"), depth, width))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(mergedCells), Seq("r", "bucket"), "left")
      .groupBy("key")
      .agg(coalesce(min(col("cnt")), lit(0L)).as("est_count"))
  }
}
