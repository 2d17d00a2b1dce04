package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video scene-change detection over MJPEG AVI frames: hash every
  * decoded frame with the [[Multimodal.aHashImage]] perceptual grid and
  * call a boundary wherever consecutive frames' Hamming distance jumps
  * past a threshold — the shot-segmentation primitive a video curation
  * pipeline needs before per-scene sampling/dedup (sampling a fixed
  * every-k grid across a cut mixes two shots in one training clip;
  * scene-aware sampling is the standard fix).
  *
  * Decode + hash is one `mapPartitions` over the payload column (frames
  * never shuffle); boundary detection is a `lag` window PARTITIONED BY
  * video (state bounded by one video's frame count). Perceptual hashing
  * rather than raw pixel deltas makes the detector robust to
  * re-encoding noise — the same property the image dedup path relies
  * on — while a real cut moves ~half the 64 grid bits.
  */
object SceneDetect {

  final case class FrameHash(media_id: Long, frame_idx: Int, ahash: Long)

  /** Per-frame perceptual hashes of every decodable AVI video. */
  def frameHashes(media: Dataset[Multimodal.MediaRow]): Dataset[FrameHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(r =>
        r.meta != null && r.meta.media_type == "video" && r.meta.format == "avi")
      .flatMap { r =>
        Multimodal.AviCodec.parseRaw(r.payload) match {
          case Left(_) => Iterator.empty
          case Right((_, frames)) =>
            frames.iterator.zipWithIndex.flatMap { case ((off, end), i) =>
              Option(Multimodal.AviCodec.decodeFrame(r.payload, off, end))
                .filter(img => img.getWidth >= 8 && img.getHeight >= 8)
                .map(img => FrameHash(r.media_id, i, Multimodal.aHashImage(img)))
            }
        }
      })
  }

  /** Scene boundaries: frames whose hash sits ≥ `hammingThreshold` bits
    * from their predecessor. Returns (media_id, frame_idx, hamming) —
    * frame 0 (no predecessor) is never a boundary.
    */
  def sceneChanges(media: Dataset[Multimodal.MediaRow],
      hammingThreshold: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frameHashes(media).toDF()
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("hamming", expr("bit_count(ahash ^ prev)"))
      .filter(col("hamming") >= hammingThreshold)
      .select(col("media_id"), col("frame_idx"), col("hamming"))
  }

  /** Scene segments per video: boundary list → [start, end] frame ranges
    * (a video with no boundaries is one segment; segment 0 starts at
    * frame 0). Single decode pass: boundaries, per-video last frame, and
    * the synthetic frame-0 start all derive from ONE frame-hash frame —
    * `last_frame` rides a per-video window max and the first surviving
    * row stands in for the frame-0 start, so no second `frameHashes`
    * subtree re-decodes every video.
    */
  def segments(media: Dataset[Multimodal.MediaRow],
      hammingThreshold: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val annotated = frameHashes(media).toDF()
      .withColumn("last_frame", max(col("frame_idx"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("media_id")))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .withColumn("hamming", expr("bit_count(ahash ^ prev)"))
    val starts = annotated.filter(col("rn") === 1 ||
        (col("prev").isNotNull && col("hamming") >= hammingThreshold))
      .withColumn("scene_no", row_number().over(w) - 1)
      .withColumn("next_start", lead(col("frame_idx"), 1).over(w))
    starts.select(col("media_id"),
        col("scene_no").cast("long").as("scene_no"),
        when(col("rn") === 1, lit(0)).otherwise(col("frame_idx"))
          .cast("long").as("start_frame"),
        coalesce(col("next_start") - 1, col("last_frame")).cast("long")
          .as("end_frame"))
      .orderBy("media_id", "scene_no")
  }
}
