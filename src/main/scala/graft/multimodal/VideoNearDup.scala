package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-video near-duplicate detection over frame-fingerprint sets —
  * the video corpus dedup step (re-uploads, clips, re-containered
  * copies) that image-level near-dup ([[Multimodal.nearDupImagePairs]])
  * and in-video scene detection ([[SceneDetect]]) don't cover.
  *
  * A video's signature is its DISTINCT per-frame perceptual-hash set
  * ([[SceneDetect.frameHashes]] — true JPEG pixel decodes). Two
  * videos compare by
  *  - Jaccard over the sets (re-upload / light re-edit), and
  *  - containment |∩| / min(|A|, |B|) (a CLIP cut from a longer video
  *    scores 100% even when Jaccard is tiny).
  * Both in exact integer basis points from distinct-count arithmetic.
  *
  * Identical frames re-encode to identical JPEG bytes → equal hashes,
  * so exact-hash matching finds re-encodes and cuts; frames that drift
  * a few pixels are the x3-simhash-style Hamming territory
  * ([[Multimodal.nearDupImagePairs]] handles that per image).
  *
  * Scale posture: the candidate generator is an inverted index
  * hash → videos with a df cap — a hash shared by more than `maxDf`
  * videos (intros, black frames, test cards) is dropped BEFORE the
  * self-join, the same hot-block discipline as the text dedup family
  * (x2/x63); pair volume is Σ_hash df² over capped dfs, never
  * all-pairs. Everything is map-combinable aggregation over
  * (video, hash) rows — O(frames) input, O(videos·distinct-hashes)
  * state, no driver-side loops.
  */
object VideoNearDup {

  /** (id, hash) distinct frame-fingerprint rows per decodable video. */
  def frameSets(media: Dataset[Multimodal.MediaRow]): DataFrame =
    SceneDetect.frameHashes(media).toDF()
      .select(col("media_id").as("id"), col("ahash").as("hash")).distinct()

  /** Near-dup / containment pairs above the report thresholds.
    * Columns: id_a, id_b (a < b), inter, n_a, n_b, jaccard_bp,
    * containment_bp.
    */
  def pairs(media: Dataset[Multimodal.MediaRow], maxDf: Long = 64L,
      minJaccardBp: Long = 2500L, minContainBp: Long = 8000L): DataFrame = {
    val fs = frameSets(media)
    val keep = fs.groupBy("hash").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("hash")
    val idx = fs.join(keep, Seq("hash"))
    // sizes over the CAPPED signature: a boilerplate frame (intro,
    // black, test card) is outside the similarity space entirely —
    // excluded from numerator AND denominator, the stopword treatment.
    // df >= 2 also drops frames unique to one video from the sizes;
    // add them back via fs so a video's unshared tail still counts.
    val sizes = fs.join(
      fs.groupBy("hash").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("hash"), Seq("hash"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    val cand = idx.as("a").join(idx.as("b"), "hash")
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    cand
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard_bp",
        expr("inter * 10000L div (n_a + n_b - inter)"))
      .withColumn("containment_bp",
        expr("inter * 10000L div least(n_a, n_b)"))
      .filter(col("jaccard_bp") >= minJaccardBp ||
        col("containment_bp") >= minContainBp)
      .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard_bp",
        "containment_bp")
      .orderBy("id_a", "id_b")
  }
}
