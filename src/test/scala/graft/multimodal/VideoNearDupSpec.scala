package graft.multimodal

import graft.SparkSpec

/** Cross-video near-dup: a re-upload scores high Jaccard, a clip cut
  * from a longer video scores 100% containment, disjoint videos emit
  * nothing, and a frame shared by more videos than the df cap (the
  * channel intro) is dropped BEFORE pair generation.
  */
class VideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic seeded-noise frame — distinct aHash per seed (the
    * gradient frames of syntheticMjpegAvi all share one hash shape,
    * which is exactly the hot-frame case the df cap exists for, not
    * what a planted-identity fixture wants).
    */
  private def frame(seed: Long): Array[Byte] = {
    val rng = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = rng.nextInt(256)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def video(id: Long, frames: Seq[Array[Byte]]) =
    Multimodal.MediaRow(id, Multimodal.AviCodec.encodeMjpeg(frames, 32, 32, 8),
      Multimodal.MediaMeta("video", "avi", Some(32), Some(32),
        Some(frames.size * 125L), 0L))

  test("re-upload, clip, disjoint, and hot-intro df-cap cases") {
    val intro = frame(0) // shared by every video: the channel intro
    val f = (1L to 12L).map(frame).toArray
    val corpus = Seq(
      video(1, intro +: Seq(f(0), f(1), f(2), f(3), f(4))), // original
      video(2, intro +: Seq(f(0), f(1), f(2), f(3), f(5))), // re-upload, 1 frame swapped
      video(3, intro +: Seq(f(1), f(2), f(3))),             // clip of video 1
      video(4, intro +: Seq(f(6), f(7), f(8))),             // unrelated
      video(5, intro +: Seq(f(9), f(10), f(11)))            // unrelated
    ).toDS()

    // df cap 3 < 5 videos sharing the intro hash: it must not generate pairs
    val got = VideoNearDup.pairs(corpus, maxDf = 3L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("jaccard_bp"),
          r.getAs[Long]("containment_bp"))).toMap

    // re-upload: 4 of 6 distinct frames shared -> jaccard 4/6
    val (i12, j12, c12) = got((1L, 2L))
    assert(i12 === 4L && j12 === 6666L && c12 === 8000L)
    // clip: all 3 of its frames inside video 1 -> containment 100%
    val (i13, _, c13) = got((1L, 3L))
    assert(i13 === 3L && c13 === 10000L)
    // nothing else crosses a threshold — in particular no pair exists
    // only through the capped intro frame
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"unexpected pairs: ${got.keySet}")
    // videos 4/5 share ONLY the capped intro: absent entirely
    assert(!got.contains((4L, 5L)))
  }

  test("frame sets are distinct hashes: a static video collapses to one " +
    "signature row per unique frame") {
    val still = frame(99)
    val corpus = Seq(video(9, Seq(still, still, still, frame(98)))).toDS()
    val fs = VideoNearDup.frameSets(corpus).collect()
    assert(fs.length === 2, s"expected 2 distinct hashes, got ${fs.length}")
  }
}
