package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** aHash perceptual image dedup: hashing is deterministic, near-identical
  * images land within the Hamming budget, unrelated images do not, and
  * the band-blocked pair mining finds exactly the planted near-dups.
  */
class PerceptualHashSpec extends SparkSpec {

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Horizontal gradient with a seeded phase. */
  private def gradient(seed: Int, w: Int = 64, h: Int = 64): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 4 + seed) % 256)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** The same gradient with a small corner defect (a near-duplicate). */
  private def perturbed(seed: Int): BufferedImage = {
    val img = gradient(seed)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0xffffff)
    img
  }

  /** A checkerboard — structurally unrelated to any gradient. */
  private def checker(cellPx: Int): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val on = ((x / cellPx) + (y / cellPx)) % 2 == 0
      img.setRGB(x, y, if (on) 0xffffff else 0x000000)
    }
    img
  }

  test("aHash: deterministic, uniform image hashes to 0, small edits stay close") {
    val a = Multimodal.aHash(png(gradient(0)))
    val a2 = Multimodal.aHash(png(gradient(0)))
    assert(a.isRight && a === a2, "same bytes must hash identically")
    val uniform = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    assert(Multimodal.aHash(png(uniform)) === Right(0L))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val near = Multimodal.aHash(png(perturbed(0)))
    assert(ham(a.toOption.get, near.toOption.get) <= 6,
      s"near-dup drifted ${ham(a.toOption.get, near.toOption.get)} bits")
    val far = Multimodal.aHash(png(checker(8)))
    assert(ham(a.toOption.get, far.toOption.get) > 6,
      "unrelated image must not be within the near-dup budget")
    assert(Multimodal.aHash(png(gradient(0, 4, 4))).isLeft, "too-small rejected")
    assert(Multimodal.aHash(Array[Byte](1, 2, 3)).isLeft, "garbage rejected")
  }

  test("band-blocked pair mining finds exactly the planted near-dup pairs") {
    import spark.implicits._
    def row(id: Long, bytes: Array[Byte]) = Multimodal.MediaRow(id, bytes,
      Multimodal.MediaMeta("image", "png", Some(64), Some(64), None,
        bytes.length.toLong))
    val media = spark.createDataset(Seq(
      row(1, png(gradient(0))), row(2, png(perturbed(0))), // planted pair
      row(3, png(gradient(128))), row(4, png(perturbed(128))), // planted pair
      row(5, png(checker(8))), row(6, png(checker(4))), // unrelated
      row(7, Array[Byte](9, 9, 9)))) // undecodable: drops, no failure
    val pairs = Multimodal.nearDupImagePairs(media)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L), (3L, 4L)),
      s"expected exactly the planted pairs, got ${pairs.toSeq}")
  }
}
