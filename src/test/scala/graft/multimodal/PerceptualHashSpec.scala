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

  /** Smooth broad-spectrum 2D texture: several incommensurate waves so
    * the DCT energy spreads across the low-frequency 8×8 window. pHash
    * thresholds 63 coefficients at their median — an image with a
    * DEGENERATE spectrum (the 1-D `gradient` ramp: all energy in one
    * row of coefficients, the rest ≈ 0) leaves most coefficients tied
    * at the median where any perturbation flips them, which is the
    * documented reason pHash is specified for natural images. The
    * waves' max frequency (0.6 rad/px, ~10 px wavelength) keeps the
    * image smooth at the 2 px scale so nearest-neighbor subsampling ≈
    * block pooling and the rescale probe is meaningful.
    */
  private def textured(seed: Int, w: Int = 64, h: Int = 64): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = seed * 0.05
      val v0 = 128.0 +
        30 * StrictMath.sin(x * 0.35 + s) * StrictMath.cos(y * 0.22) +
        25 * StrictMath.sin(x * 0.11 + y * 0.40 + s) +
        20 * StrictMath.cos(x * 0.60) * StrictMath.sin(y * 0.13 + s) +
        15 * StrictMath.sin((x - y) * 0.27)
      val v = math.max(0, math.min(255, v0.round.toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  /** The same texture with a small corner defect (a near-duplicate). */
  private def texturedPerturbed(seed: Int): BufferedImage = {
    val img = textured(seed)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0xffffff)
    img
  }

  /** Deterministic 2× box-average downscale (no Graphics2D — its
    * interpolation is JDK-dependent): the rescale-robustness probe.
    */
  private def halved(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth / 2, img.getHeight / 2,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until out.getHeight; x <- 0 until out.getWidth) {
      val v = (0 until 4).map { i =>
        img.getRGB(x * 2 + i % 2, y * 2 + i / 2) & 0xff
      }.sum / 4
      out.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    out
  }

  test("pHash: deterministic, structure-sensitive, rescale-robust") {
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val a = Multimodal.pHash(png(textured(0)))
    assert(a.isRight && a === Multimodal.pHash(png(textured(0))))
    // small local edit: a few bits
    val near = Multimodal.pHash(png(texturedPerturbed(0)))
    assert(ham(a.toOption.get, near.toOption.get) <= 6,
      s"near-dup drifted ${ham(a.toOption.get, near.toOption.get)} bits")
    // structurally unrelated: far
    val far = Multimodal.pHash(png(checker(8)))
    assert(ham(a.toOption.get, far.toOption.get) > 6)
    val other = Multimodal.pHash(png(textured(77)))
    assert(ham(a.toOption.get, other.toOption.get) > 6,
      "different texture phase must not collide")
    // the pHash claim aHash can't make: a 2x downscaled re-encode keeps
    // the frequency structure
    val scaled = Multimodal.pHash(png(halved(textured(0))))
    assert(ham(a.toOption.get, scaled.toOption.get) <= 6,
      s"rescale drifted ${ham(a.toOption.get, scaled.toOption.get)} bits")
    assert(Multimodal.pHash(png(textured(0, 16, 16))).isLeft, "too-small rejected")
    assert(Multimodal.pHash(Array[Byte](1, 2, 3)).isLeft, "garbage rejected")
  }

  test("DCT pair mining finds the planted near-dups and the rescaled copy") {
    import spark.implicits._
    def row(id: Long, bytes: Array[Byte]) = Multimodal.MediaRow(id, bytes,
      Multimodal.MediaMeta("image", "png", Some(64), Some(64), None,
        bytes.length.toLong))
    val media = spark.createDataset(Seq(
      row(1, png(textured(0))), row(2, png(texturedPerturbed(0))), // planted pair
      row(3, png(halved(textured(0)))), // rescaled copy of 1 (and near 2)
      row(4, png(checker(8))), // unrelated
      row(5, Array[Byte](9, 9, 9)))) // undecodable: drops, no failure
    val pairs = Multimodal.nearDupImagePairsDct(media)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 3L)),
      s"rescaled copy must pair with its original, got ${pairs.toSeq}")
    assert(pairs.contains((1L, 2L)), s"planted pair missing: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image must not pair: ${pairs.toSeq}")
  }

  test("image dup clusters: transitive family collapses to one canonical") {
    import spark.implicits._
    def row(id: Long, bytes: Array[Byte]) = Multimodal.MediaRow(id, bytes,
      Multimodal.MediaMeta("image", "png", Some(64), Some(64), None,
        bytes.length.toLong))
    val media = spark.createDataset(Seq(
      // one transitive family: original, perturbed, rescaled copy
      row(1, png(textured(0))), row(2, png(texturedPerturbed(0))),
      row(3, png(halved(textured(0)))),
      // a second, separate pair
      row(10, png(textured(40))), row(11, png(texturedPerturbed(40))),
      // unrelated and undecodable: never enter any cluster
      row(20, png(checker(8))), row(21, Array[Byte](9, 9, 9))))
    val clusters = Multimodal.imageDupClusters(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    assert(clusters(1L) === List(1L, 2L, 3L),
      s"family must collapse under canonical 1: $clusters")
    assert(clusters(10L) === List(10L, 11L), s"second pair: $clusters")
    assert(clusters.keySet === Set(1L, 10L),
      s"unrelated/undecodable images must not cluster: $clusters")
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
