package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import org.apache.spark.sql.functions._

/** X85 cross-modal paired dedup: a planted cross-modal dup family drives
  * REAL image clusters ([[Multimodal.imageDupClusters]] over actual PNG
  * payloads) and a planted text cluster map through the production join
  * shape — per-pair verdicts and the census are exact.
  */
class CrossModalSpec extends SparkSpec {

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Smooth broad-spectrum texture (the PerceptualHashSpec fixture —
    * pHash is specified for natural images, not degenerate ramps).
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

  private def texturedPerturbed(seed: Int): BufferedImage = {
    val img = textured(seed)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0xffffff)
    img
  }

  test("x85 core: planted cross-modal dup family — per-pair verdicts and " +
    "census over REAL image clusters") {
    import spark.implicits._
    def row(id: Long, img: BufferedImage) = {
      val bytes = png(img)
      Multimodal.MediaRow(id, bytes, Multimodal.MediaMeta("image", "png",
        Some(64), Some(64), None, bytes.length.toLong))
    }
    // image side: families {3,4} and {5,6} planted as near-dup payloads;
    // 1,2,7,8 distinct textures. Seeds measured pairwise ≥ 12 pHash bits
    // apart (the phase wraps at 2π/0.05 ≈ 126, so naive spacing
    // collides), keeping every cross distance > 6 even after the
    // perturbation's ≤ 6-bit drift.
    val media = spark.createDataset(Seq(
      row(1, textured(31)), row(2, textured(63)),
      row(3, textured(0)), row(4, texturedPerturbed(0)),
      row(5, textured(40)), row(6, texturedPerturbed(40)),
      row(7, textured(77)), row(8, textured(94))))
    val imgClusters = Multimodal.imageDupClusters(media)
    // sanity: EXACTLY the two planted image families (an accidental
    // extra pairing must fail loudly, not skew the verdicts)
    val fam = imgClusters.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toList).toMap
    assert(fam === Map(3L -> List(3L, 4L), 5L -> List(5L, 6L)),
      s"unexpected image clusters: $fam")
    val imgCc = imgClusters
      .select(col("canonical_id").as("lbl"), explode(col("members")).as("node"))
      .select("node", "lbl")
    // text side: families {1,2} and {5,6} — so pair 5 is the cross-modal
    // dup family whose canonicals ALIGN (kept), pair 6 is drop_both
    val textCc = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "lbl")
    val pairs = (1L to 8L).map(i => (i, i, i))
      .toDF("pair_id", "text_id", "image_id")
    val flags = CrossModalQueries.pairedFlags(pairs, textCc, imgCc)
    val st = flags.collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("status"))).toMap
    assert(st === Map(
      1L -> "kept",       // text canonical
      2L -> "drop_text",  // text non-canonical
      3L -> "kept",       // image canonical
      4L -> "drop_image", // image non-canonical
      5L -> "kept",       // BOTH canonical — the aligned dup family survives once
      6L -> "drop_both",  // non-canonical on both sides
      7L -> "kept", 8L -> "kept"), s"verdicts: $st")
    val cens = CrossModalQueries.census(flags).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cens === Map("drop_both" -> 1L, "drop_image" -> 1L,
      "drop_text" -> 1L, "kept" -> 5L))
  }

  test("x85 census zero-fills absent statuses (stable row set across SFs)") {
    import spark.implicits._
    val flags = CrossModalQueries.pairedFlags(
      Seq((1L, 1L, 1L), (2L, 2L, 2L)).toDF("pair_id", "text_id", "image_id"),
      Seq((1L, 1L), (2L, 1L)).toDF("node", "lbl"),
      spark.emptyDataset[(Long, Long)].toDF("node", "lbl"))
    val cens = CrossModalQueries.census(flags).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(cens.toSeq === Seq(("drop_both", 0L), ("drop_image", 0L),
      ("drop_text", 1L), ("kept", 1L)))
  }

  test("x86 split leakage: planted cross-modal leaks — text-side, " +
    "image-side, and the test-only cluster that must NOT count") {
    import spark.implicits._
    // pairs 1..8: train = {1,3,7}, test = {2,4,5,6,8}
    val pairs = Seq(
      (1L, true), (2L, false), (3L, true), (4L, false),
      (5L, false), (6L, false), (7L, true), (8L, false))
      .map { case (i, tr) => (i, i, i, tr) }
      .toDF("pair_id", "text_id", "image_id", "is_train")
    // text clusters: {1,2} (1 is train → 2 leaks via text),
    //                {5,6} (BOTH test → no leak: the trap case)
    val textCc = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("node", "lbl")
    // image clusters: {3,4} (3 is train → 4 leaks via image),
    //                 {2,8} — 2 and 8 both test → no image leak
    val imgCc = Seq((3L, 3L), (4L, 3L), (2L, 2L), (8L, 2L))
      .toDF("node", "lbl")
    val flags = CrossModalQueries.splitLeakFlags(pairs, textCc, imgCc)
    val byId = flags.collect().map(r => r.getLong(0) ->
      (r.getBoolean(r.fieldIndex("leak_text")),
        r.getBoolean(r.fieldIndex("leak_image")))).toMap
    assert(byId(2L) === ((true, false)), s"pair 2 must leak via text: $byId")
    assert(byId(4L) === ((false, true)), s"pair 4 must leak via image: $byId")
    assert(byId(5L) === ((false, false)) && byId(6L) === ((false, false)),
      s"test-only cluster must not leak: $byId")
    assert(byId(8L) === ((false, false)), s"test-only image pair: $byId")
    Seq(1L, 3L, 7L).foreach(i =>
      assert(byId(i) === ((false, false)), s"train pair $i flagged: $byId"))
    val rep = CrossModalQueries.leakReport(flags).collect().head
    assert(rep.getLong(rep.fieldIndex("n_train")) === 3L)
    assert(rep.getLong(rep.fieldIndex("n_test")) === 5L)
    assert(rep.getLong(rep.fieldIndex("n_leak_text")) === 1L)
    assert(rep.getLong(rep.fieldIndex("n_leak_image")) === 1L)
    assert(rep.getLong(rep.fieldIndex("n_leak_either")) === 2L)
    assert(rep.getLong(rep.fieldIndex("n_leak_both")) === 0L)
    assert(rep.getLong(rep.fieldIndex("leak_bp")) === 4000L)
  }

  test("x85 engine query runs on sf0.001 with the fixed status rows") {
    val out = CrossModalQueries.x85CrossModalPairs.run(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq ===
      Seq("drop_both", "drop_image", "drop_text", "kept"))
    assert(out.map(_.getLong(1)).sum > 0L)
  }

  test("x88 split producer: pair-link components merge across modalities " +
    "(text chain + image bridge = ONE component), whole components land " +
    "on one side, and x86's audit on the produced split reads ZERO") {
    import spark.implicits._
    // text clusters {1,2} and {3,4}; image cluster {2,3} BRIDGES them:
    // pairs 1-4 must land in one component. Image cluster {7,8} is its
    // own component; 5, 6, 9, 10 are singletons.
    val textCc = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("node", "lbl")
    val imgCc = Seq((2L, 2L), (3L, 2L), (7L, 7L), (8L, 7L))
      .toDF("node", "lbl")
    val pairs = (1L to 10L).map(i => (i, i, i))
      .toDF("pair_id", "text_id", "image_id")
    val split = CrossModalQueries.pairedSplit(spark,
      s"x88spec/${System.nanoTime()}", pairs, textCc, imgCc)
    val grp = split.collect().map(r => r.getLong(0) ->
      (r.getLong(r.fieldIndex("grp")), r.getBoolean(r.fieldIndex("is_train"))))
      .toMap
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(grp(i)._1 === 1L,
      s"pair $i not in the bridged component: $grp"))
    assert(grp(7L)._1 === 7L && grp(8L)._1 === 7L)
    Seq(5L, 6L, 9L, 10L).foreach(i => assert(grp(i)._1 === i))
    // component-atomic sides: every member of a component shares is_train
    assert(Seq(1L, 2L, 3L, 4L).map(grp(_)._2).distinct.size === 1)
    assert(grp(7L)._2 === grp(8L)._2)
    assert(!grp(9L)._2, "grp 9 % 10 = 9 must be test")
    // the audit the producer exists to zero: x86's report on this split
    val rep = CrossModalQueries.leakReport(CrossModalQueries.splitLeakFlags(
      split.select("pair_id", "text_id", "image_id", "is_train"),
      textCc, imgCc)).collect().head
    assert(rep.getLong(rep.fieldIndex("n_leak_text")) === 0L)
    assert(rep.getLong(rep.fieldIndex("n_leak_image")) === 0L)
    assert(rep.getLong(rep.fieldIndex("leak_bp")) === 0L)
  }

  test("x88 engine query on sf0.001: zero leakage by construction, sane " +
    "component census") {
    val r = CrossModalQueries.x88PairedSplitProducer.run(spark, sfDir)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_leak_text")) === 0L)
    assert(r.getLong(r.fieldIndex("n_leak_image")) === 0L)
    assert(r.getLong(r.fieldIndex("n_leak_either")) === 0L)
    assert(r.getLong(r.fieldIndex("leak_bp")) === 0L)
    val nTrain = r.getLong(r.fieldIndex("n_train"))
    val nTest = r.getLong(r.fieldIndex("n_test"))
    assert(nTrain + nTest > 0L)
    assert(r.getLong(r.fieldIndex("n_components")) > 0L)
    assert(r.getLong(r.fieldIndex("max_component_pairs")) <= nTrain + nTest)
  }

  test("x89 alignment: planted parallel / anti-parallel / orthogonal " +
    "text-image pairs score exactly 1 / -1 / 0 — the mismatched pair " +
    "flags below any sane threshold") {
    import spark.implicits._
    // text vectors in bucket space (doc_id, bucket, wsum): all three
    // docs carry the (3, 4) vector in buckets 0/1
    val w = Seq((1L, 0L, 3L), (1L, 1L, 4L),
      (2L, 0L, 3L), (2L, 1L, 4L),
      (3L, 0L, 3L), (3L, 1L, 4L)).toDF("doc_id", "bucket", "wsum")
    // image embeddings quantized: 1 parallel, 2 anti-parallel (the
    // planted MISMATCH), 3 orthogonal
    val embq = Seq((1L, 0L, 30L), (1L, 1L, 40L),
      (2L, 0L, -30L), (2L, 1L, -40L),
      (3L, 0L, 40L), (3L, 1L, -30L)).toDF("vec_id", "bucket", "qv")
    val agree = CrossModalQueries.alignmentScores(w, embq).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(agree(1L) === 1.0)
    assert(agree(2L) === -1.0, s"planted mismatch not flagged: $agree")
    assert(agree(3L) === 0.0)
    val flagged = agree.filter(_._2 < 0.5).keySet
    assert(flagged === Set(2L, 3L))
  }

  test("x89 engine query on sf0.001: decile census within [-10, 10] and " +
    "covers every pair") {
    val rows = CrossModalQueries.x89CrossModalAlignment.run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(d >= -10L && d <= 10L, s"decile out of range: $d")
      assert(r.getLong(1) > 0L)
    }
  }

  test("x90 retrieval ranks: planted aligned pair ranks 1; a scaled " +
    "duplicate image ties exactly and the smaller vec_id wins; " +
    "unpaired queries drop") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    def arr(vals: (Int, Long)*): Array[Long] = {
      val a = Array.fill(64)(0L)
      vals.foreach { case (i, v) => a(i) = v }
      a
    }
    def ss(a: Array[Long]): Long = a.map(x => x * x).sum
    // queries: q5 = e0, q9 = e1, q11 has no paired image (must drop)
    val q5 = arr(0 -> 1L); val q9 = arr(1 -> 1L); val q11 = arr(2 -> 1L)
    val qvecs = Seq((5L, q5, ss(q5)), (9L, q9, ss(q9)), (11L, q11, ss(q11)))
      .toDF("q_doc", "qarr", "tss")
    // images: v1 = 2·e0 (scaled dup of q5's true image — cosine ties at
    // 1.0 exactly), v5 = e0 (true for q5), v7 = e0+e1 (cos 1/√2 to
    // both), v9 = e1 (true for q9)
    val imgs = Seq(
      (1L, arr(0 -> 2L)), (5L, arr(0 -> 1L)),
      (7L, arr(0 -> 1L, 1 -> 1L)), (9L, arr(1 -> 1L)))
      .map { case (id, a) => (id, a, ss(a)) }
      .toDF("vec_id", "iarr", "iss")
    val out = CrossModalQueries.retrievalRanks(qvecs, imgs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getDouble(4)))).toMap
    // q5: v1 ties agree=1.0, vec_id 1 < 5 counts as better → rank 2
    assert(out(5L) === ((2L, false, true, 1.0)), s"q5: ${out(5L)}")
    // q9: own image is the unique cosine-1 → rank 1
    assert(out(9L) === ((1L, true, true, 1.0)), s"q9: ${out(9L)}")
    assert(!out.contains(11L), "unpaired query must drop")
  }

  test("x90 engine query on sf0.001: one row per paired sampled caption, " +
    "ranks within [1, n_images], flags consistent") {
    import spark.implicits._
    val rows = CrossModalQueries.x90CrossModalRetrieval.run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nImg = graft.sources.Tables.load(spark, sfDir, "embeddings").count()
    rows.foreach { r =>
      val (rank, h1, h10) =
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3))
      assert(rank >= 1L && rank <= nImg, s"rank out of range: $r")
      assert(h1 === (rank == 1L) && h10 === (rank <= 10L), s"flags: $r")
      assert(r.getLong(0) % 101 === 0L)
    }
  }
}
