package graft.streaming

import graft.SparkSpec
import graft.similarity.SpectralQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ST39 — streaming anisotropy drift: stream ≡ batch integer equality on
  * any batch split, replay idempotence, a planted spectral-drift alarm,
  * and the clean-corpus no-alarm guard.
  */
class EmbeddingDriftSpec extends SparkSpec {

  private def emb = Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  test("ST39: merged log over any batch split equals the batch x76 fold") {
    val base = EmbeddingDrift.fit(emb)
    val (vWhole, anisoWhole, meanWhole) =
      SpectralQueries.powerIteration(SpectralQueries.quantize(spark, emb))
    for (nSplits <- Seq(1, 3, 7)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-edrift-$nSplits").toString
      val m = new EmbeddingDrift.Monitor(base, s"$root/log")
      (0 until nSplits).foreach { b =>
        m.processBatch(emb.filter(pmod(col("vec_id"), lit(nSplits)) === b),
          b.toLong)
      }
      val g = m.merged(spark)
      val (v, aniso, mean) = SpectralQueries.powerIterationOf(g)
      assert(v.toSeq === vWhole.toSeq, s"split $nSplits: direction differs")
      assert(aniso === anisoWhole && mean === meanWhole)
      val st = m.status(spark).collect().head
      // identical corpus → identical direction → perfect alignment,
      // zero anisotropy rise, no alarm
      assert(st.getLong(st.fieldIndex("align_bp")) === 10000L)
      assert(st.getLong(st.fieldIndex("aniso_rise_bp")) === 0L)
      assert(!st.getBoolean(st.fieldIndex("drifted")))
    }
  }

  test("ST39: a replayed batch is a no-op (per-batch-dir overwrite)") {
    val base = EmbeddingDrift.fit(emb)
    val root = java.nio.file.Files.createTempDirectory("graft-edrift-r").toString
    val m = new EmbeddingDrift.Monitor(base, s"$root/log")
    m.processBatch(emb.filter(col("vec_id") % 2 === 0), 0L)
    m.processBatch(emb.filter(col("vec_id") % 2 === 1), 1L)
    val before = m.merged(spark)
    m.processBatch(emb.filter(col("vec_id") % 2 === 0), 0L) // replay
    val after = m.merged(spark)
    assert(after.n === before.n)
    assert(after.s.toSeq === before.s.toSeq)
    assert(after.cUpper.toSeq === before.cUpper.toSeq)
  }

  test("ST39: planted common-direction drift raises the alarm; the x83 " +
    "plant is the drift shape") {
    val base = EmbeddingDrift.fit(emb)
    // live traffic = the x83 corruption: a common bias direction with
    // per-doc amplitude — the encoder-regression shape this monitor
    // exists to catch (planted top-direction share ~51% vs the clean
    // corpus's ~2%, measured in SpectralSpec)
    val live = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS FLOAT) + " +
        "CAST(0.0625 * (vec_id % 7 + 1) AS FLOAT))").as("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft-edrift-d").toString
    val m = new EmbeddingDrift.Monitor(base, s"$root/log")
    (0 until 3).foreach { b =>
      m.processBatch(live.filter(pmod(col("vec_id"), lit(3)) === b), b.toLong)
    }
    val st = m.status(spark).collect().head
    val rise = st.getLong(st.fieldIndex("aniso_rise_bp"))
    assert(rise > 1500L, s"planted drift did not raise anisotropy: $rise bp")
    assert(st.getBoolean(st.fieldIndex("drifted")))
  }

  test("ST39: streaming drive over two file drops equals the direct fold") {
    val base = EmbeddingDrift.fit(emb)
    val root = java.nio.file.Files.createTempDirectory("graft-edrift-s").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val m = new EmbeddingDrift.Monitor(base, s"$root/log")
    emb.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    val q = m.start(spark, in, s"$root/ckpt")
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") % 2 === 1).coalesce(1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()
    val g = m.merged(spark)
    val whole = SpectralQueries.gramStats(
      SpectralQueries.quantize(spark, emb))
    assert(g.n === whole.n)
    assert(g.s.toSeq === whole.s.toSeq)
    assert(g.cUpper.toSeq === whole.cUpper.toSeq)
  }
}
