package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** x76 — matrix-free power iteration: planted-axis exactness + a
  * single-threaded BigInt differential on the real corpus.
  */
class SpectralSpec extends SparkSpec {

  test("x76: planted single-axis corpus puts all loading on that axis") {
    import spark.implicits._
    // symmetric spread along dim 3 only → S = 0, centered variance
    // entirely on one axis: loading must be exactly ±1000 e3 and the
    // top-direction share exactly 10000 bp
    val rows = Seq(-0.5f, -0.25f, 0.25f, 0.5f).zipWithIndex.map {
      case (a, i) =>
        (i.toLong, Array.tabulate(64)(d => if (d == 2) a else 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (loading, anisoBp, meanMassBp) =
      SpectralQueries.powerIteration(SpectralQueries.quantize(spark, df))
    assert(math.abs(loading(2)) === 1000L)
    (0 until 64).filter(_ != 2).foreach(i => assert(loading(i) === 0L))
    assert(anisoBp === 10000L)
    assert(meanMassBp === 0L)
  }

  test("x76: distributed run equals a single-threaded BigInt fold") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    val q = emb.map(_.map(x => math.floor(x.toDouble * 1e4).toLong))
    val dim = 64
    val n = BigInt(q.length)
    val sv = Array.tabulate(dim)(i => q.map(r => BigInt(r(i))).sum)
    val qq = q.map(r => BigInt(r.map(x => x * x).sum)).sum
    var v = Array.fill(dim)(BigInt(1000))
    var vPrev = v
    var tLast = Array.fill(dim)(BigInt(0))
    for (_ <- 1 to 6) {
      val s = q.map(r => BigInt((0 until dim).map(i => r(i) * v(i).toLong).sum))
      val u = Array.tabulate(dim)(i =>
        q.zip(s).map { case (r, sd) => BigInt(r(i)) * sd }.sum)
      val sDotV = (0 until dim).map(i => sv(i) * v(i)).sum
      val t = Array.tabulate(dim)(i => n * u(i) - sv(i) * sDotV)
      val m = t.map(_.abs).max.max(BigInt(1))
      vPrev = v; tLast = t
      v = t.map(x => (x * 1000) / m) // truncating, matching DuckDB //
    }
    val rayNum = (0 until dim).map(i => vPrev(i) * tLast(i)).sum
    val rayDen = (0 until dim).map(i => vPrev(i) * vPrev(i)).sum
    val ssum = sv.map(x => x * x).sum
    val expAniso = (rayNum * 10000) / (rayDen * (n * qq - ssum))
    val expMean = (ssum * 10000) / (n * qq)

    val out = graft.SparkEntry
      .queries("x76_embedding_anisotropy")(spark, sfDir)
      .orderBy("dim").collect()
    assert(out.length === 64)
    (0 until dim).foreach { i =>
      assert(out(i).getLong(0) === (i + 1).toLong)
      assert(out(i).getLong(1) === v(i).toLong, s"loading dim ${i + 1}")
    }
    assert(out.head.getLong(2) === expAniso.toLong)
    assert(out.head.getLong(3) === expMean.toLong)
    // sanity: the fold found a genuinely dominant direction, not noise
    assert(out.head.getLong(2) > 0L)
  }

  test("x83: the planted corruption creates the pathology ABTT corrects") {
    // the raw synthetic corpus is nearly isotropic (top direction ~2% of
    // centered variance — and label-discriminative, so removing it HURTS
    // recall; measured before the planted design was frozen). The x83
    // audit corpus plants a common bias direction with per-doc amplitude,
    // which must dominate the spectrum the way real sentence-embedding
    // anisotropy does — that is what makes the corrected-beats-raw claim
    // a test of the FIX, not an accident of the generator.
    val (_, rawAniso, _) = SpectralQueries.powerIteration(
      SpectralQueries.quantize(spark,
        graft.sources.Tables.load(spark, sfDir, "embeddings")))
    val (_, plantedAniso, _) = SpectralQueries.powerIteration(
      SpectralQueries.corruptedFrame(spark, sfDir)
        .select(col("vec_id"), col("qc").as("q")))
    assert(rawAniso < 1000L, s"raw corpus unexpectedly anisotropic: $rawAniso bp")
    assert(plantedAniso > 4000L,
      s"plant failed to dominate the spectrum: $plantedAniso bp")
  }

  test("x84: planted private-direction family reads rank-1 and orthogonal") {
    import spark.implicits._
    // family 1: pure multiples of the uniform direction g = (1,…,1)/8 —
    // rank-1 centered variance entirely along g; family 0: symmetric
    // spread along axis 3 only, smaller variance — rank-1 along e3 ⊥ g
    // up to g's 1/64 component share
    val rows =
      (1 to 20).map(k => (0L + k, 1L,
        Array.tabulate(64)(_ => 0.01f * k))) ++
      Seq(-0.02f, -0.01f, 0.01f, 0.02f).zipWithIndex.map { case (a, i) =>
        (100L + i, 0L, Array.tabulate(64)(d => if (d == 2) a else 0.0f))
      }
    val df3 = rows.toDF("vec_id", "lab", "embedding")
    val lf = SpectralQueries.quantize(spark,
        df3.select("vec_id", "embedding"))
      .join(df3.select("vec_id", "lab"), "vec_id")
      .select(col("lab"), col("q"))
    val per = SpectralQueries.gramStatsBy(lf)
    assert(per.keySet === Set(0L, 1L))
    val global = per.values.reduce { (a, b) =>
      SpectralQueries.GramStats(a.n + b.n,
        Array.tabulate(a.s.length)(i => a.s(i) + b.s(i)),
        Array.tabulate(a.cUpper.length)(i => a.cUpper(i) + b.cUpper(i)))
    }
    def fold(g: SpectralQueries.GramStats) = {
      val (v, vPrev, tLast) = SpectralQueries.iterate(g)
      val rayNum = vPrev.indices.map(i => vPrev(i) * tLast(i)).sum
      val rayDen = vPrev.map(x => x * x).sum
      val ssum = g.s.map(x => x * x).sum
      val aniso = ((rayNum * 10000) / (rayDen * (g.n * g.qq - ssum)).max(1)).toLong
      (v, aniso)
    }
    val (v1, aniso1) = fold(per(1L))
    val (v0, aniso0) = fold(per(0L))
    val (vg, _) = fold(global)
    assert(aniso1 === 10000L, s"rank-1 family must read 10000, got $aniso1")
    assert(aniso0 === 10000L)
    def alignBp(v: Array[Long]) = {
      val dg = v.indices.map(i => BigInt(v(i)) * BigInt(vg(i))).sum
      val vv = v.map(x => BigInt(x) * BigInt(x)).sum
      val gg = vg.map(x => BigInt(x) * BigInt(x)).sum
      ((dg * dg * 10000) / (vv * gg).max(1)).toLong
    }
    // family 1 dominates global variance → global top ≈ g; family 0's
    // axis has only g's 1/64 component share
    assert(alignBp(v1) > 9900L, s"dominant family misaligned: ${alignBp(v1)}")
    assert(alignBp(v0) < 1000L, s"orthogonal family aligned: ${alignBp(v0)}")
  }

  test("x84's global (-1) row equals x76 on the same corpus") {
    val x84 = graft.SparkEntry.queries("x84_family_spectra")(spark, sfDir)
      .filter(col("label") === -1L).collect().head
    val x76 = graft.SparkEntry
      .queries("x76_embedding_anisotropy")(spark, sfDir).collect().head
    assert(x84.getLong(x84.fieldIndex("aniso_bp")) ===
      x76.getLong(x76.fieldIndex("aniso_bp")))
    assert(x84.getLong(x84.fieldIndex("mean_mass_bp")) ===
      x76.getLong(x76.fieldIndex("mean_mass_bp")))
  }

  test("x83: corrected-space label recall >= raw-space (the ABTT claim)") {
    val out = graft.SparkEntry
      .queries("x83_anisotropy_correction")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set("abtt", "raw"))
    val (nqA, hitsA, slotsA, bpA) = out("abtt")
    val (nqR, hitsR, slotsR, bpR) = out("raw")
    // both spaces rank the same query set over the same corpus
    assert(nqA === nqR && slotsA === slotsR && slotsA === nqA * 10)
    // the operator's claim: removing mean + top direction of the planted
    // anisotropic space recovers retrieval quality
    assert(hitsA >= hitsR, s"ABTT lost recall: $hitsA < $hitsR")
    assert(bpA >= bpR)
    assert(bpA === hitsA * 10000 / slotsA)
  }
}
