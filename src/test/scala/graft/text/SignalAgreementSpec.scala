package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x78 — signal-agreement audit: tie-averaged rank exactness, planted
  * closed-form Spearman verdicts (monotone, anti-monotone through a
  * nonlinear map, constant-signal guard), and a full brute-force
  * differential (independent sort-based average ranks + BigInt moments)
  * on the real corpus.
  */
class SignalAgreementSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long)]) = rows.toDF("sa", "sb")

  test("x78: rank2Of emits twice the tie-averaged rank") {
    val df = Seq(10L, 20L, 20L, 30L).toDF("v")
    val got = TextQueries.rank2Of(df, "v", "r2")
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // avg ranks: 10 -> 1, 20 -> 2.5 (x2 = 5), 30 -> 4
    assert(got === Seq((10L, 2L), (20L, 5L), (20L, 5L), (30L, 8L)))
  }

  test("x78: monotone (nonlinear) signals read rho2 10000, agree 10000") {
    // sb = sa^3 is a nonlinear but monotone map: Spearman must be
    // perfect even though the relation is not linear
    val rows = (1L to 12L).map(i => (i, i * i * i))
    val out = TextQueries.agreementOf(pairs(rows)).collect().head
    assert(out.getLong(1) === 1L)
    assert(out.getLong(2) === 10000L)
    assert(out.getLong(5) === 10000L)
    // k = (12+1) div 2 = 6 -> med_a = 7, med_b = 343: hi = {7..12}
    assert(out.getLong(3) === 6L)
    assert(out.getLong(4) === 6L)
  }

  test("x78: anti-monotone signals read sign -1, rho2 10000, agree 0") {
    val rows = (1L to 10L).map(i => (i, -(i * i)))
    val out = TextQueries.agreementOf(pairs(rows)).collect().head
    assert(out.getLong(1) === -1L)
    assert(out.getLong(2) === 10000L)
    // med_a = 6 (5th largest), med_b = -25: the hi sets are disjoint
    assert(out.getLong(3) === 0L)
    assert(out.getLong(4) === 0L)
    assert(out.getLong(5) === 0L)
  }

  test("x78: a constant signal reads sign 0, rho2 0") {
    val rows = (1L to 8L).map(i => (i, 42L))
    val out = TextQueries.agreementOf(pairs(rows)).collect().head
    assert(out.getLong(1) === 0L)
    assert(out.getLong(2) === 0L)
  }

  test("x78: full query equals a BigInt brute force on the corpus") {
    val a = TextQueries.heuristicScores(spark, sfDir)
      .select(col("doc_id"), col("score6").as("sa"))
    val b = TextQueries.scoredQuality(spark, sfDir).select(col("doc_id"),
      expr("(wsum * CAST(1000000 AS BIGINT)) div n_toks").as("sb"))
    val collected = a.join(b, "doc_id").select("sa", "sb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = collected.length
    assert(n > 100)
    // independent tie-averaged ranks x2: sort-based, per distinct value
    def ranks2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      val byV = sorted.zipWithIndex.groupBy(_._1)
      byV.map { case (v, xs) =>
        // ranks are 1-based positions; avg*2 = first + last position + ...
        val idxs = xs.map(_._2 + 1)
        v -> (idxs.min.toLong + idxs.max.toLong)
      }
    }
    val ra = ranks2(collected.map(_._1))
    val rb = ranks2(collected.map(_._2))
    var (r1, r2s, raa, rbb, rab) =
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    collected.foreach { case (sa, sb) =>
      val (x, y) = (BigInt(ra(sa)), BigInt(rb(sb)))
      r1 += x; r2s += y; raa += x * x; rbb += y * y; rab += x * y
    }
    val bn = BigInt(n)
    val cov = bn * rab - r1 * r2s
    val (va, vb) = (bn * raa - r1 * r1, bn * rbb - r2s * r2s)
    val expSign = if (va == 0 || vb == 0) 0L else cov.signum.toLong
    val expR2 = if (va == 0 || vb == 0) 0L
      else ((cov * cov * 10000) / (va * vb)).toLong
    // medians: k-th largest counting multiplicity, k = (n+1)/2
    val k = ((n + 1) / 2).max(1)
    val medA = collected.map(_._1).sorted(Ordering[Long].reverse)(k - 1)
    val medB = collected.map(_._2).sorted(Ordering[Long].reverse)(k - 1)
    val bh = collected.count(p => p._1 >= medA && p._2 >= medB).toLong
    val bl = collected.count(p => p._1 < medA && p._2 < medB).toLong
    val agree = (BigInt(bh + bl) * 10000 / bn).toLong
    val got = graft.SparkEntry.queries("x78_signal_agreement")(spark, sfDir)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) ===
      ((n.toLong, expSign, expR2, bh, bl, agree)))
  }
}
