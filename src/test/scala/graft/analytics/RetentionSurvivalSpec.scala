package graft.analytics

import graft.SparkSpec

/** E15 Kaplan–Meier: the fixed-point fold against hand-computed
  * product-limit values (including the censoring-between-events case
  * the naive estimator gets wrong), plus engine-query invariants.
  */
class RetentionSurvivalSpec extends SparkSpec {

  test("kmFold: hand-computed product-limit, floor-exact, censoring " +
    "shrinks the risk set without an event") {
    // 10 at risk, 2 events at d=1 → S = 0.8; 2 censored leave before
    // d=3 (visible only through n_at_risk = 7); 1 event at d=3 →
    // S = 0.8 · 6/7, floored in 1e12 units
    val out = ExtendedSqlQueries.kmFold(Seq((1L, 10L, 2L), (3L, 7L, 1L)))
    assert(out === Seq(
      (1L, 10L, 2L, 800000000000L),
      (3L, 7L, 1L, 685714285714L)))
    // naive "survivors/total" at d=3 would read 5/8 = 0.625 — the
    // censored customers' survival information is what KM keeps
    assert(out.last._4 > 625000000000L)
  }

  test("kmFold: everyone churns on one day → survival exactly 0; " +
    "no events → identity") {
    assert(ExtendedSqlQueries.kmFold(Seq((5L, 4L, 4L)))
      === Seq((5L, 4L, 4L, 0L)))
    assert(ExtendedSqlQueries.kmFold(Nil) === Nil)
  }

  test("e16 logRankFold: hand-computed O/E/V on a 4-customer example, " +
    "and a planted fast-churning cohort flags while a balanced one " +
    "does not") {
    // day 1: n=4 (2 in A), both events from A; day 2: n=2 (0 in A),
    // 1 event from B. E_A = 2·2/4 = 1.0; O_A = 2;
    // V = [2·2·(4−2)·10⁶/((4−1)·16)]·… → t1 = 2·2·10⁶/3 = 1333333,
    // t2 = 2·2·10⁶/16 = 250000 → v12 = 333333250000; day-2 t2 = 0.
    // χ²·10⁴ = (10⁶)²·10⁴ // 333333250000 = 30000 (χ² = 3.0)
    val (o, e6, v12, chi2) = ExtendedSqlQueries.logRankFold(
      Seq((4L, 2L, 2L, 2L), (2L, 0L, 1L, 0L)))
    assert((o, e6, v12) === ((2L, 1000000L, 333333250000L)))
    assert(chi2 === 30000L, s"chi2=$chi2")
    // planted power check: cohort A (100) all churns by day 10 while
    // B (100) survives to day 100 — the statistic must scream
    val fast = (1L to 10L).map(day =>
      (200L - (day - 1) * 10, 100L - (day - 1) * 10, 10L, 10L)) :+
      (100L, 0L, 100L, 0L)
    val loud = ExtendedSqlQueries.logRankFold(fast)._4
    assert(loud > 38410L, s"planted separation must flag: $loud")
    // balanced: both cohorts churn identically → O ≈ E, below critical
    val same = (1L to 10L).map(day =>
      (200L - (day - 1) * 20, 100L - (day - 1) * 10, 20L, 10L))
    val quiet = ExtendedSqlQueries.logRankFold(same)._4
    assert(quiet < 38410L, s"identical curves must not flag: $quiet")
  }

  test("engine query on sf0.001: monotone nonincreasing survival, " +
    "risk set bounded by total customers, ordered event days") {
    val rows = ExtendedSqlQueries.e15RetentionSurvival.run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nCust = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    var prevS = 1000000000000L
    var prevD = -1L
    rows.foreach { r =>
      val (dur, n, e, sv) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dur > prevD, "event days must be strictly increasing")
      assert(n >= e && e >= 1L && n <= nCust)
      assert(sv <= prevS, s"survival must be nonincreasing at $dur")
      prevD = dur; prevS = sv
    }
  }
}
