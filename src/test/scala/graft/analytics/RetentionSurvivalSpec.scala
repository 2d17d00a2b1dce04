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
