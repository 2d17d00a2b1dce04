package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x77 — scorer calibration/AUC audit: closed-form planted AUCs
  * (perfect ranking, pure ties, a hand tie-mix), truncation-toward-zero
  * pins on negative decile means, and a full brute-force differential
  * (O(n²) BigInt pair count + sorted-list boundaries) on the real
  * corpus.
  */
class ScorerCalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def planted(rows: Seq[(Long, Long)]) =
    rows.toDF("pos", "score")

  test("x77: perfect separation scores AUC 10000; calibration is a step") {
    // 10 positives above every negative
    val rows = (0L until 10L).map(i => (0L, i)) ++
      (0L until 10L).map(i => (1L, 100L + i))
    val out = TextQueries.calibrationOf(planted(rows))
      .orderBy("decile").collect()
    assert(out.forall(_.getLong(5) === 10000L))
    // top 5 deciles (scores 100..109) all curated, bottom 5 none
    out.foreach { r =>
      val (dec, curBp) = (r.getLong(0), r.getLong(3))
      assert(curBp === (if (dec >= 6) 10000L else 0L),
        s"decile $dec curated_bp $curBp")
    }
    // 20 docs -> every decile has exactly 2
    assert(out.map(_.getLong(1)).toSeq === Seq.fill(10)(2L))
  }

  test("x77: all-tied scores read AUC 5000 (pure-tie half credit)") {
    val rows = Seq.fill(7)((1L, 42L)) ++ Seq.fill(13)((0L, 42L))
    val out = TextQueries.calibrationOf(planted(rows)).collect()
    // one distinct score -> all boundaries equal it -> a single decile
    assert(out.length === 1)
    assert(out.head.getLong(5) === 5000L)
    assert(out.head.getLong(1) === 20L)
    assert(out.head.getLong(2) === 7L)
    assert(out.head.getLong(3) === 3500L)
  }

  test("x77: hand tie-mix matches the closed form") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs pos>neg: (3,2),(3,1),(2,1) = 3; ties: (2,2) = 1
    // AUC = (2*3 + 1) / (2*2*2) = 7/8 -> 8750 bp
    val rows = Seq((1L, 3L), (1L, 2L), (0L, 2L), (0L, 1L))
    val out = TextQueries.calibrationOf(planted(rows)).collect()
    assert(out.head.getLong(5) === 8750L)
  }

  test("x77: negative decile mean truncates toward zero on both engines") {
    // one decile holding scores {-7, 0}: sum -7 over 2 docs -> mean -3
    // (truncation), not -4 (floor) — the Spark `div` / DuckDB `//`
    // agreement this operator relies on
    val rows = Seq((0L, -7L), (1L, 0L))
    val out = TextQueries.calibrationOf(planted(rows))
      .orderBy("decile").collect()
    val all = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // n=2 -> k_i = max(2i/10, 1): ranks 1..4 -> k=1 (score 0), 5..9 -> k=1
    // for i<5... (i*2) div 10 = 0 for i<5 -> k=1; i>=5 -> k=1 exactly at
    // i=5, 1 for 6,7 ((12,14) div 10 = 1), 1 at i=8 (16 div 10 = 1),
    // 1 at i=9 (18 div 10 = 1) -> every boundary = 0 (the 1st largest)
    // -7 < 0 on all nine -> decile 1; 0 lands in decile 10
    assert(all === Seq((1L, 1L, -7L), (10L, 1L, 0L)))
  }

  test("x77: full query equals an O(n^2) BigInt brute force on the corpus") {
    val scored = TextQueries.scoredQuality(spark, sfDir).select(
      col("source").isInCollection(TextQueries.CURATED_SOURCES)
        .cast("long").as("pos"),
      expr("(wsum * CAST(1000000 AS BIGINT)) div n_toks").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = scored.filter(_._1 == 1L).map(_._2)
    val neg = scored.filter(_._1 == 0L).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    // brute-force tie-aware AUC
    var wins2 = BigInt(0)
    for (p <- pos; n <- neg) {
      if (p > n) wins2 += 2 else if (p == n) wins2 += 1
    }
    val aucBp = (wins2 * 10000 /
      (BigInt(2) * pos.length * neg.length)).toLong // trunc (non-negative)
    // boundaries: k-th largest counting multiplicity, k = (i*n) div 10
    val desc = scored.map(_._2).sorted(Ordering[Long].reverse)
    val nAll = desc.length.toLong
    val thr = (1 to 9).map(i => desc(((i * nAll) / 10).max(1L).toInt - 1))
    def decOf(s: Long): Long = 10L - thr.count(t => s < t)
    val census = scored.groupBy(x => decOf(x._2)).map { case (d, xs) =>
      val ss = xs.map(x => BigInt(x._2)).sum
      (d, xs.length.toLong, xs.count(_._1 == 1L).toLong,
        xs.count(_._1 == 1L).toLong * 10000 / xs.length,
        (ss / xs.length).toLong, aucBp) // BigInt / truncates toward zero
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("x77_scorer_calibration")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === census)
    // the corpus scorer genuinely ranks: AUC above coin flip
    assert(aucBp > 5000L)
  }
}
