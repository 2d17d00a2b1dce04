package graft.text

import graft.SparkSpec

/** x71 water-fill invariants: the budget is spent to within one token
  * per uncapped source, capped tiers sit exactly at their repetition
  * limit, and every uncapped source fills to the SAME level λ, which
  * must sandwich strictly between the last capped and first uncapped
  * tier limits.
  */
class EpochWaterfillSpec extends SparkSpec {

  test("x71: budget exhausted to floor precision, caps exact, one fill level") {
    val rows = CurationQueries.x71EpochWaterfill.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("unique_tokens"), r.getAs[Long]("rep_cap"),
        r.getAs[Long]("allocated_tokens"), r.getAs[Long]("epochs_bp")))
    val t = 2L * rows.map(_._2).sum
    val capped = rows.filter(r => r._4 === r._3 * r._2)
    val uncapped = rows.filterNot(r => r._4 === r._3 * r._2)
    assert(uncapped.nonEmpty, "T = 2·ΣU with caps 1..4 must leave uncapped tiers")

    // budget conservation: floors drop under one token per uncapped source
    val allocated = rows.map(_._4).sum
    assert(allocated <= t && allocated > t - uncapped.size,
      s"allocated $allocated outside ($t - ${uncapped.size}, $t]")

    // capped sources: exactly their repetition limit
    capped.foreach { r =>
      assert(r._5 === r._3 * 10000L, s"${r._1} capped but epochs_bp ${r._5}")
    }

    // uncapped sources: one shared level λ, above every capped tier's
    // limit and below their own. Two stacked floors cost each source up
    // to 10000/U bp, so the spread bound scales with the smallest
    // uncapped source
    val levels = uncapped.map(_._5)
    val floorBp = 10000L / uncapped.map(_._2).min + 2L
    assert(levels.max - levels.min <= floorBp,
      s"uncapped fill levels diverge beyond flooring ($floorBp bp): " +
        levels.distinct.sorted.mkString(","))
    val lambda = levels.min
    val maxCappedTier = if (capped.isEmpty) 0L else capped.map(_._3).max
    assert(lambda > maxCappedTier * 10000L,
      s"λ $lambda not above the capped tiers ($maxCappedTier)")
    uncapped.foreach { r =>
      assert(lambda < r._3 * 10000L,
        s"${r._1} should have capped: λ $lambda vs cap ${r._3}")
    }
  }

  /** The query's sandwich predicate, re-implemented the slow obvious
    * way: scan candidate levels by brute force and allocate greedily.
    */
  private def bruteFill(us: Seq[(Long, Long)], t: Long): Seq[Long] = {
    // candidate capped-sets are prefixes of the distinct sorted caps
    val rs = (0L +: us.map(_._2).distinct.sorted)
    val star = rs.find { r =>
      val (capped, open) = us.partition(_._2 <= r)
      val spend = t - capped.map(c => c._1 * c._2).sum
      val remU = open.map(_._1).sum
      val rNext = us.map(_._2).filter(_ > r).sorted.headOption
      spend > r * remU && rNext.forall(n => spend <= n * remU)
    }.get
    val (capped, open) = us.partition(_._2 <= star)
    val spend = t - capped.map(c => c._1 * c._2).sum
    val remU = open.map(_._1).sum
    us.map { case (u, r) =>
      if (r <= star) u * r else spend * u / remU
    }
  }

  test("x71 fuzz: the windowed sandwich equals a brute-force level scan " +
    "on 300 random instances, and never over- or under-spends") {
    val rng = new scala.util.Random(42)
    for (it <- 1 to 300) {
      val n = 2 + rng.nextInt(12)
      val us = Seq.fill(n)((100L + rng.nextInt(100000),
        1L + rng.nextInt(6)))
      val totU = us.map(_._1).sum
      val totCap = us.map(c => c._1 * c._2).sum
      // budgets from trivially-small to everyone-capped
      val t = math.max(1L, (totCap * (rng.nextInt(130) + 1)) / 100)
      val expect = bruteFill(us, t)
      // replicate the query's exact arithmetic on the same frame
      val sorted = us.map(_._2).distinct.sorted
      val star = (0L +: sorted).find { r =>
        val cumCap = us.filter(_._2 <= r).map(c => c._1 * c._2).sum
        val remU = us.filter(_._2 > r).map(_._1).sum
        val rNext = sorted.find(_ > r)
        (t - cumCap) > r * remU &&
          rNext.forall(nx => (t - cumCap) <= nx * remU)
      }
      if (t >= totCap) {
        // everyone capped: the last tier's row must have validated
        assert(star.contains(sorted.last) || expect === us.map(c => c._1 * c._2),
          s"it=$it full-budget case broke")
        assert(expect === us.map(c => c._1 * c._2))
      } else {
        assert(star.nonEmpty, s"it=$it no valid level (t=$t us=$us)")
        val got = {
          val r = star.get
          val cumCap = us.filter(_._2 <= r).map(c => c._1 * c._2).sum
          val remU = us.filter(_._2 > r).map(_._1).sum
          us.map { case (u, rc) =>
            if (rc <= r) u * rc else (t - cumCap) * u / remU }
        }
        assert(got === expect, s"it=$it diverged (t=$t us=$us)")
        val spent = got.sum
        val openN = us.count(_._2 > star.get)
        assert(spent <= t && spent > t - math.max(openN, 1),
          s"it=$it spend $spent outside bounds for t=$t")
      }
    }
  }
}
