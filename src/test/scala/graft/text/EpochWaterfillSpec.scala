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
}
