package graft.analytics

import graft.SparkSpec
import graft.sources.Tables

/** Q8 k-anonymity lattice: generalization levels are nested coarsenings
  * (nation→region merges groups, dropped dimensions merge groups), so
  * suppression can only fall as the level rises; every level must account
  * for every row.
  */
class KAnonymitySpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("q8 lattice: conservation and monotone suppression") {
    val rows = ExtendedSqlQueries.q8KAnonymity.run(spark, sf01).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val total = Tables.load(spark, sf01, "customer").count()
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === total,
        s"level ${r.getInt(0)} must account for every customer")
      assert(r.getBoolean(5) === (r.getLong(4) <= 500))
    }
    val bp = rows.map(_.getLong(4)).toSeq
    assert(bp.zip(bp.tail).forall { case (a, b) => a >= b },
      s"suppression must be monotone non-increasing across levels: $bp")
    assert(bp.head > 0, "finest level must exercise the suppression path")
    assert(bp.last === 0, "coarsest level must be fully k-anonymous")
  }

  test("q9 release enforces k everywhere and matches the q8 audit") {
    val audit = ExtendedSqlQueries.q8KAnonymity.run(spark, sf01).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val release = ExtendedSqlQueries.q9KAnonymousRelease.run(spark, sf01)
      .collect()
    assert(release.nonEmpty)
    val lvl = release.map(_.getInt(0)).distinct
    assert(lvl.length === 1, "release must sit at exactly one level")
    // chosen level = minimal level within the strict 5% budget per q8's
    // released/suppressed counts
    val expected = audit.toSeq.sortBy(_._1).collectFirst {
      case (l, (rel, sup)) if sup * 10000 <= (rel + sup) * 500 => l
    }.get
    assert(lvl.head === expected, s"level ${lvl.head} != audit minimum $expected")
    release.foreach(r => assert(r.getLong(4) >= 5,
      "released group below k breaks anonymity"))
    assert(release.map(_.getLong(4)).sum === audit(expected)._1,
      "released rows must sum to the audit's released count")
    // suppression actually happened at the chosen level (rows withheld)
    assert(audit(expected)._2 > 0)
  }
}
