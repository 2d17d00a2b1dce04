package graft.operators

import graft.SparkSpec

/** RadixSelect: the k-th-largest-counting-multiplicity contract against
  * a plain sort, across random multisets (duplicates, negatives, skewed
  * single-bin pileups) and multiple simultaneous ranks.
  */
class RadixSelectSpec extends SparkSpec {
  import spark.implicits._

  private def check(values: Seq[Long], ks: Seq[Long]): Unit = {
    val ranks = ks.zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("rank_id", "k")
    val got = RadixSelect
      .kthLargest(values.toDF("v"), "v", ranks)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = values.sorted(Ordering.Long.reverse)
    ks.zipWithIndex.foreach { case (k, i) =>
      assert(got(i.toLong) === sorted((k - 1).toInt),
        s"rank $k over ${values.size} values")
    }
  }

  test("randomized multisets with duplicates and negatives, multi-rank") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(200)
      // clustered values force duplicates; offset swings sign
      val values = Seq.fill(n)(rnd.nextInt(40).toLong * 1000 - 20000 +
        rnd.nextInt(3))
      val ks = Seq(1L, n / 4L max 1L, n / 2L max 1L, n.toLong)
      check(values, ks)
    }
  }

  test("degenerate shapes: all-equal values and a single value") {
    check(Seq.fill(64)(7L), Seq(1L, 32L, 64L))
    check(Seq(-3L), Seq(1L))
  }

  test("weightedThreshold: randomized grouped differential vs brute force") {
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val groups = Seq("ga", "gb", "gc")
      val rows = groups.flatMap { g =>
        val n = 20 + rnd.nextInt(80)
        Seq.fill(n)((g, rnd.nextInt(30).toLong * 100 - 1500,
          1L + rnd.nextInt(9)))
      }
      // budgets: one undersized, one mid, one OVER total (clamp path)
      val totals = rows.groupBy(_._1).map { case (g, v) => g -> v.map(_._3).sum }
      val budgets = groups.zipWithIndex.map { case (g, i) =>
        (g, i match {
          case 0 => 1L + rnd.nextInt(5)
          case 1 => 1L max (totals(g) / 2)
          case 2 => totals(g) + 10
        })
      }
      val got = RadixSelect.weightedThreshold(
          rows.toDF("src", "v", "w"), Seq("src"), "v", "w",
          budgets.toDF("src", "budget"))
        .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      budgets.foreach { case (g, b) =>
        val eff = math.min(b, totals(g))
        // brute force: distinct values desc, cumulative weight, first cross
        val byV = rows.filter(_._1 == g).groupBy(_._2)
          .map { case (v, rs) => v -> rs.map(_._3).sum }
          .toSeq.sortBy(-_._1)
        val cum = byV.scanLeft(0L)(_ + _._2).tail
        val idx = cum.indexWhere(_ >= eff)
        assert(got(g) === ((byV(idx)._1, cum(idx))),
          s"seed $seed group $g budget $b")
      }
    }
  }

  test("w12 census: scores span 1..5 and conserve the customer count") {
    val rows = graft.analytics.ExtendedSqlQueries.w12RfmSegments
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (r, f, m, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    val nCust = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum === nCust,
      "every customer lands in exactly one RFM cell")
    // each per-dimension quintile holds ~N/5 customers (ties inclusive:
    // the top tile can only be >= its exact share)
    val byR = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._4).sum }
    assert(byR(5L) >= nCust / 5, s"top recency tile undersized: $byR")
  }
}
