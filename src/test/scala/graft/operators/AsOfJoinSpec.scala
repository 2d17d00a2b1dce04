package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def day(s: String) = java.sql.Date.valueOf(s)

  test("as-of semantics: latest prior row, exact-time match, null before first") {
    import spark.implicits._
    val quotes = Seq(
      (1L, day("2001-01-01"), 10.0),
      (1L, day("2001-01-05"), 20.0),
      (2L, day("2001-01-03"), 99.0)).toDF("q_key", "q_date", "price")
    val trades = Seq(
      (1L, day("2000-12-31"), "t0"), // before any quote → null
      (1L, day("2001-01-01"), "t1"), // exact-time quote matches
      (1L, day("2001-01-04"), "t2"), // latest prior = Jan 1
      (1L, day("2001-01-09"), "t3"), // latest prior = Jan 5
      (3L, day("2001-01-09"), "t4")) // key with no quotes → null
      .toDF("t_key", "t_date", "trade_id")
    val out = AsOfJoin.asOf(trades, quotes, "t_key", "q_key",
      "t_date", "q_date", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out === Map(
      "t0" -> None, "t1" -> Some(10.0), "t2" -> Some(10.0),
      "t3" -> Some(20.0), "t4" -> None))
  }

  test("null payload values survive; all payload columns come from one row") {
    import spark.implicits._
    // right rows: older row has (price=5.0, size=100); the matching newer
    // row has a genuinely NULL price. True as-of semantics return the
    // newer row's NULL, never backfill from the older row — and both
    // payload columns must come from the same (newer) row.
    val quotes = Seq(
      (1L, day("2001-01-01"), Some(5.0), Some(100L)),
      (1L, day("2001-01-05"), None, Some(7L)))
      .toDF("q_key", "q_date", "price", "size")
    val trades = Seq((1L, day("2001-01-09"), "t1"))
      .toDF("t_key", "t_date", "trade_id")
    val r = AsOfJoin.asOf(trades, quotes, "t_key", "q_key",
      "t_date", "q_date", Seq("price", "size")).head()
    assert(r.isNullAt(3), "NULL payload must not be backfilled from an older row")
    assert(r.getLong(4) === 7L, "payload columns must come from the same right row")
  }

  test("generative differential fuzz vs brute-force reference (250 seeded cases)") {
    import spark.implicits._
    // each case gets a disjoint key space, so one Spark job runs all 250
    // cases at once (as-of never crosses keys); the reference is a plain
    // in-memory scan over the same generated rows
    val cases = (0 until 250).map { c =>
      val rng = new scala.util.Random(987000 + c)
      val nKeys = rng.nextInt(4) + 1
      def key() = rng.nextInt(nKeys).toLong + c * 100L
      val nR = rng.nextInt(25)
      val rights = Seq.fill(nR)((key(), rng.nextInt(40).toLong,
          if (rng.nextBoolean()) Some(rng.nextInt(1000) / 10.0) else None,
          if (rng.nextInt(4) == 0) None else Some(rng.nextInt(100).toLong)))
        // the operator's contract: one right row per (key, time) — among
        // same-time right rows the carried one is arbitrary
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val nL = rng.nextInt(24) + 1
      val lefts = (0 until nL).map(j =>
        (key(), rng.nextInt(45).toLong, c * 1000L + j))
      (rights, lefts)
    }
    val rightDf = cases.flatMap(_._1).toDF("q_key", "q_t", "price", "size")
    val leftDf = cases.flatMap(_._2).toDF("t_key", "t_t", "row_id")
    val out = AsOfJoin.asOf(leftDf, rightDf, "t_key", "q_key", "t_t", "q_t",
        Seq("price", "size"))
      .collect()
      .map(r => r.getLong(2) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
    val rightsByKey = cases.flatMap(_._1).groupBy(_._1)
    var checked = 0
    cases.flatMap(_._2).foreach { case (k, t, id) =>
      val prior = rightsByKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val expected: (Option[Any], Option[Any]) =
        if (prior.isEmpty) (None, None)
        else { val best = prior.maxBy(_._2); (best._3, best._4) }
      assert(out(id) === expected, s"case row $id key=$k t=$t")
      checked += 1
    }
    assert(out.size === checked && checked >= 250)
  }

  test("one shuffle: the plan exchanges only on the join key") {
    import spark.implicits._
    val r = Seq((1L, day("2001-01-01"), 1.0)).toDF("k", "d", "v")
    val l = Seq((1L, day("2001-01-02"), "x")).toDF("k2", "d2", "name")
    val out = AsOfJoin.asOf(l, r, "k2", "k", "d2", "d", Seq("v"))
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, "as-of join must shuffle exactly once")
  }
}
