package graft.operators

import graft.SparkSpec

/** Generalized N-step window funnel: the anchor cascade against an
  * O(N·n²) brute force over random soups at 3, 4 and 5 steps, and
  * exact agreement with the original 3-step funnelLevels plan.
  */
class WindowFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def brute(evs: Seq[(Long, String, Long)], steps: Seq[String],
      T: Long): Map[Long, Long] =
    evs.map(_._1).distinct.map { uid =>
      val es = evs.filter(_._1 == uid).zipWithIndex
      // A(i)(e): best anchor of a chain of steps 0..i ending at event e
      val memo = scala.collection.mutable.Map.empty[(Int, Int), Option[Long]]
      def anchor(i: Int, e: ((Long, String, Long), Int)): Option[Long] =
        memo.getOrElseUpdate((i, e._2),
          es.filter(f => f._1._3 < e._1._3 && f._1._2 == steps(i))
            .flatMap { f =>
              if (i == 0) Some(f._1._3) else anchor(i - 1, f)
            }.maxOption)
      val flags = steps.indices.map { j =>
        if (j == 0) es.exists(_._1._2 == steps.head)
        else es.exists(e => e._1._2 == steps(j) &&
          anchor(j - 1, e).exists(a => e._1._3 <= a + T))
      }
      uid -> flags.count(identity).toLong
    }.toMap

  private def soup(seed: Long, n: Int, types: Vector[String]) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { _ =>
      (rnd.nextInt(6).toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(2500).toLong)
    }
  }

  private def run(evs: Seq[(Long, String, Long)], steps: Seq[String],
      T: Long): Map[Long, Long] =
    WindowFunnel.levels(evs.toDF("user_id", "event_type", "us"), steps, T)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("4- and 5-step cascades equal the brute force on random soups") {
    val types = Vector("view", "click", "signup", "purchase", "refund",
      "noise")
    for (seed <- 1L to 5L) {
      val evs = soup(seed, 250, types)
      val steps4 = Seq("view", "click", "signup", "purchase")
      assert(run(evs, steps4, 600L) === brute(evs, steps4, 600L),
        s"4-step seed $seed")
      val steps5 = Seq("view", "click", "signup", "purchase", "refund")
      assert(run(evs, steps5, 900L) === brute(evs, steps5, 900L),
        s"5-step seed $seed")
    }
  }

  test("3-step cascade is exactly the a19 funnelLevels plan") {
    val evs = soup(42L, 400, Vector("view", "click", "purchase", "noise"))
    val viaOperator = run(evs, Seq("view", "click", "purchase"), 700L)
    val viaA19 = graft.analytics.EventQueries
      .funnelLevels(evs.toDF("user_id", "event_type", "us"), 700L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaOperator === viaA19)
    assert(viaOperator === brute(evs, Seq("view", "click", "purchase"), 700L))
  }

  test("ties never chain at any depth (strictly-earlier frames)") {
    // click at the same instant as the view, signup strictly later:
    // level must stop at 1 (view) — the tied click cannot anchor
    val evs = Seq((1L, "view", 100L), (1L, "click", 100L),
      (1L, "signup", 200L), (1L, "purchase", 300L))
    val got = run(evs, Seq("view", "click", "signup", "purchase"), 1000L)
    assert(got === Map(1L -> 1L))
  }
}
