package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential fuzz for the st1 gaps-and-islands sessionization: the
  * distributed window plan must agree with a trivially-correct
  * single-threaded fold over randomized event sets — burst/gap shapes,
  * duplicate timestamps (tie-broken by event_id), single-event users,
  * and boundary gaps exactly at the 30-minute threshold.
  */
class SessionDifferentialSpec extends SparkSpec {

  private val gapUs = 1800000000L

  /** Brute-force reference: sort, split on gap > gapUs, roll up. */
  private def reference(events: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long, Long, Long)] =
    events.groupBy(_._1).map { case (user, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sorted
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, e) =>
          if (e._1 - cur.head._1 > gapUs) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, e) => List(List(e))
      }
      val perSession = sessions.map { s =>
        val us = s.map(_._1)
        (s.size.toLong, (us.max - us.min) / 1000000L)
      }
      user -> (
        perSession.size.toLong,
        perSession.map(_._1).sum,
        perSession.map(_._1).max,
        perSession.map(_._2).sum)
    }

  test("60-case differential fuzz vs single-threaded fold") {
    val rng = new Random(0x5E5510)
    import spark.implicits._
    (1 to 60).foreach { i =>
      val nUsers = 1 + rng.nextInt(8)
      val events = (0 until nUsers).flatMap { u =>
        val n = 1 + rng.nextInt(30)
        var t = math.abs(rng.nextLong() % 1000000000000L)
        (0 until n).map { j =>
          // mixture of small intra-session steps, exact-threshold gaps,
          // and large inter-session jumps; occasional duplicate ts
          t += (rng.nextInt(4) match {
            case 0 => rng.nextInt(60) * 1000000L
            case 1 => gapUs // exactly the threshold: same session
            case 2 => gapUs + 1 + rng.nextInt(1000000) // new session
            case _ => if (rng.nextBoolean()) 0L else 1000000L
          })
          (u.toLong, t, (u * 1000 + j).toLong)
        }
      }
      val df = events.toDF("user_id", "us", "event_id")
        .repartition(7) // the plan must not depend on input layout
      val got = ExtendedSqlQueries.sessionRollup(df, gapUs).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toMap
      assert(got === reference(events), s"case $i diverged")
    }
  }
}
