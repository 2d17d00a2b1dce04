package graft.analytics

import graft.SparkSpec

/** w14 multi-touch attribution: the engine census against a
  * single-threaded brute force of the same semantics, plus the
  * conservation law the integer-remainder rule exists for — every
  * purchase's credits sum EXACTLY to its cents under both models.
  */
class AttributionSpec extends SparkSpec {

  private case class Ev(uid: Long, typ: String, us: Long, id: Long,
    cents: Long)

  test("census equals brute force; per-purchase credit conserves exactly") {
    import org.apache.spark.sql.functions._
    val evs = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          * 100).cast("long"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val T = 86400000000L
    val touches = evs.filter(e => e.typ == "view" || e.typ == "click")
    val purchases = evs.filter(_.typ == "purchase")
    var census = Map.empty[String, (Long, Long, Long)]
    purchases.foreach { p =>
      val ts = touches.filter(t => t.uid == p.uid && t.us < p.us &&
          t.us >= p.us - T)
        .sortBy(t => (t.us, t.id))
      val n = ts.size.toLong
      if (n > 0) {
        val lin = ts.zipWithIndex.map { case (_, i) =>
          p.cents / n + (if (i + 1 == n) p.cents % n else 0L)
        }
        val uBp = ts.zipWithIndex.map { case (_, i) =>
          if (n == 1) 10000L else if (n == 2) 5000L
          else if (i == 0 || i + 1 == n) 4000L else 2000L / (n - 2)
        }
        val uBase = uBp.map(bp => p.cents * bp / 10000L)
        val u = uBase.zipWithIndex.map { case (c, i) =>
          c + (if (i + 1 == n) p.cents - uBase.sum else 0L)
        }
        // conservation: the remainder rule must close both models exactly
        assert(lin.sum === p.cents, s"linear leaks on purchase ${p.id}")
        assert(u.sum === p.cents, s"u-shaped leaks on purchase ${p.id}")
        ts.zip(lin.zip(u)).foreach { case (t, (l, uu)) =>
          val (cn, cl, cu) = census.getOrElse(t.typ, (0L, 0L, 0L))
          census += t.typ -> ((cn + 1, cl + l, cu + uu))
        }
      }
    }
    val got = EventQueries.w14MultiTouch.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === census)
  }
}
