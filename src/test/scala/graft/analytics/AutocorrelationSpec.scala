package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** e14 — exact autocorrelation ladder: planted calendars with
  * closed-form verdicts and the full-query differential against an
  * independently-derived daily series.
  */
class AutocorrelationSpec extends SparkSpec {

  test("e14: a pure weekly pattern reads lag-7 r2 10000, lag-1 below") {
    // x_t = t mod 7 over ten full weeks
    val series = (0L until 70L).map(ed => ed -> (ed % 7)).toMap
    val byLag = ExtendedSqlQueries.acfOf(series, Seq(1, 7))
      .map(t => t._1 -> (t._3, t._4)).toMap
    assert(byLag(7L) === ((1L, 10000L)))
    assert(byLag(1L)._2 < 10000L)
  }

  test("e14: constant and tiny series guard to sign 0 / r2 0") {
    val const = (0L until 30L).map(_ -> 42L).toMap
    assert(ExtendedSqlQueries.acfOf(const, Seq(1)).head === ((1L, 29L, 0L, 0L)))
    val tiny = Map(0L -> 1L)
    assert(ExtendedSqlQueries.acfOf(tiny, Seq(1)).head === ((1L, 0L, 0L, 0L)))
  }

  test("e14: calendar gaps align by date, not by row") {
    // days 0,1,2,10,11,12: lag-1 pairs are (0,1),(1,2),(10,11),(11,12) —
    // never (2,10); lag-7 has no pairs at all... 10-3=7: (3 missing) —
    // actually ed 3..9 absent -> 10 = 3+7 pairs need ed & ed+7 BOTH
    // present: (3,10),(4,11),(5,12) absent on the left -> zero lag-7 pairs
    val series = Map(0L -> 5L, 1L -> 9L, 2L -> 4L, 10L -> 7L, 11L -> 2L,
      12L -> 8L)
    val byLag = ExtendedSqlQueries.acfOf(series, Seq(1, 7))
      .map(t => t._1 -> t._2).toMap
    assert(byLag(1L) === 4L)
    assert(byLag(7L) === 0L)
  }

  test("e14: full query equals the fold on an independent daily series") {
    val daily = Tables.load(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("od"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("cents"))
      .select(datediff(col("od"), lit("1970-01-01")).cast("long"),
        expr("cents div 1000"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = ExtendedSqlQueries.acfOf(daily, Seq(1, 7, 28))
    val got = graft.SparkEntry.queries("e14_autocorrelation")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === exp)
    assert(got.forall(_._2 > 0L))
  }
}
