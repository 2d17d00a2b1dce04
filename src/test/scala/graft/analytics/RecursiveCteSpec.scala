package graft.analytics

import graft.SparkSpec

/** Spark's native WITH RECURSIVE surface, kept exercised after e9's
  * engine plan moved to the one-job `sequence()` spine: the doubling
  * recursion must still run on Spark SQL and produce the EXACT month
  * spine the sequence plan serves (so the recursive form remains a
  * drop-in, just a slower one).
  */
class RecursiveCteSpec extends SparkSpec {

  test("recursive doubling month spine ≡ sequence() spine on sf0.001") {
    graft.sources.Tables.register(spark, sfDir, "orders")
    val recursive = spark.sql("""WITH RECURSIVE bounds AS (
      |  SELECT make_date(year(min(CAST(o_orderdate AS DATE))),
      |                   month(min(CAST(o_orderdate AS DATE))), 1) AS lo,
      |         make_date(year(max(CAST(o_orderdate AS DATE))),
      |                   month(max(CAST(o_orderdate AS DATE))), 1) AS hi
      |  FROM orders),
      |gen(m, s) AS (
      |  SELECT lo, 1 FROM bounds
      |  UNION ALL
      |  SELECT CASE WHEN i = 0 THEN add_months(m, s) ELSE m END, s * 2
      |  FROM gen JOIN bounds
      |  LATERAL VIEW explode(array(0, 1)) t AS i
      |  WHERE (i = 0 AND add_months(m, s) <= hi) OR (i = 1 AND s <= 2048)),
      |spine AS (SELECT DISTINCT m FROM gen)
      |SELECT m FROM spine ORDER BY m""".stripMargin)
      .collect().map(_.getDate(0).toString).toSeq
    val viaSequence = spark.sql("""WITH bounds AS (
      |  SELECT make_date(year(min(CAST(o_orderdate AS DATE))),
      |                   month(min(CAST(o_orderdate AS DATE))), 1) AS lo,
      |         make_date(year(max(CAST(o_orderdate AS DATE))),
      |                   month(max(CAST(o_orderdate AS DATE))), 1) AS hi
      |  FROM orders)
      |SELECT explode(sequence(lo, hi, interval 1 month)) AS m FROM bounds
      |ORDER BY m""".stripMargin)
      .collect().map(_.getDate(0).toString).toSeq
    assert(recursive.nonEmpty)
    assert(recursive == viaSequence,
      "the recursive spine and the sequence spine must agree month-for-month")
  }

  test("e9 itself flags no gaps on a dense corpus and covers the bounds") {
    val out = ExtendedSqlQueries.e9RecursiveMonthSpine.run(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getInt(2) == 0), "synthetic orders have no gap months")
  }
}
