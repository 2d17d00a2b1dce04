package graft.sources

import graft.SparkSpec

/** registerAll: the whole canonical corpus is queryable via spark.sql
  * with the same schemas/normalization as Tables.load.
  */
class TablesSpec extends SparkSpec {

  test("registerAll exposes every table to spark.sql with normalized types") {
    Tables.registerAll(spark, sfDir)
    // cross-table SQL runs against the views
    val top = spark.sql(
      """SELECT n.n_name, count(*) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 3""".stripMargin)
      .collect()
    assert(top.length === 3 && top.head.getLong(1) > 0)
    // events view carries the derived microsecond ts (not the raw ns long)
    val ts = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
    assert(ts.dataType.typeName === "timestamp")
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0)
  }
}
