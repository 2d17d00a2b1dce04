package graft

import org.apache.spark.sql.functions._

/** The session factory's contract: engine configs applied, extensions
  * registered, declared table schemas match the driver testdata.
  */
class GraftSessionSpec extends SparkSpec {

  test("engine configs are active (AQE, UTC, shuffle sizing)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    assert(spark.conf.get("spark.sql.parquet.compression.codec") === "snappy")
  }

  test("custom functions are SQL-visible in GraftSession sessions") {
    assert(spark.sql("SELECT graft_md5u60('abc')").head().getLong(0) ===
      (8250560606382298838L >> 4))
  }

  test("declared schemas read every canonical table without cast errors") {
    graft.sources.Tables.all.keys.foreach { t =>
      val df = graft.sources.Tables.load(spark, sfDir, t)
      assert(df.count() > 0, s"$t is empty")
      // analysis-time schema equals the declared one (events adds ts)
      val declared = graft.sources.Tables.all(t).fieldNames.toSet
      val loaded = df.columns.toSet
      assert(declared.subsetOf(loaded ++ Set("ts")),
        s"$t: declared $declared vs loaded $loaded")
    }
  }
}
