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

  test("declared schemas match the physical parquet footers") {
    graft.sources.Tables.all.foreach { case (t, declared) =>
      // footer schema WITHOUT imposing ours — real drift detection
      // (an imposed schema silently null-fills missing columns)
      val physical = spark.read.parquet(s"$sfDir/$t.parquet").schema
        .fieldNames.toSet
      val missing = declared.fieldNames.toSet -- physical
      assert(missing.isEmpty, s"$t: declared columns absent on disk: $missing")
      assert(graft.sources.Tables.load(spark, sfDir, t).count() > 0,
        s"$t is empty")
    }
  }
}
