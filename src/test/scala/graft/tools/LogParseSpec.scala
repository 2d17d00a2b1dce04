package graft.tools

import graft.SparkSpec

class LogParseSpec extends SparkSpec {

  test("T17: parses resource log lines into typed columns; bad lines survive") {
    import spark.implicits._
    val lines = Seq(
      "2026-01-09 12:00:01 INFO pod-a-1 512Mi 250m memory check ok",
      "2026-01-09 12:00:02 WARN pod-b-2 1900Mi 750m approaching limit",
      "garbage line").toDF("line")
    val parsed = LogParse.parse(lines, "line").collect()
    val ok = parsed.filter(!_.isNullAt(1))
    assert(ok.length === 2)
    assert(ok(0).getAs[String]("level") === "INFO")
    assert(ok(0).getAs[Long]("memory_mib") === 512L)
    assert(ok(1).getAs[Long]("cpu_millis") === 750L)
    assert(ok(1).getAs[String]("message") === "approaching limit")
    val bad = parsed.filter(_.isNullAt(1))
    assert(bad.length === 1 && bad(0).getAs[String]("raw") === "garbage line")
  }

  test("S6: file provenance via input_file_name on canonical tables") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("src_file",
        regexp_extract(input_file_name(), "([^/]+)$", 1))
    val files = df.select("src_file").distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")))
  }
}
