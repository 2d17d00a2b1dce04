package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CrossHash must equal DuckDB's md5_number_lower family bit-for-bit —
  * locked here against constants computed independently (python hashlib:
  * int.from_bytes(md5(b'abc').digest()[8:16], 'little')).
  */
class CrossHashSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq("abc").toDF("s").select(c.cast("string")).head().getString(0)
  }

  test("md5u64 equals DuckDB md5_number_lower('abc')") {
    assert(one(CrossHash.md5u64(col("s"))) === "8250560606382298838")
  }

  test("md5u60 equals md5_number_lower >> 4") {
    assert(one(CrossHash.md5u60(col("s"))) === (8250560606382298838L >> 4).toString)
  }

  test("codegen graft_md5u60 kernel equals the declarative CrossHash.md5u60") {
    import spark.implicits._
    graft.GraftExtensions.ensure(spark)
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val diff = words.select(
      CrossHash.md5u60(col("w")).as("decl"),
      call_function("graft_md5u60", col("w")).as("native"))
      .filter(col("decl") =!= col("native")).count()
    assert(diff === 0)
  }

  test("md5u60Salted varies by seed and stays in 60-bit range") {
    import spark.implicits._
    val vals = (0 until 8).map(k =>
      Seq("abc").toDF("s").select(CrossHash.md5u60Salted(col("s"), k))
        .head().getLong(0))
    assert(vals.distinct.size === 8)
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
  }
}
