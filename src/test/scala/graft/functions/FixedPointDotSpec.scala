package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends SparkSpec {

  private def declarative = expr(
    """aggregate(zip_with(a, b, (x, y) ->
      |  CAST(floor(CAST(x AS DOUBLE) * 1e8) AS BIGINT) *
      |  CAST(floor(CAST(y AS DOUBLE) * 1e8) AS BIGINT)),
      |CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)

  test("graft_dot matches the declarative fixed-point formula on real vectors") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val diff = e.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      declarative.as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(diff === 0)
  }

  test("graft_dot works from SQL (registered via SparkSessionExtensions)") {
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .head().getLong(0)
    // 1e8*2e8 + (-5e7)*4e8 = 2e16 - 2e16 = 0
    assert(r === 0L)
  }

  test("graft_dot null and length semantics") {
    // mismatched lengths → NULL, exactly like aggregate(zip_with(...)):
    // zip_with null-pads the shorter array and the null products null
    // the sum — never a partial dot over the common prefix
    val rows = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS n,
        |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT))) AS mismatch,
        |       aggregate(zip_with(array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)),
        |                          array(CAST(3.0 AS FLOAT)), (x, y) ->
        |           CAST(floor(CAST(x AS DOUBLE) * 1e8) AS BIGINT) *
        |           CAST(floor(CAST(y AS DOUBLE) * 1e8) AS BIGINT)),
        |         CAST(0 AS BIGINT), (acc, v) -> acc + v) AS decl""".stripMargin).head()
    assert(rows.isNullAt(0))
    assert(rows.isNullAt(1), "length mismatch must be NULL, not a prefix dot")
    assert(rows.isNullAt(2), "declarative form nulls a mismatch too")
    // graft_dot_long mirrors the same contract
    val longs = spark.sql(
      """SELECT graft_dot_long(array(1L, 2L), array(3L)) AS mismatch,
        |       graft_dot_long(array(1L, 2L), array(3L, 4L)) AS ok""".stripMargin).head()
    assert(longs.isNullAt(0))
    assert(longs.getLong(1) === 11L)
  }

  test("NULL array element nulls the result (matches declarative form)") {
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .head()
    assert(r.isNullAt(0), "a NULL element must null the dot product")
    // interpreted path agrees
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[java.lang.Float](1.0f, null))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[java.lang.Float](2.0f, 4.0f))
    val t = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType, containsNull = true)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create _
    assert(FixedPointDot(lit(a, t), lit(b, t)).eval(null) === null)
  }

  test("interpreted eval matches codegen result") {
    // force interpreted path by evaluating the expression directly
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0.25f, -0.125f))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0.5f, 0.5f))
    val litA = org.apache.spark.sql.catalyst.expressions.Literal(a,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val litB = org.apache.spark.sql.catalyst.expressions.Literal(b,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interpreted = FixedPointDot(litA, litB).eval(null).asInstanceOf[Long]
    val viaSql = spark.sql(
      """SELECT graft_dot(array(CAST(0.25 AS FLOAT), CAST(-0.125 AS FLOAT)),
        |                 array(CAST(0.5 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .head().getLong(0)
    assert(interpreted === viaSql)
    // 0.25*0.5 + (-0.125)*0.5 = 0.0625 → 625e12 in 1e-16 units
    assert(interpreted === 625000000000000L)
  }
}
