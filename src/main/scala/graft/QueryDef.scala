package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named engine query: Spark implementation + optional DuckDB oracle.
  *
  * The oracle SQL must be ANSI SQL producing the *same column names* and
  * bit-identical values on the same parquet inputs (the correctness gate
  * hashes values after sorting columns by name).
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Parity {
  import org.apache.spark.sql.types.DataTypes

  /** Exact 2-decimal view of a double money/measure column.
    *
    * Summing doubles is order-dependent: Spark's partial aggregation tree and
    * a single-threaded oracle disagree in the last ulps, and at 100 TB the
    * divergence grows with partition count. Casting to decimal *before*
    * aggregating makes the sum exact (and therefore plan-shape- and
    * parallelism-independent) — the result is reproducible no matter how many
    * executors contributed partials.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum surfaced as double (stable across engines). */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DataTypes.DoubleType)

  /** Exact-decimal average surfaced as double: exact sum, then one double
    * division — a single deterministic FP op instead of an order-dependent
    * running mean.
    */
  def moneyAvg(c: Column): Column =
    (sum(dec2(c)).cast(DataTypes.DoubleType) / count(c)).cast(DataTypes.DoubleType)
}
