package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the most recent right row with the
  * same key and time ≤ the left row's time. Spark has no native as-of
  * join; the naive composition (range join + per-row rank) explodes to
  * |L|·|matching R| intermediate rows.
  *
  * This implementation is the scale-correct composition: tag and UNION
  * the two sides, then a running `last(..., ignoreNulls)` window ordered
  * by (time, tag) carries the latest right-side payload forward onto each
  * left row. ONE shuffle on the join key, O(|L|+|R|) rows end to end, no
  * range-join blowup — the same trade DuckDB/kdb make natively.
  *
  * Ties: a right row at exactly the left row's time matches (right sorts
  * before left via the tag). Among multiple right rows at the same
  * (key, time), the carried payload is one of them arbitrarily — callers
  * needing determinism must pre-aggregate the right side to one row per
  * (key, time).
  */
object AsOfJoin {

  /** Left rows from `left`, enriched with `payloadCols` from the latest
    * `right` row at or before `left.timeCol` for the same key. Column
    * names must be disjoint between the two sides (except nothing is
    * shared); output = left columns + payload columns (null when no right
    * row precedes).
    */
  def asOf(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    // All payload columns travel in ONE struct: the carried value is the
    // whole latest right row, so a NULL payload field stays NULL (it is
    // inside a non-null struct, invisible to ignoreNulls) and every
    // payload column comes from the same right row — true as-of
    // semantics, matching DuckDB's native ASOF JOIN.
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    val rightTagged = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +:
        lit(0).as("__tag") +:
        struct(payloadCols.map(col): _*).as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftTagged = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(1).as("__tag") +:
        lit(null).cast(payloadType).as("__p") +:
        leftCols.map(col)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightTagged.unionByName(leftTagged)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
