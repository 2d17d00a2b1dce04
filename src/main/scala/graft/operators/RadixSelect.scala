package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order statistics on LONG values without a global
  * sort — the a13 histogram discipline factored into an operator
  * (introduced for x58's fixed-quota DSIR threshold; w12's RFM quintile
  * boundaries ride the same pass).
  *
  * `kthLargest(df, value, ranks)` answers EVERY rank in `ranks`
  * (rank_id, k) in one histogram pass: (1) bin each value by the top 16
  * bits of its order-preserving sortable-double encoding (longs below
  * 2⁵³ cast exactly) — the cumulative window runs over ≤ 2¹⁶ bin rows,
  * bounded by the ENCODING, not the data; (2) each rank locates its
  * bin, then the distinct values INSIDE located bins are ranked (one
  * bounded window over the located slices; a pathological single-bin
  * pileup would recurse the same way one level deeper). The k-th
  * largest counts multiplicity, matching `row_number() ORDER BY v DESC`
  * at rn = k in any engine.
  */
object RadixSelect {

  /** For each (rank_id, k) row of `ranks` (small — broadcast), the k-th
    * largest value of `df.value` counting multiplicity. Returns
    * (rank_id, k, kth). Requires 1 ≤ k ≤ count(df) for every rank.
    */
  def kthLargest(df: DataFrame, value: String, ranks: DataFrame): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    val binned = df.select(col(value).as("v"))
      .withColumn("bin", shiftrightunsigned(
        call_function("graft_sortable_bits", col("v").cast("double")), 48))
    val wBins = Window.partitionBy("g").orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bstar = binned.groupBy("bin").agg(count(lit(1)).as("cnt"))
      .withColumn("g", lit(1))
      .withColumn("above", coalesce(sum(col("cnt")).over(wBins), lit(0L)))
      .crossJoin(broadcast(ranks))
      .filter(col("above") < col("k") && col("k") <= col("above") + col("cnt"))
      .select(col("rank_id"), col("bin").as("bstar"),
        col("above").as("above_bins"), col("k"))
    val wVals = Window.partitionBy("rank_id").orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    binned.join(broadcast(bstar), col("bin") === col("bstar"))
      .groupBy("rank_id", "v", "above_bins", "k").agg(count(lit(1)).as("wc"))
      .withColumn("abovew", coalesce(sum(col("wc")).over(wVals), lit(0L)))
      .filter(col("above_bins") + col("abovew") < col("k") &&
        col("k") <= col("above_bins") + col("abovew") + col("wc"))
      .select(col("rank_id"), col("k"), col("v").as("kth"))
  }
}
