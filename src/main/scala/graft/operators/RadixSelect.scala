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

  /** Per-group WEIGHTED threshold selection — the quota-curation
    * primitive (x62 token budgets ride it): for each group, the LARGEST
    * value `thr` such that the total `weight` of rows with
    * `value ≥ thr` reaches that group's `budget`
    * (`W(≥thr) ≥ budget > W(>thr)`; a budget exceeding the group's
    * total weight clamps to "select everything", i.e. thr = group min).
    * `kthLargest` is the weight≡1 single-group special case.
    *
    * Same bounded-histogram discipline: one pass bins values by the top
    * 16 bits of the sortable-double encoding, the cumulative window runs
    * over ≤ 2¹⁶ bin rows PER GROUP (bounded by the encoding, not the
    * data), and only the located bin's distinct values are ranked.
    * Budgets join on the group key (small per-group frame — Catalyst/AQE
    * broadcasts it); nothing is ever globally sorted.
    *
    * Returns one row per group present in BOTH `df` and `budgets`:
    * (group..., budget, thr, sel_weight) where sel_weight = W(≥thr).
    */
  def weightedThreshold(df: DataFrame, group: Seq[String], value: String,
      weight: String, budgets: DataFrame): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    val g = group.map(col)
    val binned = df.select(g :+ col(value).as("v") :+
        col(weight).cast("long").as("w"): _*)
      .withColumn("bin", shiftrightunsigned(
        call_function("graft_sortable_bits", col("v").cast("double")), 48))
    val wBins = Window.partitionBy(group.map(col): _*)
      .orderBy(col("bin").desc).rowsBetween(Window.unboundedPreceding, -1)
    // clamp: a budget above the group's total weight selects everything
    // (the crossing test below then locates the group's minimum bin)
    val bstar = binned.groupBy(g :+ col("bin"): _*)
      .agg(sum(col("w")).as("bw"))
      .withColumn("above", coalesce(sum(col("bw")).over(wBins), lit(0L)))
      .join(budgets, group)
      .withColumn("eff", least(col("budget"),
        max(col("above") + col("bw")).over(Window.partitionBy(group.map(col): _*))))
      .filter(col("above") < col("eff") && col("eff") <= col("above") + col("bw"))
      .select(g :+ col("bin").as("bstar") :+ col("above").as("above_bins") :+
        col("budget") :+ col("eff"): _*)
    val wVals = Window.partitionBy(group.map(col): _*)
      .orderBy(col("v").desc).rowsBetween(Window.unboundedPreceding, -1)
    binned.join(bstar.withColumnRenamed("bstar", "bin"), group :+ "bin")
      .groupBy(g :+ col("v") :+ col("above_bins") :+ col("budget") :+
        col("eff"): _*)
      .agg(sum(col("w")).as("vw"))
      .withColumn("abovew", coalesce(sum(col("vw")).over(wVals), lit(0L)))
      .filter(col("above_bins") + col("abovew") < col("eff") &&
        col("eff") <= col("above_bins") + col("abovew") + col("vw"))
      .select(g :+ col("budget") :+ col("v").as("thr") :+
        (col("above_bins") + col("abovew") + col("vw")).as("sel_weight"): _*)
  }
}
