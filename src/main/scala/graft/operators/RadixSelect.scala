package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order statistics on LONG values without a global
  * sort — the a13 histogram discipline factored into an operator
  * (introduced for x58's fixed-quota DSIR threshold; w12's RFM quintile
  * boundaries, x62's token budgets and w13's winsorization boundaries
  * ride the same pass).
  *
  * One general core, [[thresholds]]: for every (group, rank_id, budget)
  * request, the LARGEST value `thr` whose ≥-threshold total WEIGHT
  * reaches the budget — computed in one bounded-histogram pass:
  * (1) bin each value by the top 16 bits of its order-preserving
  * sortable-double encoding (longs below 2⁵³ cast exactly) — the
  * cumulative window runs over ≤ 2¹⁶ bin rows PER GROUP, bounded by the
  * ENCODING, not the data; (2) each request locates its crossing bin,
  * then the distinct values INSIDE located bins are ranked (one bounded
  * window over the located slices, partitioned per request). With
  * weight ≡ 1 and budget = k this is the k-th largest counting
  * multiplicity, ≡ `row_number() ORDER BY v DESC` at rn = k in any
  * engine. A budget above the group's total weight clamps to
  * "select everything" (thr = group minimum).
  */
object RadixSelect {

  /** General core: `ranks` carries one row per request —
    * (group..., rank_id, budget). Returns
    * (group..., rank_id, budget, thr, sel_weight) where
    * sel_weight = W(≥ thr) — for every request whose group appears in
    * `df`. Requires budget ≥ 1.
    */
  def thresholds(df: DataFrame, group: Seq[String], value: String,
      weight: String, ranks: DataFrame): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    // an internal constant group key makes the group-free case uniform
    val g = if (group.isEmpty) Seq("__g") else group
    val base =
      if (group.isEmpty) df.withColumn("__g", lit(1))
      else df
    val rk =
      if (group.isEmpty) ranks.withColumn("__g", lit(1))
      else ranks
    val gc = g.map(col)
    val binned = base.select(gc :+ col(value).as("v") :+
        col(weight).cast("long").as("w"): _*)
      .withColumn("bin", shiftrightunsigned(
        call_function("graft_sortable_bits", col("v").cast("double")), 48))
    val wBins = Window.partitionBy(gc: _*)
      .orderBy(col("bin").desc).rowsBetween(Window.unboundedPreceding, -1)
    // bin histogram + cumulative — computed ONCE per group, shared by
    // every rank against that group
    val bstar = binned.groupBy(gc :+ col("bin"): _*)
      .agg(sum(col("w")).as("bw"))
      .withColumn("above", coalesce(sum(col("bw")).over(wBins), lit(0L)))
      .withColumn("gtot",
        max(col("above") + col("bw")).over(Window.partitionBy(gc: _*)))
      .join(rk, g)
      .withColumn("eff", least(col("budget"), col("gtot")))
      .filter(col("above") < col("eff") && col("eff") <= col("above") + col("bw"))
      .select(gc :+ col("rank_id") :+ col("bin").as("bstar") :+
        col("above").as("above_bins") :+ col("budget") :+ col("eff"): _*)
    val wVals = Window.partitionBy((gc :+ col("rank_id")): _*)
      .orderBy(col("v").desc).rowsBetween(Window.unboundedPreceding, -1)
    // bstar is ≤ one row per (group, rank) request — BY CONSTRUCTION
    // tiny next to the scan. Without the explicit broadcast, Catalyst
    // cannot size the post-window frame and plans a sort-merge join
    // that shuffles the ENTIRE binned scan on (group, bin) — measured
    // at the 100× soak as a 15,783× shuffle-record blowup on w13
    // before this hint, 1.0× after.
    binned.join(broadcast(bstar.withColumnRenamed("bstar", "bin")),
        g :+ "bin")
      .groupBy(gc :+ col("rank_id") :+ col("v") :+ col("above_bins") :+
        col("budget") :+ col("eff"): _*)
      .agg(sum(col("w")).as("vw"))
      .withColumn("abovew", coalesce(sum(col("vw")).over(wVals), lit(0L)))
      .filter(col("above_bins") + col("abovew") < col("eff") &&
        col("eff") <= col("above_bins") + col("abovew") + col("vw"))
      .select((if (group.isEmpty) Seq.empty else gc) ++
        (col("rank_id") :: col("budget") :: col("v").as("thr") ::
          (col("above_bins") + col("abovew") + col("vw")).as("sel_weight") ::
          Nil): _*)
  }

  /** For each (rank_id, k) row of `ranks` (small), the k-th largest
    * value of `df.value` counting multiplicity. Returns
    * (rank_id, k, kth). Requires 1 ≤ k ≤ count(df) for every rank.
    */
  def kthLargest(df: DataFrame, value: String, ranks: DataFrame): DataFrame =
    thresholds(df.withColumn("__one", lit(1L)), Seq.empty, value, "__one",
        ranks.withColumn("budget", col("k")).drop("k"))
      .select(col("rank_id"), col("budget").as("k"), col("thr").as("kth"))

  /** Per-group weighted threshold selection — the quota-curation
    * primitive: for each group, the largest value `thr` such that the
    * total `weight` of rows with `value ≥ thr` reaches that group's
    * `budget` (`budgets`: group cols + `budget`, one row per group).
    * Returns (group..., budget, thr, sel_weight).
    */
  def weightedThreshold(df: DataFrame, group: Seq[String], value: String,
      weight: String, budgets: DataFrame): DataFrame =
    thresholds(df, group, value, weight,
        budgets.withColumn("rank_id", lit(1)))
      .drop("rank_id")
}
