package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — multi-dimensional clustering for
  * file/row-group skipping, the `OPTIMIZE ... ZORDER BY` maintenance
  * operation of Delta/Iceberg lakehouses re-expressed as a pure plan.
  *
  * Why it matters at 100 TB: a range-partitioned linear sort clusters ONE
  * column — predicates on the second sort key touch every file. Bit-
  * interleaving the (bucketized) dimensions puts rows close in ALL
  * dimensions into the same files, so parquet min/max statistics prune
  * files/row groups for box predicates on ANY subset of the z-ordered
  * columns. The layout job is one range repartition + in-partition sort —
  * the same shuffle cost as a linear sort, no extra passes.
  *
  * Everything is column expressions (codegen'd, no UDFs): bucketization
  * is `width_bucket` against broadcast min/max bounds, and the Morton
  * value is a fold of shift/mask/or terms.
  */
object ZOrder {

  /** Morton interleave of already-bucketized non-negative ints, each
    * < 2^bits. Bit i of column j lands at position `i * n + j`.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zvalue needs at least one column")
    require(cols.size * bits <= 62,
      s"${cols.size} cols x $bits bits exceeds a long's capacity")
    val n = cols.size
    val parts = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Equi-width bucket of `c` into [0, 2^bits) given broadcast bounds
    * columns (equi-DEPTH via quantile bounds is the production upgrade;
    * the interleave is identical). Degenerate min==max maps to bucket 0.
    */
  def bucketize(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val nb = (1 << bits) - 1
    when(maxC <= minC, lit(0L)).otherwise(
      least(
        greatest(
          width_bucket(c.cast("double"), minC.cast("double"),
            maxC.cast("double"), lit(nb)) - 1,
          lit(0L)),
        lit(nb.toLong)))
  }

  /** `df` plus a `__z` Morton column over `cols`. Equi-width buckets by
    * default; `equiDepth = true` buckets by in-plan approx quantiles
    * instead — on skewed dimensions equi-width collapses most rows into
    * one bucket (losing that dimension's resolution in the curve), while
    * quantile edges keep every bucket population-balanced. Either way
    * the bounds/edges are ONE aggregate broadcast back — no driver-side
    * data pass, no per-row UDF.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
      equiDepth: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    if (!equiDepth) {
      val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c")))
      val bounds = df.agg(aggs.head, aggs.tail: _*)
      val bucketed = cols.map(c =>
        bucketize(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
      df.crossJoin(broadcast(bounds))
        .withColumn("__z", zvalue(bucketed, bits))
        .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
    } else {
      val nb = (1 << bits) - 1 // interior quantile edges → buckets 0..nb
      val pcts = array((1 to nb).map(i =>
        lit(i.toDouble / (nb + 1))): _*)
      val aggs = cols.map(c => percentile_approx(col(c).cast("double"),
        pcts, lit(10000)).as(s"__edges_$c"))
      val bounds = df.agg(aggs.head, aggs.tail: _*)
      // bucket = #edges <= value: a fold over the broadcast edge array
      val bucketed = cols.map(c =>
        aggregate(col(s"__edges_$c"), lit(0L), (acc, e) =>
          acc + when(col(c).cast("double") >= e, 1L).otherwise(0L)))
      df.crossJoin(broadcast(bounds))
        .withColumn("__z", zvalue(bucketed, bits))
        .drop(cols.map(c => s"__edges_$c"): _*)
    }
  }

  /** Rewrite `df` into a z-ordered layout over `cols`: `files` output
    * ranges of the Morton value, rows sorted by it within each. Bounds
    * for bucketization are computed in-plan and broadcast — no
    * driver-side pass over the data.
    */
  def layout(df: DataFrame, cols: Seq[String], bits: Int = 8,
      files: Int = 32, equiDepth: Boolean = false): DataFrame =
    withZValue(df, cols, bits, equiDepth)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Deal `df` into `files` EQUAL model files — exact `ntile(files)`
    * semantics over the total order by `sortCols` (the first `n mod
    * files` files take `(n div files) + 1` rows) — with NO global
    * window: the widest sort in the plan is per-partition. Each row
    * gains a `__file` column in [1, files].
    *
    * How (the boundary-stitch discipline): range-repartition on the sort
    * keys, take pid-local row numbers from a pid-PARTITIONED window, and
    * derive global positions by adding the cumulative count of earlier
    * range partitions (a ≤P-row broadcast non-equi join). The ranged+
    * row-numbered frame is materialized ONCE per `cacheKey` (lineage-
    * truncated [[graft.PlanCache.checkpointed]] memo): the count leg and
    * the position join both read it, and `repartitionByRange` SAMPLES
    * its input per evaluation — two evaluations can place range
    * boundaries differently, which would de-sync `off + rn` (caught at
    * sf0.1 in the q18 audit before this was factored out).
    *
    * Determinism contract: when `sortCols` is a total order (unique
    * keys), positions — and therefore the emitted file ids — are
    * partitioning-independent, so the output is value-stable across
    * runs and cluster sizes. With ties, sizes are still exact and ids
    * deterministic within one materialization.
    *
    * Why it exists here: [[layout]]'s range repartition gives
    * approximately-equal files (sampling); audits that replay footer-
    * stats math ([[graft.lakehouse.LayoutQueries]]'s q18) and layout
    * jobs that must hit an exact file-size contract share this dealer.
    */
  def ntileDeal(df: DataFrame, sortCols: Seq[Column], files: Int,
      cacheKey: String): DataFrame = {
    require(files >= 1, "ntileDeal needs at least one file")
    val spark = df.sparkSession
    val total = df.agg(count(lit(1)).as("__n"))
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(sortCols: _*)
    val withRn = graft.PlanCache.checkpointed(spark, cacheKey)(
      ranged.withColumn("__rn", row_number().over(wLoc)))
    val cnts = withRn.groupBy("__pid").agg(count(lit(1)).as("__c"))
    val offs = cnts
      .join(broadcast(cnts.select(col("__pid").as("__bpid"),
        col("__c").as("__bc"))), col("__bpid") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__bc")), lit(0L)).as("__off"))
    // ntile's exact fill rule evaluated from pos; the CASE also guards
    // the base = 0 branch (n < files ⇒ the first branch covers all rows)
    withRn.join(broadcast(offs), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__pos", col("__off") + col("__rn"))
      .withColumn("__file", expr(
        s"""CASE WHEN __pos <= ((__n div $files) + 1) * (__n % $files)
           |     THEN (__pos - 1) div ((__n div $files) + 1) + 1
           |     ELSE (__n % $files) +
           |          (__pos - ((__n div $files) + 1) * (__n % $files) - 1)
           |            div (__n div $files) + 1 END""".stripMargin))
      .drop("__pid", "__rn", "__off", "__pos", "__n")
  }

  /** [[layout]] with an EXACT equal-population file contract: the
    * [[ntileDeal]] dealer assigns z-order file ids (sizes differ by at
    * most one row — the ntile guarantee), instead of the sampled range
    * boundaries `layout` uses. Costs one extra materialization + tiny
    * stitch joins over `layout`; use when downstream consumers require
    * the size contract (fixed-shard training inputs, the q18 audit's
    * footer-stats model), plain [[layout]] otherwise.
    */
  def layoutExact(df: DataFrame, cols: Seq[String], bits: Int = 8,
      files: Int = 32, equiDepth: Boolean = false,
      // no default: PlanCache.checkpointed memoizes per (session, key),
      // so a constant key would silently serve the FIRST call's frame to
      // a second same-session call over different data/cols/bits/files —
      // callers must pass a data-dependent key, as ntileDeal requires
      cacheKey: String): DataFrame =
    ntileDeal(withZValue(df, cols, bits, equiDepth),
      Seq(col("__z")), files, cacheKey)
      .repartitionByRange(files, col("__file"))
      .sortWithinPartitions(col("__file"), col("__z"))
      .drop("__z")
}
