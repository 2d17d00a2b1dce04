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
}
