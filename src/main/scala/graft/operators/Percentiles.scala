package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated percentiles by distributed selection.
  *
  * Spark's builtin `percentile` buffers a value→count map per group in
  * aggregation state — with few groups and high-cardinality values (3
  * return flags over billions of prices) that is an executor OOM at
  * scale. Selection never holds more than counters:
  *
  *  1. ONE histogram pass: rows bucket by the top `binBits` bits of the
  *     order-preserving IEEE-754 transform
  *     ([[graft.functions.SortableDoubleBits]]) — data-independent, so no
  *     prior min/max scan — and `groupBy(group, bin).count` collapses the
  *     table to O(groups·occupied bins) counters. The cumulation that
  *     locates each target rank's bin is DISTRIBUTED too: a per-group
  *     running-sum window over the bin counters plus a per-group total,
  *     with the target-rank containment test evaluated per bin row. Only
  *     the LOCATED rows — O(groups·percentiles), the operator's own
  *     output order — ever reach the driver; the full groups×bins map
  *     never does, so a per-user grouping (millions of groups) leaves
  *     driver memory flat.
  *  2. ONE refinement pass over only the target bins (~n/bins rows each),
  *     selected by broadcast-joining the located-bin metadata (no
  *     O(groups) literal predicate in the plan): if the histogram proves
  *     the subset is small it is collected and ranked on the driver;
  *     otherwise each bin is ranked with a `row_number` window
  *     partitioned by (group, bin) — per-task state is one bin,
  *     spillable, never the whole group.
  *
  * Driver state is therefore bounded by the RESULT size (one row per
  * group and percentile), the same contract as any collect()ed report;
  * per-task state is bounded by O(bins) via the hash aggregate.
  *
  * The (group, value) projection feeding both passes is persisted once
  * per `cacheKey` via [[graft.PlanCache]], repartitioned to the session's
  * parallelism (a single-row-group parquet file scans as ONE partition,
  * which would serialize both passes).
  *
  * Interpolation is `v_lo + (v_hi − v_lo)·frac` at positions
  * floor/ceil(p·(n−1)) — identical to Spark's `percentile` and DuckDB's
  * `quantile_cont`.
  */
object Percentiles {

  private def projection(df: DataFrame, group: String, value: String): DataFrame =
    df.select(col(group).as("g"), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)

  /** The persisted `(g, v)` projection behind `exact(cacheKey = ...)` —
    * public so sibling computations over the same measure (e.g. the
    * mergeable approx-percentile path) reuse the one cached,
    * parallelism-repartitioned copy instead of re-scanning the fact
    * table.
    */
  def cachedProjection(df: DataFrame, group: String, value: String,
      cacheKey: String): DataFrame =
    graft.PlanCache.persisted(df.sparkSession, s"percentiles/$cacheKey")(
      projection(df, group, value)
        .repartition(df.sparkSession.sparkContext.defaultParallelism))

  /** (group, n, <name per percentile>) — unrounded doubles. Runs its two
    * pass jobs eagerly (the result is a small literal DataFrame).
    *
    * NULL semantics: NULL values are ignored (like SQL quantile
    * aggregates), so `n` is the NON-NULL value count per group — callers
    * comparing against SQL should use `count(<value>)`, not `count(*)` —
    * and a group whose values are all NULL is omitted. NULL group keys
    * are supported and emitted like SQL GROUP BY.
    *
    * @param binBits   histogram bucket = top `binBits` bits of the
    *                  sortable double transform (16 ⇒ ≤65,536 buckets:
    *                  sign + exponent + 4 mantissa bits)
    * @param maxDriverRows refinement subsets up to this size (known
    *                  exactly from the histogram) are ranked driver-side;
    *                  larger ones use the distributed window path
    */
  def exact(df: DataFrame, group: String, value: String,
      ps: Seq[(Double, String)], binBits: Int = 16,
      maxDriverRows: Long = 2000000, cacheKey: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    graft.GraftExtensions.ensure(spark)
    val groupField = df.schema(group)
    val base = cacheKey match {
      case Some(k) => cachedProjection(df, group, value, k)
      case None => projection(df, group, value)
    }
    val binE = shiftrightunsigned(
      call_function("graft_sortable_bits", col("v")), 64 - binBits)

    // pass 1: histogram + cumulation, all distributed. groupBy(g, bin)
    // is a codegen'd hash aggregate with map-side partials (per-task
    // state O(bins)); the per-group running sum and total are windows
    // over the COLLAPSED bin counters (O(groups·bins) rows total, one
    // shuffle by g); each bin row then tests target-rank containment
    // for every percentile slot and only the located rows — one per
    // (group, percentile bound) — are collected.
    val slotArr = array(ps.flatMap { case (p, nm) => Seq(
      struct(lit(s"$nm:lo").as("slot"), lit(p).as("p"), lit(false).as("hi")),
      struct(lit(s"$nm:hi").as("slot"), lit(p).as("p"), lit(true).as("hi")))
    }: _*)
    val wBefore = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGroup = Window.partitionBy("g")
    val locatedRows = base.select(col("g"), binE.as("bin"))
      .groupBy(col("g"), col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("before", coalesce(sum(col("cnt")).over(wBefore), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wGroup))
      .select(col("g"), col("bin"), col("cnt"), col("before"), col("n"),
        explode(slotArr).as("s"))
      // pos must be the same IEEE expression the driver interpolates
      // with below: p * (n-1), both double
      .withColumn("pos", col("s.p") * (col("n") - lit(1L)).cast("double"))
      .withColumn("tRank",
        when(col("s.hi"), ceil(col("pos"))).otherwise(floor(col("pos")))
          .cast("long"))
      .filter(col("tRank") >= col("before") &&
        col("tRank") < col("before") + col("cnt"))
      .select(col("g"), col("s.slot").as("slot"), col("bin"), col("cnt"),
        (col("tRank") - col("before") + lit(1L)).as("k"), col("n"))
      .collect()
    val outSchema = StructType(groupField.copy(name = group) +:
      StructField("n", LongType) +:
      ps.map { case (_, nm) => StructField(nm, DoubleType) })
    if (locatedRows.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    }
    // (group, slot) → (bin holding target rank, 1-indexed rank k in bin)
    val located: Seq[(Any, String, Long, Long)] = locatedRows.toSeq
      .map(r => (r.get(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val counts: Map[Any, Long] = locatedRows.toSeq
      .map(r => r.get(0) -> r.getLong(5)).toMap
    val hotBins: Seq[(Any, Long, Long)] = locatedRows.toSeq
      .map(r => (r.get(0), r.getLong(2), r.getLong(3))).distinct
    val subsetSize = hotBins.map(_._3).sum
    // the refinement subset is selected by a BROADCAST JOIN against the
    // located-bin metadata — null-safe on the group (SQL GROUP BY emits
    // a NULL group) and free of O(groups) literal predicates, so a
    // million-group call plans the same as a three-group one
    val hotSchema = StructType(Seq(groupField.copy(name = "hg"),
      StructField("hbin", LongType)))
    val hotDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        hotBins.map { case (g, b, _) => Row(g, b) }, 1), hotSchema)
    val subset = base.withColumn("bin", binE)
      .join(broadcast(hotDf),
        (col("g") <=> col("hg")) && col("bin") === col("hbin"), "inner")
      .drop("hg", "hbin")

    // pass 2: k-th value per located bin — driver-side when the histogram
    // proves the subset small, distributed window otherwise
    val picked: Map[(Any, Long, Long), Double] =
      if (subsetSize <= maxDriverRows) {
        val byBin = subset.select("g", "bin", "v").collect()
          .groupBy(r => (r.get(0), r.getLong(1)))
          .map { case (k, rows) => k -> rows.map(_.getDouble(2)).sorted }
        located.map { case (g, _, b, k) =>
          (g, b, k) -> byBin((g, b))(k.toInt - 1)
        }.toMap
      } else {
        val wantSchema = StructType(Seq(groupField.copy(name = "wg"),
          StructField("wbin", LongType), StructField("wk", LongType)))
        val wantDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            located.map { case (g, _, b, k) => Row(g, b, k) }.distinct, 1),
          wantSchema)
        subset
          .withColumn("r", row_number().over(
            Window.partitionBy("g", "bin").orderBy("v")))
          .join(broadcast(wantDf),
            (col("g") <=> col("wg")) && col("bin") === col("wbin") &&
              col("r").cast("long") === col("wk"), "inner")
          .select("g", "bin", "r", "v")
          .collect()
          .map(r => (r.get(0), r.getLong(1), r.getInt(2).toLong) -> r.getDouble(3))
          .toMap
      }
    val slotValues = located.map { case (g, slot, b, k) =>
      (g, slot) -> picked((g, b, k))
    }.toMap

    val out = counts.toSeq.map { case (g, n) =>
      Row.fromSeq(g +: n +: ps.map { case (p, nm) =>
        val pos = p * (n - 1)
        val lo = slotValues((g, s"$nm:lo"))
        val hi = slotValues((g, s"$nm:hi"))
        lo + (hi - lo) * (pos - math.floor(pos))
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
