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
  *     table to O(groups·occupied bins) counters. Cumulating them on the
  *     driver locates the bin holding each target rank AND the exact
  *     number of rows those bins contain.
  *  2. ONE refinement pass over only the target bins (~n/bins rows each):
  *     if the histogram proves the subset is small it is collected and
  *     ranked on the driver; otherwise each bin is ranked with a
  *     `row_number` window partitioned by (group, bin) — per-task state
  *     is one bin, spillable, never the whole group.
  *
  * The histogram is bounded driver metadata — O(groups·bins), set by
  * configuration, never by row count (the same contract as AQE map-output
  * statistics or RangePartitioner samples). Inlining it as literal
  * predicates keeps each pass one self-contained job. The operator
  * targets modest group counts (its output is one row per group).
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

    // pass 1: one histogram pass — per-partition counter maps merged
    // associatively (the aggregation-state contract: O(groups·bins) per
    // task). Up to a few hundred partitions the partials merge on the
    // driver in a SINGLE stage; beyond that treeAggregate adds a combine
    // level so the driver never sees more than ~sqrt(partitions) maps.
    val binnedRdd = base.select(col("g"), binE.as("bin")).rdd
    def seqOp(m: scala.collection.mutable.HashMap[(Any, Long), Long],
        r: Row): scala.collection.mutable.HashMap[(Any, Long), Long] = {
      val k = (r.get(0), r.getLong(1))
      m.update(k, m.getOrElse(k, 0L) + 1L); m
    }
    def combOp(a: scala.collection.mutable.HashMap[(Any, Long), Long],
        b: scala.collection.mutable.HashMap[(Any, Long), Long]) = {
      b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }; a
    }
    val merged =
      if (binnedRdd.getNumPartitions <= 256)
        binnedRdd.mapPartitions { it =>
          val m = scala.collection.mutable.HashMap.empty[(Any, Long), Long]
          it.foreach(seqOp(m, _))
          Iterator.single(m)
        }.collect().foldLeft(
          scala.collection.mutable.HashMap.empty[(Any, Long), Long])(combOp)
      else
        binnedRdd.treeAggregate(
          scala.collection.mutable.HashMap.empty[(Any, Long), Long])(
          seqOp, combOp, depth = 2)
    val histogram: Map[Any, Seq[(Long, Long)]] = merged.toSeq
      .groupBy(_._1._1)
      .map { case (g, rows) =>
        g -> rows.map { case ((_, b), c) => b -> c }.sortBy(_._1)
      }
    val outSchema = StructType(groupField.copy(name = group) +:
      StructField("n", LongType) +:
      ps.map { case (_, nm) => StructField(nm, DoubleType) })
    if (histogram.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    }
    val counts: Map[Any, Long] = histogram.map { case (g, bs) => g -> bs.map(_._2).sum }
    // (group, slot) → (bin holding target rank, 1-indexed rank k in bin)
    val located: Seq[(Any, String, Long, Long)] =
      histogram.toSeq.flatMap { case (g, cum) =>
        val n = counts(g)
        ps.flatMap { case (p, nm) =>
          val pos = p * (n - 1)
          Seq(s"$nm:lo" -> math.floor(pos).toLong,
            s"$nm:hi" -> math.ceil(pos).toLong)
        }.map { case (slot, tRank) =>
          var before = 0L
          val (bin, _) = cum.find { case (_, c) =>
            if (tRank < before + c) true else { before += c; false }
          }.get
          (g, slot, bin, tRank - before + 1)
        }
      }
    val hotBins: Seq[(Any, Long)] = located.map { case (g, _, b, _) => (g, b) }.distinct
    val subsetSize = hotBins.map { case (g, b) =>
      histogram(g).collectFirst { case (`b`, c) => c }.get
    }.sum
    // null-safe group equality: SQL GROUP BY emits a NULL group, and a
    // plain === against lit(null) would silently drop it from the
    // refinement subset (then crash the k-th-value lookup)
    val hotPred = hotBins.map { case (g, b) =>
      (col("g") <=> lit(g)) && col("bin") === lit(b)
    }.reduce(_ || _)
    val subset = base.withColumn("bin", binE).filter(hotPred)

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
        val wantPred = located.map { case (g, _, b, k) =>
          (col("g") <=> lit(g)) && col("bin") === lit(b) && col("r") === lit(k)
        }.distinct.reduce(_ || _)
        subset
          .withColumn("r", row_number().over(
            Window.partitionBy("g", "bin").orderBy("v")))
          .filter(wantPred)
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
