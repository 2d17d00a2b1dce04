package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB path.
  *
  * AQE's skew-join split (enabled in GraftSession) handles moderate skew
  * at runtime; these operators are the explicit form for *extreme* hot
  * keys (a handful of keys holding a double-digit percentage of rows —
  * e.g. stopword shingles in the dedup inverted index, null-ish default
  * keys in CDC streams), where a single post-split partition is still too
  * large.
  *
  * Both operators are deterministic: salts derive from row content, not
  * `rand()`, so retried tasks and replayed stages produce identical
  * results (required for exactly-once sinks and the correctness oracle).
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the given columns. */
  def saltCol(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Skew-safe equi-join of a huge skewed `big` side against a small-ish
    * `small` side: `big` gets a content-derived salt, `small` is exploded
    * to every salt value, and the join key becomes (key, salt) — hot keys
    * spread across `buckets` reducers instead of one.
    *
    * Result equals `big.join(small, bigKey === smallKey, joinType)` for
    * `inner` and `left` joins (each big row still matches exactly the
    * same small rows).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, buckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedBig = big.withColumn("__salt",
      saltCol(buckets, big.columns.map(col).toSeq: _*))
    val saltedSmall = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedBig
      .join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Two-phase (salted) aggregation for extreme-skew groupings whose
    * per-key state is large (e.g. `countDistinct`, `collect_set`): phase 1
    * aggregates (key, salt) groups, phase 2 merges the per-salt partials.
    * For plain algebraic aggs (sum/count/min/max) Spark's map-side partial
    * aggregation already does this — use it only when the merge state
    * itself is the bottleneck.
    *
    * `distinctCol` demonstrates the pattern for exact distinct counts:
    * phase 1 dedups (key, salt, value), phase 2 counts — the expensive
    * dedup state is spread across salts.
    */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String],
      distinctCol: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(buckets, col(distinctCol)))
    salted
      .select((keyCols :+ "__salt" :+ distinctCol).map(col): _*)
      .distinct() // phase 1: dedup within (key, salt)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_distinct_$distinctCol"))
  }
}
