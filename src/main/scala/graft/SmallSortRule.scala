package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** AQE runtime rewrite: a global sort over a RUNTIME-SMALL child becomes
  * a single-partition local sort (`coalesce(1)` + per-partition sort).
  *
  * Every inventory query ends in a deterministic `orderBy`, and for the
  * census/report-shaped majority the sorted output is a few KB — yet a
  * global sort plans a RANGE exchange, which costs a bounds-sampling
  * pass plus one more shuffle stage per run (measured on the bench box:
  * a census body at 0.20 s bare ran 0.24 s with `orderBy` and 0.13 s
  * with `coalesce(1).sortWithinPartitions` — the coalesce also collapses
  * the preceding aggregate's 32 near-empty reduce tasks into one).
  *
  * Scale safety is BY CONSTRUCTION, not by estimate: this is an AQE
  * runtime-optimizer rule, so it only ever sees the sort's child after
  * its query stages materialized, and it fires only when the runtime
  * row count is KNOWN and small (both `rowCount` defined and under the
  * caps). A corpus-shaped sorted output (per-doc reports, SCD2 history)
  * reads as MBs/GBs at runtime and keeps the range exchange — at 100 TB
  * the rule is an identity except on genuinely bounded frames, exactly
  * the frames a single task sorts faster than a sampling pass + shuffle.
  *
  * Semantics: total order in == total order out — a one-partition local
  * sort IS a global sort; row values untouched.
  * `spark.graft.smallSort.maxRows` / `spark.graft.smallSort.maxBytes`
  * tune the caps; `spark.graft.smallSort.enabled=false` disables (the
  * keys the code actually reads — r18 ADVICE flagged the docstring
  * naming an unprefixed variant that was silently ignored).
  */
case class SmallSortRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.smallSort.enabled", "true").toBoolean
  private def maxRows: Long =
    spark.conf.get("spark.graft.smallSort.maxRows", "200000").toLong
  private def maxBytes: Long =
    spark.conf.get("spark.graft.smallSort.maxBytes", (16L << 20).toString).toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case s @ Sort(_, true, child, _) =>
        val st = child.stats
        val small = st.rowCount.exists(rc =>
          rc <= maxRows && st.sizeInBytes <= maxBytes)
        if (small)
          s.copy(global = false,
            child = Repartition(1, shuffle = false, child))
        else s
    }
  }
}
