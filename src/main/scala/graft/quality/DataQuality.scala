package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rule engine — the generalized form of the reference's dbt
  * business-rule macro and singular tests (SURVEY §2.8 Q1-Q5;
  * `.kiro/specs/batch-analytics-layer/design.md:734-742,824-850`).
  *
  * A rule is a named violation predicate over one table. `report` runs a
  * rule set in ONE pass per table (conditional sums, not one scan per
  * rule — at 100 TB, N rules must not mean N scans).
  */
object DataQuality {

  final case class Rule(name: String, table: String, violation: Column)

  /** Per-rule violation counts + rates, one scan per distinct table. */
  def report(tables: Map[String, DataFrame], rules: Seq[Rule]): DataFrame = {
    val byTable = rules.groupBy(_.table)
    val parts = byTable.map { case (tname, tableRules) =>
      val df = tables(tname)
      val aggs = count(lit(1)).as("total_rows") +:
        tableRules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.name))
      val counts = df.agg(aggs.head, aggs.tail: _*)
      val stacked = tableRules.map(r =>
        s"'${r.name}', `${r.name}`").mkString(", ")
      counts.selectExpr(s"stack(${tableRules.length}, $stacked) AS (rule, violations)",
          "total_rows")
        .select(lit(tname).as("table"), col("rule"), col("violations"),
          col("total_rows"),
          (col("violations").cast("double") / col("total_rows")).as("violation_rate"))
    }
    parts.reduce(_.unionByName(_)).orderBy("table", "rule")
  }

  /** Q2 — uniqueness: key groups occurring more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Q4 — referential integrity: child rows with no parent (left-anti). */
  def orphans(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)).distinct(),
      child(childKey) === parent(parentKey), "left_anti")

  /** Q5 — reconciliation: pair two metric tables on a key, verdict within
    * tolerance. */
  def reconcile(a: DataFrame, b: DataFrame, key: String,
      aVal: String, bVal: String, tolerance: Double): DataFrame =
    a.join(b, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col(aVal), lit(0.0)).as("a_value"),
        coalesce(col(bVal), lit(0.0)).as("b_value"))
      .withColumn("abs_diff", abs(col("a_value") - col("b_value")))
      .withColumn("within_tolerance",
        when(col("a_value") =!= 0.0,
          col("abs_diff") / abs(col("a_value")) <= tolerance)
          .otherwise(col("abs_diff") === 0.0))
}
