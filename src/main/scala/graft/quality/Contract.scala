package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract rule: `kind` picks the predicate template,
  * `column`/`param` fill it, `maxPpm` is the acceptance threshold
  * (violations per million rows; 0 = must be clean).
  *
  * Kinds: `not_null`; `min`/`max` (numeric bound, violations are rows
  * strictly outside); `in_set` (param = `|`-separated domain); `regex`
  * (param = pattern shared by Spark RLIKE and DuckDB `regexp_matches` —
  * keep to the common dialect). For `in_set`/`regex` a NULL value counts
  * as a violation (it is not in the domain / does not match).
  */
final case class ContractRule(name: String, kind: String, column: String,
    param: String = "", maxPpm: Long = 0L)

/** Compiles a rule list into ONE aggregation pass over the table.
  *
  * The dbt/Great-Expectations execution model runs one query per test —
  * at 100 TB that is one full table scan per rule. Here N rules become N
  * conditional-sum agg expressions in a single scan (map-side
  * combinable, whole-stage-codegen'd), then the 1×(N+1) result row is
  * unpivoted with `stack` into the per-rule report. Cost is one pass
  * regardless of rule count; the spec pins the single-scan plan shape.
  *
  * Reference behavior: the reference's dbt test suite
  * (`.kiro/specs/batch-analytics-layer/design.md:734-850`) — same
  * verdicts, fused execution.
  */
object Contract {

  def violation(r: ContractRule): Column = r.kind match {
    case "not_null" => col(r.column).isNull
    case "min" => col(r.column) < lit(r.param.toDouble)
    case "max" => col(r.column) > lit(r.param.toDouble)
    case "in_set" =>
      !coalesce(col(r.column).isin(r.param.split('|').toSeq: _*), lit(false))
    case "regex" => !coalesce(col(r.column).rlike(r.param), lit(false))
    case k => throw new IllegalArgumentException(s"unknown rule kind: $k")
  }

  /** One-scan audit of `df` under `rules`: per rule one row
    * (tbl, rule, n_rows, violations, viol_ppm, threshold_ppm, passed).
    * `viol_ppm` uses floor division so the verdict is exact-integer.
    */
  def audit(df: DataFrame, table: String, rules: Seq[ContractRule]): DataFrame = {
    require(rules.nonEmpty, "empty contract")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(violation(r), 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', __v$i, ${r.maxPpm}L" }
      .mkString(", ")
    one.select(col("n_rows"),
        expr(s"stack(${rules.size}, $stacked)")
          .as(Seq("rule", "violations", "threshold_ppm")))
      .select(lit(table).as("tbl"), col("rule"), col("n_rows"),
        col("violations"),
        expr("1000000 * violations DIV n_rows").as("viol_ppm"),
        col("threshold_ppm"))
      .withColumn("passed", col("viol_ppm") <= col("threshold_ppm"))
  }

  /** Row-level verdict: `df` plus a `violated` array of the rule names
    * each row breaks (empty = clean). One projection, no aggregation —
    * the per-row form the streaming gate routes on.
    */
  def flag(df: DataFrame, rules: Seq[ContractRule]): DataFrame = {
    require(rules.nonEmpty, "empty contract")
    val names = rules.map(r =>
      when(violation(r), lit(r.name)).otherwise(lit(null: String)))
    df.withColumn("violated",
      filter(array(names: _*), c => c.isNotNull))
  }

  /** Multi-table contract: one [[audit]] scan per table, unioned. */
  def auditAll(contracts: Seq[(DataFrame, String, Seq[ContractRule])]): DataFrame =
    contracts.map { case (df, t, rs) => audit(df, t, rs) }
      .reduce(_ unionByName _)

  /** DuckDB mirror of one rule's violation predicate. */
  def violationSql(r: ContractRule): String = r.kind match {
    case "not_null" => s"${r.column} IS NULL"
    case "min" => s"${r.column} < ${r.param}"
    case "max" => s"${r.column} > ${r.param}"
    case "in_set" =>
      val set = r.param.split('|').map(v => s"'$v'").mkString(", ")
      s"NOT coalesce(${r.column} IN ($set), false)"
    case "regex" =>
      s"NOT coalesce(regexp_matches(${r.column}, '${r.param}'), false)"
    case k => throw new IllegalArgumentException(s"unknown rule kind: $k")
  }

  /** DuckDB mirror of [[auditAll]]: same one-aggregation-per-table shape
    * (a single scan computing every rule's conditional sum, then per-rule
    * projection rows unioned).
    */
  def auditAllSql(contracts: Seq[(String, Seq[ContractRule])]): String = {
    val ctes = contracts.map { case (t, rs) =>
      val sums = rs.zipWithIndex.map { case (r, i) =>
        s"CAST(sum(CASE WHEN ${violationSql(r)} THEN 1 ELSE 0 END) AS BIGINT) AS v$i"
      }.mkString(", ")
      s"agg_$t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, $sums FROM $t)"
    }.mkString(",\n")
    val rows = contracts.flatMap { case (t, rs) =>
      rs.zipWithIndex.map { case (r, i) =>
        s"""SELECT '$t' AS tbl, '${r.name}' AS rule, n_rows,
           |       v$i AS violations,
           |       CAST(1000000 * v$i // n_rows AS BIGINT) AS viol_ppm,
           |       CAST(${r.maxPpm} AS BIGINT) AS threshold_ppm,
           |       1000000 * v$i // n_rows <= ${r.maxPpm} AS passed
           |FROM agg_$t""".stripMargin
      }
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows"
  }
}
