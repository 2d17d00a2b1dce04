package graft.quality

import graft.QueryDef
import graft.sources.Tables

/** Oracle-gated data-contract audits built on [[Contract]]. */
object ContractQueries {

  /** The q20 contract: seven rules over orders + lineitem with ppm
    * acceptance thresholds chosen so the verdict set is a deterministic
    * pass/fail MIX on the synthetic corpus at every SF (discount_cap
    * fails its 10% ceiling at ~14.8% violations; qty bounds pass their
    * 2.5% ceilings at ~1%; the four domain/format/null rules are clean).
    */
  val q20Rules: Seq[(String, Seq[ContractRule])] = Seq(
    "orders" -> Seq(
      ContractRule("custkey_not_null", "not_null", "o_custkey"),
      ContractRule("priority_format", "regex", "o_orderpriority", "^[1-5]-"),
      ContractRule("status_domain", "in_set", "o_orderstatus", "O|F|P"),
      ContractRule("total_nonneg", "min", "o_totalprice", "0")),
    "lineitem" -> Seq(
      ContractRule("qty_min", "min", "l_quantity", "1", maxPpm = 25000),
      ContractRule("qty_max", "max", "l_quantity", "49", maxPpm = 25000),
      ContractRule("discount_cap", "max", "l_discount", "0.08",
        maxPpm = 100000)))

  /** Q20 — the contract compiler end-to-end: rules-as-data compiled to
    * one aggregation scan per table (vs dbt's one query per test),
    * verdicts as exact floor-division ppm against per-rule thresholds.
    */
  val q20ContractAudit = QueryDef(
    "q20_contract_audit",
    "declarative 7-rule data contract fused to one scan per table, ppm verdicts",
    (s, d) => {
      val byName = q20Rules.toMap
      Contract.auditAll(Seq(
          (Tables.load(s, d, "orders"), "orders", byName("orders")),
          (Tables.load(s, d, "lineitem"), "lineitem", byName("lineitem"))))
        .orderBy("tbl", "rule")
    },
    Some(Contract.auditAllSql(q20Rules) + "\nORDER BY tbl, rule"))

  def defs: Seq[QueryDef] = Seq(q20ContractAudit)
}
