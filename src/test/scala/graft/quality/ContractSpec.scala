package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContractSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "1-URGENT", 10.0),
    (2L, "9-BOGUS", -3.0),
    (null, "2-HIGH", 0.09),
    (4L, null, null),
    (5L, "3-MEDIUM", 49.5)
  ).toDF("k", "pri", "x")

  private val rules = Seq(
    ContractRule("k_not_null", "not_null", "k"),
    ContractRule("pri_format", "regex", "pri", "^[1-5]-"),
    ContractRule("pri_domain", "in_set", "pri",
      "1-URGENT|2-HIGH|3-MEDIUM|4-NOT SPECIFIED|5-LOW"),
    ContractRule("x_min", "min", "x", "0", maxPpm = 300000),
    ContractRule("x_max", "max", "x", "10", maxPpm = 300000))

  test("fused audit equals one-filter-per-rule scans, incl. NULL semantics") {
    val got = Contract.audit(df, "t", rules).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("violations"),
          r.getAs[Boolean]("passed"))).toMap
    // independent: count each rule's violations with a separate filter
    val expected = rules.map { r =>
      r.name -> df.filter(Contract.violation(r)).count()
    }.toMap
    assert(got.view.mapValues(_._2).toMap === expected)
    assert(got.values.forall(_._1 === 5L))
    // NULL pri violates regex AND in_set; NULL x violates neither bound
    assert(expected("pri_format") === 2L) // 9-BOGUS + null
    assert(expected("pri_domain") === 2L) // 9-BOGUS + null
    assert(expected("x_min") === 1L) // only -3.0 (null not a violation)
    assert(expected("x_max") === 1L) // only 49.5
    // verdicts: 1/5 = 200000 ppm passes the 300000 thresholds; clean
    // rules with maxPpm 0 fail when violations exist
    assert(got("x_min")._3 && got("x_max")._3)
    assert(!got("k_not_null")._3 && !got("pri_format")._3)
  }

  test("N rules compile to a single scan of the input") {
    val plan = Contract.audit(df, "t", rules).queryExecution.executedPlan
    val scans = plan.collectLeaves()
    assert(scans.size === 1, s"expected 1 leaf scan, got:\n$plan")
  }

  test("unknown kind and duplicate names are rejected at compile time") {
    intercept[IllegalArgumentException] {
      Contract.violation(ContractRule("bad", "between", "x", "1"))
    }
    intercept[IllegalArgumentException] {
      Contract.audit(df, "t", rules :+ rules.head)
    }
  }

  test("q20 verdict mix at sf0.001: discount_cap fails, the rest pass") {
    val out = ContractQueries.q20ContractAudit.run(spark, sfDir).collect()
    assert(out.length === 7)
    val verdicts = out.map(r =>
      r.getAs[String]("rule") -> r.getAs[Boolean]("passed")).toMap
    assert(verdicts === Map(
      "custkey_not_null" -> true, "priority_format" -> true,
      "status_domain" -> true, "total_nonneg" -> true,
      "qty_min" -> true, "qty_max" -> true, "discount_cap" -> false))
    // ppm arithmetic is floor-exact: re-derive discount_cap's ppm
    val dc = out.find(_.getAs[String]("rule") == "discount_cap").get
    assert(dc.getAs[Long]("viol_ppm") ===
      1000000L * dc.getAs[Long]("violations") / dc.getAs[Long]("n_rows"))
  }
}
