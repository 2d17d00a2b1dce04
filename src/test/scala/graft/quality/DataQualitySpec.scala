package graft.quality

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
  private lazy val lineitem = Tables.load(spark, sfDir, "lineitem")
  private lazy val customer = Tables.load(spark, sfDir, "customer")

  test("report runs a rule set in one pass per table with rates") {
    val rules = Seq(
      DataQuality.Rule("total_negative", "orders", col("o_totalprice") < 0),
      DataQuality.Rule("status_unknown", "orders",
        !col("o_orderstatus").isin("O", "F", "P")),
      DataQuality.Rule("quantity_range", "lineitem",
        col("l_quantity") <= 0 || col("l_quantity") > 50))
    val rep = DataQuality.report(
      Map("orders" -> orders, "lineitem" -> lineitem), rules).collect()
    assert(rep.length === 3)
    val byRule = rep.map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(byRule("total_negative")._1 === 0)
    assert(byRule("quantity_range")._1 === 0)
    assert(byRule("total_negative")._2 === orders.count())
    // a deliberately failing rule reports a correct non-zero rate
    val rep2 = DataQuality.report(Map("orders" -> orders),
      Seq(DataQuality.Rule("fulfilled", "orders", col("o_orderstatus") === "F")))
      .head()
    val expected = orders.filter(col("o_orderstatus") === "F").count()
    assert(rep2.getLong(2) === expected)
    assert(math.abs(rep2.getDouble(4) - expected.toDouble / orders.count()) < 1e-12)
  }

  test("duplicateKeys finds planted duplicates and respects uniqueness") {
    assert(DataQuality.duplicateKeys(orders, Seq("o_orderkey")).count() === 0)
    val dup = orders.limit(5).unionByName(orders.limit(3))
    assert(DataQuality.duplicateKeys(dup, Seq("o_orderkey")).count() === 3)
  }

  test("orphans: clean FK edge is empty; broken edge surfaces rows") {
    assert(DataQuality.orphans(orders, customer, "o_custkey", "c_custkey")
      .count() === 0)
    val truncated = customer.filter(col("c_custkey") < 10)
    val n = DataQuality.orphans(orders, truncated, "o_custkey", "c_custkey").count()
    assert(n === orders.filter(col("o_custkey") >= 10).count())
  }

  test("reconcile flags values outside tolerance") {
    import spark.implicits._
    val a = Seq(("m1", 100.0), ("m2", 100.0), ("m3", 0.0))
      .toDF("k", "va")
    val b = Seq(("m1", 104.0), ("m2", 110.0), ("m3", 0.0))
      .toDF("k", "vb")
    val rec = DataQuality.reconcile(a, b, "k", "va", "vb", 0.05)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(rec === Map("m1" -> true, "m2" -> false, "m3" -> true))
  }
}
