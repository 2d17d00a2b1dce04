package graft.analytics

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Q12 pseudonymization: the audit's own numbers against a
  * single-threaded recomputation of the keyed hash, plus the two release
  * invariants (injectivity, join preservation) and the salt's domain
  * separation.
  */
class PseudonymizationSpec extends SparkSpec {

  private def h(s: String): Long =
    graft.functions.Md5U60.hash(UTF8String.fromString(s))

  test("audit verdicts hold and match a single-threaded recomputation") {
    val rows = ExtendedSqlQueries.q12Pseudonymization.run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("customer", "orders", "custkey_join"))
    // every verdict ok, zero collisions, join pairs preserved and nonzero
    rows.values.foreach(r => assert(r.getString(7) === "ok", r.toString))
    assert(rows("customer").getLong(4) === 0L)
    assert(rows("orders").getLong(4) === 0L)
    val j = rows("custkey_join")
    assert(j.getLong(5) === j.getLong(6) && j.getLong(5) > 0L)
    // recompute the customer-side pseudonym census in plain Scala
    val keys = graft.sources.Tables.load(spark, sfDir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val pseud = keys.map(k => h(s"cust:$k")).toSet
    assert(rows("customer").getLong(2) === keys.distinct.length.toLong)
    assert(rows("customer").getLong(3) === pseud.size.toLong)
  }

  test("the salt domain-separates: pseudonym differs from the unsalted hash") {
    // a release pipeline hashing the bare key would be linkable to any
    // other dataset using the same function — the 'cust:' salt prefix
    // must change every pseudonym
    (1L to 50L).foreach { k =>
      assert(h(s"cust:$k") !== h(k.toString), s"key $k not domain-separated")
    }
  }
}
