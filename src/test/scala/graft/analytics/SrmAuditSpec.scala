package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q22 — A/B assignment + SRM audit: assignment determinism, a planted
  * biased population that must flag, the balanced-population no-flag
  * guard, and the closed-form chi-square check.
  */
class SrmAuditSpec extends SparkSpec {
  import spark.implicits._

  private def uids(xs: Seq[String]) = xs.toDF("uid")

  test("q22: assignment is deterministic and salt-sensitive") {
    val users = (1 to 500).map(i => s"u$i")
    val a1 = ExtendedSqlQueries.srmOf(uids(users), "exp1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a2 = ExtendedSqlQueries.srmOf(uids(users), "exp1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a1 === a2) // same salt -> identical census on re-run
    val b = ExtendedSqlQueries.srmOf(uids(users), "exp2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b !== a1) // new salt -> a different (still ~50/50) split
    assert(a1.values.sum === 500L && b.values.sum === 500L)
  }

  test("q22: a biased population flags SRM with the exact chi-square") {
    // keep only variant-A users from a large pool, plus a token B tail:
    // a broken logging pipeline that drops one arm
    val pool = (1 to 2000).map(i => s"u$i")
    val aSide = ExtendedSqlQueries.srmOf(uids(pool), "exp1")
    // derive which uids hash to A by filtering through the same core
    val aUids = pool.filter { u =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((u + "#exp1").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val swapped = (7 to 0 by -1).map(i =>
        hex.substring(16 + 2 * i, 18 + 2 * i)).mkString
      val v = java.lang.Long.parseLong(swapped.substring(0, 15), 16)
      v % 100 < 50
    }
    val biased = aUids ++ pool.filterNot(aUids.contains).take(10)
    val out = ExtendedSqlQueries.srmOf(uids(biased), "exp1")
      .collect()
    val n = biased.length.toLong
    val a = aUids.length.toLong
    val chi2 = ((2 * a - n) * (2 * a - n) * 10000L) / n
    assert(out.forall(_.getLong(4) === chi2))
    assert(chi2 > 38410L)
    assert(out.forall(r => r.getBoolean(5)))
    // and the untampered pool does NOT flag
    val clean = ExtendedSqlQueries.srmOf(uids(pool), "exp1").collect()
    assert(clean.forall(r => !r.getBoolean(5)))
  }

  test("q22: full query matches an independent md5 fold on customers") {
    val custs = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").cast("string")).collect().map(_.getString(0))
    val a = custs.count { u =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((u + "#exp1").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val swapped = (7 to 0 by -1).map(i =>
        hex.substring(16 + 2 * i, 18 + 2 * i)).mkString
      java.lang.Long.parseLong(swapped.substring(0, 15), 16) % 100 < 50
    }.toLong
    val n = custs.length.toLong
    val got = graft.SparkEntry.queries("q22_srm_audit")(spark, sfDir)
      .orderBy("variant").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(a, n - a))
    val chi2 = ((2 * a - n) * (2 * a - n) * 10000L) / n
    assert(got.forall(_.getLong(4) === chi2))
  }
}
