package graft.dedup

import graft.SparkSpec

/** x63 record linkage: the engine's blocked+capped+scored census against
  * a single-threaded all-pairs brute force of the same semantics, plus
  * the planted-recall contract.
  */
class LinkageSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private case class Rec(rid: Long, name: String, nat: Long, bal: Long,
    seg: String)

  test("census equals an all-pairs brute force; every planted pair is a match") {
    val base = graft.sources.Tables.load(spark, sfDir, "customer")
      .selectExpr("CAST(c_custkey AS LONG)", "c_name",
        "CAST(c_nationkey AS LONG)",
        "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS LONG)", "c_mktsegment")
      .collect()
      .map(r => Rec(r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val recs = base ++ base.filter(_.rid % 7 == 3).map(r =>
      Rec(r.rid + 100000L, r.name.dropRight(1) + "x", r.nat, r.bal + 37,
        r.seg))
    // brute force: a pair is a candidate iff it shares an UNCAPPED block
    // in either pass (cap 512 — below sf0.001's worst block, asserted)
    def blocks(key: Rec => String) = {
      val m = recs.groupBy(key)
      assert(m.values.map(_.size).max <= 512, "cap must be inactive here")
      m
    }
    val byName = blocks(r => r.name.dropRight(2))
    // Scala Long `/` truncates toward zero, same as Spark DIV / DuckDB //
    val byBand = blocks(r => s"n${r.nat}:${r.bal / 10000}")
    val cand = (byName.values ++ byBand.values).flatMap { rs0 =>
      val rs = rs0.toSeq
      for (a <- rs; b <- rs if a.rid < b.rid) yield (a, b)
    }.toSet
    val expected = cand.toSeq.map { case (a, b) =>
      val score = (if (lev(a.name, b.name) <= 2) 24 else -10) +
        (if (math.abs(a.bal - b.bal) <= 100) 16 else -8) +
        (if (a.seg == b.seg) 4 else -4) +
        (if (a.nat == b.nat) 3 else -3)
      val verdict =
        if (score >= 30) "match" else if (score >= 10) "possible"
        else "nonmatch"
      (verdict, a.rid, b.rid)
    }
    val expCensus = expected.groupBy(_._1).map { case (v, ps) =>
      v -> ((ps.size.toLong, ps.count(p => p._3 == p._2 + 100000L).toLong))
    }
    val got = LinkageQueries.x63RecordLinkage.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expCensus)
    // planted-recall contract: every planted duplicate classifies as match
    val nPlanted = base.count(_.rid % 7 == 3).toLong
    assert(got("match")._2 === nPlanted, "planted recall must be 100%")
    assert(expected.count(p => p._2 + 100000L == p._3) === nPlanted,
      "blocking alone must already recover every planted pair")
  }
}
