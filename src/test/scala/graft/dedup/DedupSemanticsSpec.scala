package graft.dedup

import graft.SparkSpec
import graft.similarity.SimilarityQueries
import org.apache.spark.sql.functions._

/** Semantic invariants of the dedup/similarity family on sf0.01 (the
  * correctness-gate scale, where near-duplicates are actually planted).
  */
class DedupSemanticsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("minhash est_jaccard within [0,1] and pairs are ordered a<b") {
    val rows = DedupQueries.x2MinHashLsh.run(spark, sf01).collect()
    assert(rows.nonEmpty, "no near-dup candidates found at sf0.01")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("minhash candidates cover the exact-jaccard>=0.5 pairs (recall)") {
    val exact = DedupQueries.x4NgramJaccard.run(spark, sf01)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupQueries.x2MinHashLsh.run(spark, sf01)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low vs exact Jaccard pairs")
  }

  test("simhash near-pairs have near-identical shingle sets (precision spot)") {
    val pairs = DedupQueries.x3SimHash.run(spark, sf01)
      .filter(col("hamming") === 0).limit(5).collect()
    assert(pairs.nonEmpty)
  }

  test("ann top-k is k rows per query, descending similarity") {
    val rows = SimilarityQueries.x6AnnTopK.run(spark, sf01).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 8)
    byQ.values.foreach { g =>
      assert(g.length === 5)
      val sims = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      sims.foreach(s => assert(s >= -1.0001 && s <= 1.0001))
    }
  }

  test("exact dedup audit: n_unique <= n_docs and dupes consistent") {
    DedupQueries.x1DedupExact.run(spark, sf01).collect().foreach { r =>
      val (n, u, de) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u <= n && de === n - u)
    }
  }
}
