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

  test("x41 segment dedup: one survivor per distinct segment, untouched docs round-trip") {
    val out = DedupQueries.x41SegmentDedup.run(spark, sf01).collect()
    val docs = graft.sources.Tables.load(spark, sf01, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size, "one output row per document")
    out.foreach { r =>
      val (n, kept, ret) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(kept <= n && kept >= 0)
      assert(math.abs(ret - kept.toDouble / n) < 1e-12)
    }
    // exactly one occurrence of each distinct segment survives corpus-wide
    val seg = DedupQueries.SEGMENT_WORDS
    val distinctSegs = docs.values.flatMap(t =>
      t.split(" ", -1).grouped(seg).map(_.mkString(" "))).toSet.size
    assert(out.map(_.getLong(2)).sum === distinctSegs.toLong,
      "total kept segments must equal the corpus's distinct segment count")
    assert(out.map(_.getLong(2)).sum < out.map(_.getLong(1)).sum,
      "the drop path must actually fire on this corpus")
    // a doc that lost nothing reassembles to its original text
    val untouched = out.filter(r => r.getLong(1) === r.getLong(2))
    assert(untouched.nonEmpty)
    untouched.foreach(r => assert(r.getString(3) === docs(r.getLong(0))))
  }

  test("x40 semantic dedup: keep-first verdicts consistent, in-cluster keepers") {
    val out = SimilarityQueries.x40SemanticDedup.run(spark, sf01).collect()
    assert(out.length === 500)
    val cid = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    var dups = 0
    out.foreach { r =>
      val (vec, isDup, dupOf, nnSim) =
        (r.getLong(0), r.getBoolean(2), r.getLong(3), r.getDouble(4))
      assert(isDup === (nnSim >= 0.35), s"verdict/threshold mismatch for $vec")
      if (isDup) {
        dups += 1
        assert(dupOf >= 0 && dupOf < vec, "keeper must be an earlier vector")
        assert(cid(dupOf) === cid(vec), "keeper must share the cluster")
      } else assert(dupOf === -1L)
    }
    assert(dups > 0, "threshold must exercise the drop path at sf0.01")
  }

  test("x42 source overlap: cells partition the x4 near-dup pair set") {
    val cells = DedupQueries.x42SourceOverlap.run(spark, sf01).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "pair must be normalized")
      val wj = r.getDouble(5)
      // mediant inequality: Σinter/Σunion lies between the min and max
      // per-pair inter/union, and every contributing pair is >= 0.5
      assert(wj >= 0.5 && wj <= 1.0, s"weighted jaccard $wj out of range")
    }
    val x4Pairs = DedupQueries.x4NgramJaccard.run(spark, sf01).count()
    assert(cells.map(_.getLong(2)).sum === x4Pairs,
      "cell pair counts must sum to the x4 jaccard>=0.5 pair count")
  }

  test("exact dedup audit: n_unique <= n_docs and dupes consistent") {
    DedupQueries.x1DedupExact.run(spark, sf01).collect().foreach { r =>
      val (n, u, de) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u <= n && de === n - u)
    }
  }
}
