package graft.text

import graft.SparkSpec

/** X43 hashed tf-idf vectors: unit norm per document, bounded bucket
  * space, strictly positive integer weights (the ×16 idf smoothing
  * guarantees idf ≥ 4 even for ubiquitous tokens).
  */
class FeatureHashSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("x43 vectors are L2-normalized, bucket-bounded, positive") {
    val rows = TextQueries.x43HashedVectors.run(spark, sf01).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size === 500, "every document must vectorize")
    byDoc.values.foreach { vecRows =>
      assert(vecRows.length <= 64)
      val norm = vecRows.map(r => r.getDouble(3) * r.getDouble(3)).sum
      assert(math.abs(norm - 1.0) < 1e-9, s"unit norm violated: $norm")
    }
    rows.foreach { r =>
      val (bucket, wsum) = (r.getLong(1), r.getLong(2))
      assert(bucket >= 0 && bucket < 64)
      assert(wsum > 0, "smoothed idf must keep every weight positive")
    }
  }

  test("x44 source map covers every source pair with cosine in [0,1]") {
    val rows = TextQueries.x44SourceSimilarity.run(spark, sf01).collect()
    // 20 sources -> C(20,2) unordered pairs
    assert(rows.length === 190)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val cos = r.getDouble(3)
      // nonnegative weights => nonnegative cosine; same hashed space
      assert(cos >= 0.0 && cos <= 1.0 + 1e-12, s"cosine $cos out of range")
    }
    // same-vocabulary synthetic sources should look highly similar —
    // the map's job is the RELATIVE ordering, pin only the hard bounds
    assert(rows.map(_.getDouble(3)).max > 0.5)
  }
}
