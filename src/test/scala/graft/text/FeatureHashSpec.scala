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
}
