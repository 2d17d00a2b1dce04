package graft.dedup

import graft.SparkSpec

/** X48 detector-recall calibration: the planted ladder is complete, and
  * recall falls monotonically as the mutation strength rises (the LSH
  * collision probability 1−(1−J⁴)⁴ is increasing in J).
  */
class DetectorRecallSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("x48 ladder is complete and recall is monotone in mutation strength") {
    val rows = DedupQueries.x48DedupRecall.run(spark, sf01).collect()
    assert(rows.length === 3)
    val planted = spark.read.parquet(s"$sf01/documents.parquet")
      .filter("doc_id % 5 = 0").count()
    rows.foreach { r =>
      assert(r.getLong(2) === planted, "every eligible doc must be planted")
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(5) === r.getLong(3) * 10000 / r.getLong(2))
    }
    val recalls = rows.sortBy(_.getLong(0)).map(_.getLong(5))
    assert(recalls(0) >= recalls(1) && recalls(1) >= recalls(2),
      s"recall must fall with mutation strength: ${recalls.toSeq}")
    // the gentlest mutation (1 token in 25) must be near-fully visible,
    // the harshest (1 in 7) must NOT be — otherwise the ladder isn't
    // actually probing the detector's sensitivity region
    assert(recalls(0) >= 9000, s"level-1 recall too low: ${recalls(0)}")
    assert(recalls(2) < recalls(0), s"ladder degenerate: ${recalls.toSeq}")
  }
}
