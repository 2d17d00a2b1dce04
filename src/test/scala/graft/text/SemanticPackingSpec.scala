package graft.text

import graft.SparkSpec

/** x70: the semantic order must actually beat the doc_id baseline on
  * both adjacency metrics — otherwise the reorder buys nothing and the
  * packer should keep the cheap order.
  */
class SemanticPackingSpec extends SparkSpec {

  test("x70: semantic order lifts adjacent-pair cosine and same-topic " +
    "adjacency over the doc_id baseline") {
    val rows = TextQueries.x70SemanticPacking.run(spark, sfDir)
      .collect().map(r => r.getAs[String]("order_kind") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_cos_bp"),
          r.getAs[Long]("same_topic_pairs"))).toMap
    val (nId, cosId, topicId) = rows("docid")
    val (nSem, cosSem, topicSem) = rows("semantic")
    assert(nId === nSem, "both orders pair the same corpus")
    assert(cosSem > cosId,
      s"semantic order must lift adjacent cosine: $cosSem vs $cosId bp")
    // topic-sorted: nearly every adjacent pair shares a topic (only the
    // k-1 topic boundaries break adjacency)
    assert(topicSem >= nSem - 16,
      s"topic-contiguous order broken: $topicSem of $nSem pairs")
    assert(topicSem > topicId * 2,
      s"baseline should scatter topics: $topicSem vs $topicId")
  }
}
