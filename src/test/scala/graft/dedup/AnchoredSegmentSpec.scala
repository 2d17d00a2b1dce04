package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** x52 content-defined segment dedup vs x41's fixed grid: plant a passage
  * duplicated at a 3-word offset — the case Lee et al.'s suffix arrays
  * exist for. The fixed 8-word grid provably shares NO segment between
  * the two copies (every cell straddles the offset); the CDC-anchored
  * cutter chunks both copies into identical interior segments, so the
  * duplicate is found and dropped.
  *
  * Token anchor set is deterministic (md5): among p1..p40 the anchors are
  * p7, p17, p22, p32, p34, and none of j1..j3 — so the two copies share
  * exactly the 5 segments starting at those anchors.
  */
class AnchoredSegmentSpec extends SparkSpec {
  import spark.implicits._

  private val passage = (1 to 40).map(i => s"p$i").mkString(" ")
  private val corpus = Seq(
    (1L, passage),                 // first occurrence
    (2L, s"j1 j2 j3 $passage"))    // same passage, offset by 3 words

  private def df: DataFrame = {
    graft.GraftExtensions.ensure(spark)
    corpus.toDF("doc_id", "text")
  }

  private def segTexts(segs: DataFrame, id: Long): Set[String] =
    segs.filter(segs("doc_id") === id).select("seg")
      .collect().map(_.getString(0)).toSet

  test("the fixed grid shares no segment across a 3-word offset (the blindspot)") {
    val segs = DedupQueries.gridSegments(df)
    assert(segTexts(segs, 1L).intersect(segTexts(segs, 2L)).isEmpty)
  }

  test("content-defined anchors re-align: the copies share the interior segments") {
    val segs = DedupQueries.anchoredSegments(df)
    val shared = segTexts(segs, 1L).intersect(segTexts(segs, 2L))
    assert(shared == Set(
      (7 to 16).map(i => s"p$i").mkString(" "),
      (17 to 21).map(i => s"p$i").mkString(" "),
      (22 to 31).map(i => s"p$i").mkString(" "),
      (32 to 33).map(i => s"p$i").mkString(" "),
      (34 to 40).map(i => s"p$i").mkString(" ")))
  }

  test("the offset duplicate is dropped from the later doc, kept in the first") {
    val report = DedupQueries.segmentDedupReport(
        DedupQueries.anchoredSegments(df))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val (n1, k1, t1) = report(1L)
    val (n2, k2, t2) = report(2L)
    assert(n1 == k1 && t1 == passage)        // first occurrence fully retained
    assert(n2 - k2 == 5, s"expected 5 dropped segments, got ${n2 - k2}")
    assert(t2 == "j1 j2 j3 " + (1 to 6).map(i => s"p$i").mkString(" "))
  }
}
