package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IVFADC+R (x54) semantics pins.
  *
  * The load-bearing property of the ADC stage is that it is a SHORTLIST
  * heuristic in front of an exact re-rank — it may reorder candidates but
  * must never change the candidate universe. Two consequences are pinned
  * here:
  *
  *  1. with R covering every probed candidate, IVFADC+R degenerates to the
  *     exact-cosine IVF probe (`Ivf.topK`) bit-for-bit — same lists, same
  *     tie-breaks;
  *  2. hits against the exact probe's top-k are MONOTONE in R, because
  *     shortlists grow by inclusion and a true top-k member inside the
  *     shortlist always survives the exact re-rank window.
  */
class AdcSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"
  private lazy val queries =
    Tables.load(spark, sf01, "embeddings").filter(col("vec_id") < 8)

  private def exactProbe: Seq[(Long, Long, Int)] = {
    val (index, cents) = SimilarityQueries.ivfIndex(spark, sf01)
    Ivf.topK(index, cents, queries, nprobe = 2, k = 3)
      .select("q_id", "vec_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
  }

  private def adcAt(r: Int): Seq[(Long, Long, Int)] =
    SimilarityQueries.adcTopK(spark, sf01, queries, nprobe = 2, r = r, k = 3)
      .select("q_id", "vec_id", "rk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq.sorted

  test("with R covering every candidate, IVFADC+R equals the exact IVF probe") {
    assert(adcAt(Int.MaxValue) === exactProbe,
      "an all-covering shortlist must make the ADC stage invisible")
  }

  test("hits vs the exact probe are monotone in the re-rank depth R") {
    val exact = exactProbe.map(t => (t._1, t._2)).toSet
    val hits = Seq(3, 10, SimilarityQueries.ADC_R, 1000).map { r =>
      adcAt(r).map(t => (t._1, t._2)).toSet.intersect(exact).size
    }
    assert(hits === hits.sorted, s"hits must be monotone in R: $hits")
    assert(hits.last === exact.size,
      "R=1000 covers every sf0.01 candidate list, so hits must be total")
    assert(hits(2) > 0, s"R=${SimilarityQueries.ADC_R} found nothing")
  }

  test("R=1 emits exactly one (best-ADC, re-ranked) row per query") {
    val one = adcAt(1)
    assert(one.size === 8, s"expected 8 single-candidate rows, got $one")
    assert(one.forall(_._3 == 1))
  }
}
