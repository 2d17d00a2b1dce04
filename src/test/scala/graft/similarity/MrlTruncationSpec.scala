package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** x79 — Matryoshka truncation audit: planted geometries with
  * closed-form recalls, and a full fixed-point brute-force differential
  * on the real corpus.
  */
class MrlTruncationSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("x79: zero tails make every truncation lossless (recall 10000)") {
    // all signal in the first 8 dims -> widths 8/16/32/64 rank identically
    val rnd = new scala.util.Random(7)
    val rows = (0L until 30L).map { i =>
      i -> (Seq.fill(8)(rnd.nextFloat() - 0.5f) ++ Seq.fill(56)(0f))
    }
    val out = SimilarityQueries.mrlOf(frame(rows), Seq(8, 16, 32, 64),
        nQ = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((8L, 10000L, 10000L), (16L, 10000L, 10000L),
      (32L, 10000L, 10000L), (64L, 10000L, 10000L)))
  }

  test("x79: tail-only signal makes narrow truncations blind") {
    // vectors identical in the first 32 dims (ties -> vec_id order),
    // all discrimination in dims 33..64: width-64 ranks by real
    // similarity, widths <= 32 rank purely by id tie-break
    val rnd = new scala.util.Random(11)
    val head = Seq.fill(32)(0.5f)
    val rows = (0L until 40L).map { i =>
      i -> (head ++ Seq.fill(32)(rnd.nextFloat() - 0.5f))
    }
    val out = SimilarityQueries.mrlOf(frame(rows), Seq(16, 32, 64),
        nQ = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out(64L) === 10000L)
    // id-order top-5 vs similarity top-5: far from perfect on 40 vecs
    assert(out(16L) < 10000L)
    assert(out(16L) === out(32L)) // both rank by the same tie-break
  }

  test("x79: full query equals a fixed-point brute force on the corpus") {
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def q8(x: Float): Long = math.floor(x.toDouble * 1e8).toLong
    def dot(a: Array[Float], b: Array[Float], w: Int): Long = {
      var s = 0L; var i = 0
      while (i < w) { s += q8(a(i)) * q8(b(i)); i += 1 }
      s
    }
    val widths = Seq(8, 16, 32, 64)
    val qs = vecs.filter(_._1 < 10)
    def topk(w: Int): Map[Long, Seq[Long]] = qs.map { case (qid, qe) =>
      val qn = math.sqrt(dot(qe, qe, w).toDouble)
      qid -> vecs.filter(_._1 != qid).map { case (vid, ve) =>
        val cos = dot(qe, ve, w).toDouble /
          (qn * math.sqrt(dot(ve, ve, w).toDouble))
        (vid, cos)
      }.sortBy { case (vid, cos) => (-cos, vid) }.take(10).map(_._1).toSeq
    }.toMap
    val base = topk(64)
    val exp = widths.map { w =>
      val t = topk(w)
      val hits = qs.map { case (qid, _) =>
        t(qid).count(base(qid).contains) }.sum.toLong
      val top1 = qs.count { case (qid, _) =>
        t(qid).head == base(qid).head }.toLong
      (w.toLong, qs.length.toLong, hits * 10000 / (qs.length * 10),
        top1 * 10000 / qs.length)
    }
    val got = graft.SparkEntry.queries("x79_mrl_truncation")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === exp)
    assert(got.last._3 === 10000L) // full width vs itself
  }
}
