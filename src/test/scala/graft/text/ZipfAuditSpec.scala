package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** x82 — Zipf audit: an exact power-of-two Zipf geometry (slope −10000
  * on the nose), a flat-corpus degenerate guard, and the full corpus
  * differential against a single-threaded fold.
  */
class ZipfAuditSpec extends SparkSpec {
  import spark.implicits._

  test("x82: power-of-two Zipf geometry fits slope exactly -10000") {
    // 2^(k-b) types at frequency 2^b for b = k..0, k = 6:
    // bucket b holds 2^(k-b) types; cum_types(>=b) = 2^(k-b+1) - 1,
    // whose floor-log2 is exactly k-b -> points (k-b, b) are the line
    // y = k - x -> integer least squares reads slope_bp = -10000
    val k = 6
    val toks = (0 to k).flatMap { b =>
      (0 until (1 << (k - b))).flatMap { t =>
        Seq.fill(1 << b)(s"w_${b}_$t")
      }
    }
    val out = TextQueries.zipfOf(toks.toDF("tok")).collect()
    assert(out.length === k + 1)
    assert(out.forall(_.getLong(5) === -10000L))
    // bucket census exact: 2^(k-b) types, mass 2^k each bucket
    out.foreach { r =>
      val b = r.getLong(0).toInt
      assert(r.getLong(1) === (1L << (k - b)), s"types at $b")
      assert(r.getLong(2) === (1L << k), s"mass at $b")
      assert(r.getLong(4) === (k - b).toLong, s"log2_rank at $b")
    }
  }

  test("x82: a flat corpus is degenerate - one point, slope 0") {
    val toks = (0 until 32).flatMap(t => Seq.fill(4)(s"t$t"))
    val out = TextQueries.zipfOf(toks.toDF("tok")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(5) === 0L)
  }

  test("x82: full query equals a single-threaded fold on the corpus") {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .collect().map(_.getString(0))
    def lg(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val hist = toks.groupBy(identity).map(_._2.length.toLong)
      .groupBy(lg).map { case (b, cs) =>
        b -> (cs.size.toLong, cs.sum) }
    val desc = hist.toSeq.sortBy(-_._1)
    var cum = 0L
    val pts = desc.map { case (b, (types, mass)) =>
      cum += types
      (b, types, mass, cum, lg(cum))
    }
    val n = BigInt(pts.length)
    val (sx, sy) = (pts.map(p => BigInt(p._5)).sum, pts.map(p => BigInt(p._1)).sum)
    val sxx = pts.map(p => BigInt(p._5) * p._5).sum
    val sxy = pts.map(p => BigInt(p._5) * p._1).sum
    val den = n * sxx - sx * sx
    val slope = if (den == 0) 0L
      else (((n * sxy - sx * sy) * 10000) / den).toLong
    val exp = pts.sortBy(_._1).map(p => (p._1, p._2, p._3, p._4, p._5, slope))
    val got = graft.SparkEntry.queries("x82_zipf_audit")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === exp)
  }
}
