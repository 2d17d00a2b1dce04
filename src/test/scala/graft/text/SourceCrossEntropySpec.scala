package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x80 — source-pair cross-entropy matrix: closed-form planted
  * vocabularies (disjoint, identical, nested) and a full single-threaded
  * differential on the real corpus.
  */
class SourceCrossEntropySpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: Seq[(String, String)]) = rows.toDF("source", "tok")

  /** Independent fold: the exact x80 definition in plain Scala. */
  private def brute(rows: Seq[(String, String)])
      : Map[(String, String), (Long, Long)] = {
    val counts = rows.groupBy(identity).map { case ((s, t), xs) =>
      (s, t) -> xs.length.toLong }
    val v = rows.map(_._2).distinct.length.toLong
    val tot = counts.groupBy(_._1._1).map { case (s, m) =>
      s -> m.values.sum }
    def surp(b: String, t: String): Long = {
      val q = (tot(b) + v) / (counts.getOrElse((b, t), 0L) + 1)
      63L - java.lang.Long.numberOfLeadingZeros(q)
    }
    val srcs = tot.keys.toSeq
    (for (a <- srcs; b <- srcs) yield {
      val aToks = counts.filter(_._1._1 == a)
      val ssum = aToks.map { case ((_, t), c) =>
        BigInt(c) * surp(b, t) }.sum
      val totA = tot(a)
      (a, b) -> (totA, (ssum * 1000000 / totA).toLong)
    }).toMap
  }

  test("x80: disjoint vocabularies - self fits, cross maxes out") {
    // A says 'aa' x4, B says 'bb' x4: |V|=2
    // self: (4+2) div (4+1) = 1 -> surp 0; cross: (4+2) div 1 = 6 -> surp 2
    val rows = Seq.fill(4)(("A", "aa")) ++ Seq.fill(4)(("B", "bb"))
    val got = TextQueries.crossEntropyOf(toks(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("A", "A")) === ((0L, 1L)))
    assert(got(("A", "B")) === ((2000000L, 2L)))
    assert(got(("B", "A")) === ((2000000L, 2L)))
    assert(got(("B", "B")) === ((0L, 1L)))
  }

  test("x80: identical sources tie; fit_rank breaks by name") {
    val rows = Seq.fill(3)(("A", "x")) ++ Seq.fill(3)(("B", "x"))
    val got = TextQueries.crossEntropyOf(toks(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val xents = got.values.map(_._1).toSet
    assert(xents.size === 1) // all four cells identical
    assert(got(("A", "A"))._2 === 1L) // ties -> src_b name order
    assert(got(("A", "B"))._2 === 2L)
  }

  test("x80: planted fold equals the engine on a mixed vocabulary") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("v0", "v1", "v2", "v3", "v4", "v5", "v6")
    val rows = for {
      s <- Seq("sA", "sB", "sC")
      _ <- 1 to 40
    } yield (s, vocab(rnd.nextInt(if (s == "sA") 3 else 7)))
    val exp = brute(rows)
    val got = TextQueries.crossEntropyOf(toks(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === exp.keySet)
    got.foreach { case (k, v) => assert(v === exp(k), s"pair $k") }
  }

  test("x80: full query equals the single-threaded fold on the corpus") {
    val rows = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val exp = brute(rows)
    val got = graft.SparkEntry.queries("x80_source_crossentropy")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size === exp.size)
    got.foreach { case (k, v) => assert(v === exp(k), s"pair $k") }
  }
}
