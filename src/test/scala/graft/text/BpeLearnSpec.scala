package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Distributed BPE learn ≡ a single-threaded reference, merge for merge,
  * over both a hand-checked corpus and real documents.
  */
class BpeLearnSpec extends SparkSpec {

  /** The naive reference: full pair scan, max count with UTF-8 BYTE-order
    * tie-break (Spark's string collation — Java's UTF-16 compareTo
    * diverges for supplementary characters), greedy left-to-right rewrite.
    */
  private val u8: Ordering[String] = (x: String, y: String) =>
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def referenceLearn(corpus: Seq[Seq[String]], k: Int): Seq[(String, String, Long)] = {
    var seqs = corpus.map(_.toIndexedSeq)
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { s =>
        var i = 0
        while (i + 1 < s.length) {
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + 1
          i += 1
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), n) = eligible.minBy { case ((a, b), n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, u8, u8))
        out += ((a, b, n))
        seqs = seqs.map(s => BpeLearn.mergeOnce(s, a, b))
      }
      round += 1
    }
    out.result()
  }

  test("mergeOnce is greedy left-to-right: 'a a a' -> [aa, a]") {
    assert(BpeLearn.mergeOnce(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
    assert(BpeLearn.mergeOnce(Vector("a", "a", "a", "a"), "a", "a")
      === Vector("aa", "aa"))
    assert(BpeLearn.mergeOnce(Vector("x", "a", "a", "y"), "a", "a")
      === Vector("x", "aa", "y"))
  }

  test("distributed learn equals the reference on a hand corpus") {
    import spark.implicits._
    val corpus: Seq[Seq[String]] = Seq(
      "l o w", "l o w e r", "l o w e s t", "n e w", "n e w e s t",
      "w i d e", "w i d e s t").map(_.split(" ").toSeq)
    val df = corpus.toDF("toks")
    val learned = BpeLearn.learn(df, 6).map(m => (m.a, m.b, m.count))
    val expected = referenceLearn(corpus, 6)
    assert(learned === expected, s"learned=$learned expected=$expected")
    assert(learned.nonEmpty && learned.head._3 >= learned.last._3)
  }

  test("distributed learn equals the reference on real documents") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 40)
      .select(split(lower(col("text")), " ").as("toks"))
    val corpus = docs.as[Seq[String]].collect().toSeq
    val learned = BpeLearn.learn(docs, 5).map(m => (m.a, m.b, m.count))
    val expected = referenceLearn(corpus, 5)
    assert(learned === expected, s"learned=$learned expected=$expected")
  }

  test("empty and single-token sequences are pair-free, not a crash") {
    import spark.implicits._
    val corpus: Seq[Seq[String]] = Seq(
      Seq.empty, Seq("solo"), "a b a b".split(" ").toSeq)
    val learned = BpeLearn.learn(corpus.toDF("toks"), 2)
      .map(m => (m.a, m.b, m.count))
    assert(learned === referenceLearn(corpus, 2))
    assert(learned.head === (("a", "b", 2L)))
  }

  test("count ties break on UTF-8 bytes (supplementary chars after U+FFFF BMP)") {
    import spark.implicits._
    // U+1F600 (emoji, surrogate pair D83D DE00) vs U+FFFD (BMP): UTF-16
    // compareTo sorts the emoji FIRST (D83D < FFFD), UTF-8 bytes sort it
    // AFTER (F0… > EF…) — the tie must resolve the UTF-8 way on both
    // sides of the differential
    val emoji = new String(Character.toChars(0x1F600))
    val bmp = "�"
    val corpus: Seq[Seq[String]] = Seq(
      Seq("x", emoji), Seq("x", emoji),
      Seq("x", bmp), Seq("x", bmp))
    val learned = BpeLearn.learn(corpus.toDF("toks"), 1)
      .map(m => (m.a, m.b, m.count))
    assert(learned === referenceLearn(corpus, 1))
    assert(learned.head._2 === bmp,
      "UTF-8 byte order must pick the BMP token over the emoji")
  }

  test("applyMerges replays the table in order; re-learning finds nothing new") {
    import spark.implicits._
    val corpus: Seq[Seq[String]] = Seq(
      "a b a b", "a b c", "a b a b a b").map(_.split(" ").toSeq)
    val df = corpus.toDF("toks")
    val merges = BpeLearn.learn(df, 2)
    val rewritten = BpeLearn.applyMerges(df, merges)
    // the merged pair never survives in the rewritten corpus
    val flat = rewritten.select(explode(col("toks"))).as[String].collect()
    assert(merges.nonEmpty)
    merges.foreach { m =>
      val seqs = rewritten.as[Seq[String]].collect()
      seqs.foreach { s =>
        s.sliding(2).foreach(w =>
          if (w.length == 2) assert(!(w(0) == m.a && w(1) == m.b),
            s"unmerged occurrence of (${m.a}, ${m.b}) in $s"))
      }
    }
    assert(flat.contains("ab") || flat.contains("abab"))
  }
}
