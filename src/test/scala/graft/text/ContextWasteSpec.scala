package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** x81 — context-length waste ladder: hand closed forms and a
  * single-threaded corpus differential.
  */
class ContextWasteSpec extends SparkSpec {

  test("x81: hand docs match the closed-form waste at L=128") {
    // doc lengths 5, 130, 600: kept 5/128/128 -> trunc 0+2+472,
    // pad 123+0+0, total 735; packed: ceil(735/128)=6 -> 768-735=33
    val row = graft.SparkEntry.queries("x81_context_waste")(spark, sfDir)
    // use the real query for schema, but the closed form needs planted
    // docs: re-derive the same aggregation over a literal frame
    import spark.implicits._
    val planted = Seq(
      ("sX", Seq.fill(5)("t").mkString(" ")),
      ("sX", Seq.fill(130)("t").mkString(" ")),
      ("sX", Seq.fill(600)("t").mkString(" ")))
      .toDF("source", "text")
    val got = planted.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .select(col("source"), col("n"), lit(128L).as("ctx_len"))
      .withColumn("kept", least(col("n"), col("ctx_len")))
      .groupBy("ctx_len", "source")
      .agg(sum(col("n")).as("total_tokens"),
        sum(col("n") - col("kept")).as("trunc_lost"),
        sum(col("ctx_len") - col("kept")).as("pad_lost"))
      .select(
        expr("(trunc_lost * 10000) div total_tokens"),
        expr("(pad_lost * 10000) div total_tokens"),
        expr("""((((total_tokens + ctx_len - 1) div ctx_len) * ctx_len
                - total_tokens) * 10000) div total_tokens"""))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((6448L, 1673L, 448L)))
    assert(row.columns.toSeq === Seq("ctx_len", "source", "n_docs",
      "total_tokens", "trunc_bp", "pad_bp", "packed_pad_bp"))
  }

  test("x81: full query equals a single-threaded fold on the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = (for {
      l <- Seq(128L, 512L, 2048L)
      (src, ds) <- docs.groupBy(_._1)
    } yield {
      val tot = ds.map(_._2).sum
      val trunc = ds.map(d => (d._2 - math.min(d._2, l)).max(0L)).sum
      val pad = ds.map(d => l - math.min(d._2, l)).sum
      val packed = ((tot + l - 1) / l) * l - tot
      (l, src) -> (ds.length.toLong, tot, trunc * 10000 / tot,
        pad * 10000 / tot, packed * 10000 / tot)
    }).toMap
    val got = graft.SparkEntry.queries("x81_context_waste")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got.size === exp.size)
    got.foreach { case (k, v) => assert(v === exp(k), s"cell $k") }
    // the ladder says something: padding grows with L on short-doc corpora
    val srcs = got.keys.map(_._2).toSet
    srcs.foreach { s =>
      assert(got((128L, s))._4 <= got((2048L, s))._4, s"pad monotone $s")
    }
  }
}
