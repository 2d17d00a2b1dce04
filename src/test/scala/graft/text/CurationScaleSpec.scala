package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-posture specs for the curation operators: the blocked prefix
  * sum (x12) and bounded top-k sample (x14) must agree with their
  * single-window reference forms on a deliberately skewed corpus (one
  * source ≫ the others) while never funneling a whole source/stratum
  * through one window partition.
  */
class CurationScaleSpec extends SparkSpec {

  import spark.implicits._

  // one giant source (8000 docs), two small ones; doc_ids interleaved so
  // id-blocks mix sources (the realistic layout)
  private lazy val skewed = spark.range(0, 8600).select(
    col("id").as("doc_id"),
    when(col("id") % 43 === 0, "tiny")
      .when(col("id") % 43 === 1, "small")
      .otherwise("giant").as("source"),
    (pmod(col("id") * 2654435761L, lit(97)) + 1).as("n_tokens"))

  test("x12 blocked prefix sum equals the single-window cumulative sum under skew") {
    val toks = skewed
    val blocked = CurationQueries.cumulativeTokens(toks, blockSize = 256L)
      .select("source", "doc_id", "cum")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = toks.withColumn("cum", sum(col("n_tokens")).over(w))
      .select("source", "doc_id", "cum")
    assert(blocked.exceptAll(reference).isEmpty && reference.exceptAll(blocked).isEmpty,
      "blocked prefix sum diverges from the window reference")
    // the giant source must actually span many blocks (i.e. many bounded
    // window partitions), not one source-wide partition
    val giantBlocks = toks.filter(col("source") === "giant")
      .select(expr("doc_id div 256L").as("blk")).distinct().count()
    assert(giantBlocks > 10, s"giant source spans only $giantBlocks blocks")
  }

  test("x12/x14 plans contain no source-wide doc-ordered window") {
    for (q <- Seq("x12_sequence_packing", "x14_sample_stratified")) {
      val plan = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      // the scale-unsafe shape is Window partitioned by [source] alone and
      // ordered by doc_id — an entire source through ONE task
      assert(!plan.matches("(?s).*\\[source#\\d+\\], \\[doc_id#.*"),
        s"$q still plans a source-wide window:\n$plan")
    }
  }

  test("x14 bounded top-k agg equals the row_number window reference under skew") {
    val h = pmod(col("doc_id") * 2654435761L, lit(1000003)).cast("long")
    val base = skewed.select(col("source"), col("doc_id"),
      h.as("h"), (col("n_tokens") * 3).as("n_chars"))
    val topk = udaf(new graft.functions.TopKSample(3),
      org.apache.spark.sql.Encoders.product[graft.functions.SampleRow])
    val agg = base.groupBy("source")
      .agg(topk(col("h"), col("doc_id"), col("n_chars")).as("top"))
      .select(col("source"), posexplode(col("top.rows")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("col.doc_id"), col("col.n_chars"))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    val reference = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
    assert(agg.exceptAll(reference).isEmpty && reference.exceptAll(agg).isEmpty,
      "bounded top-k diverges from the window reference")
    // partial aggregation must be an object-hash aggregate (map-side
    // shrink to ≤ k per group), not a window sort
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no partial agg:\n$plan")
  }
}
