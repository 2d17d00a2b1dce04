package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** x68 semantics beyond the oracle gate: the budget is a floor the
  * selection reaches in BPE tokens, BPE counts genuinely compress the
  * whitespace baseline (the merges do work), and the threshold is
  * value-deterministic (the x62 contract, re-checked on the BPE weights).
  */
class BpeTokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = CurationQueries.x68BpeTokenBudget.run(spark, sfDir)
    .collect()

  test("every source emits one row; selection reaches its budget floor") {
    val sources = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("source").distinct().as[String].collect().toSet
    assert(out.map(_.getString(0)).toSet === sources)
    out.foreach { r =>
      val (budget, sel) = (r.getLong(1), r.getLong(4))
      assert(sel >= budget,
        s"${r.getString(0)}: selected $sel BPE tokens < budget $budget")
    }
  }

  test("the learn ran to its full K=16 budget with one corpus-wide table") {
    assert(out.map(_.getLong(5)).toSet === Set(16L), "n_merges != 16")
    assert(out.map(_.getString(6)).toSet.size === 1,
      "merge-table fingerprint must be one corpus-wide constant")
  }

  test("BPE token counts compress the whitespace baseline") {
    // total selected-or-not corpus mass: budgets are sum/4, so 4x the
    // budget sums ~ the corpus BPE mass; compare against whitespace words
    val words = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    val bpeMass = out.map(_.getLong(1)).sum * 4L
    assert(bpeMass > words,
      "char-level BPE at 16 merges must still count more than words")
    // and strictly fewer tokens than raw characters
    val chars = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(length(regexp_replace(col("text"), " ", "")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(bpeMass < chars,
      "the merges must compress the raw character baseline")
  }

  test("x69 census: fertility >= 1 token/word, compression strictly " +
    "inside (0, 100%), one tokenizer shared with x68") {
    val census = CurationQueries.x69BpeFertility.run(spark, sfDir).collect()
    assert(census.nonEmpty)
    census.foreach { r =>
      val (words, bpe, chars) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bpe >= words, "a word is at least one BPE token")
      assert(bpe < chars, "the merges must beat the character baseline")
      assert(r.getLong(5) >= 1000000L, "fertility_ppm floor is 1.0")
      assert(r.getLong(6) > 0 && r.getLong(6) < 10000, "saved_bp range")
    }
    // per-source sel/census token masses come from the SAME cached frame
    val selTotal = out.map(_.getLong(1)).sum * 4 // budgets are mass/4 (floor)
    val censusTotal = census.map(_.getLong(3)).sum
    assert((censusTotal - selTotal).abs <= out.length * 4,
      "x68 budgets and x69 census disagree on the corpus BPE mass")
  }

  test("threshold is value-deterministic: the sub-threshold mass misses " +
    "the budget (x62 contract on BPE weights)") {
    // recompute the per-doc BPE mass from the query's own cached scored
    // frame — `out` populated the PlanCache entry in this session
    assert(out.nonEmpty)
    val scored = graft.PlanCache.persisted(spark, s"x68-scored/$sfDir")(
      sys.error("cache must already exist from the first run"))
    out.foreach { r =>
      val (src, budget, thr) = (r.getString(0), r.getLong(1), r.getLong(2))
      val above = scored.filter(col("source") === src &&
        col("score6") > thr)
        .agg(coalesce(sum("toks"), lit(0L))).head.getLong(0)
      assert(above < budget,
        s"$src: strictly-above-threshold mass $above already reaches " +
          s"budget $budget — thr is not the largest qualifying threshold")
    }
  }
}
