package graft.text

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic dataset splitting and
  * cross-source contamination screening — the two gatekeeping steps every
  * large-scale training pipeline runs between raw corpus and training.
  *
  * Scale posture: the split is a pure per-row hash expression (no
  * shuffle, reproducible on any cluster layout — the property that makes
  * a 100 TB train/val/test split re-derivable instead of stored), and the
  * contamination screen is a (shingle → source) inverted-index self-join
  * whose pair space is bounded by sources², never documents².
  */
object CurationQueries {

  private def docs(s: SparkSession, d: String) = {
    graft.GraftExtensions.ensure(s)
    Tables.load(s, d, "documents")
  }

  /** X10 — deterministic stratified split audit. Every document lands in
    * train/val/test by a pure function of its id (portable md5 bucket,
    * 80/10/10), so the assignment is stable across runs, engines, and
    * cluster layouts; the audit reports per-(source, split) counts and
    * volume — the stratification check run before training.
    */
  val x10SplitStratified = QueryDef(
    "x10_split_stratified",
    "deterministic 80/10/10 hash split, audited per (source, split)",
    (s, d) => {
      val bucket = pmod(
        call_function("graft_md5u60", col("doc_id").cast("string")), lit(100))
      docs(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy("source", "split")
    },
    Some("""WITH split AS (
           |  SELECT source, n_chars,
           |         CASE WHEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) >> 4 AS BIGINT) % 100 < 80 THEN 'train'
           |              WHEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) >> 4 AS BIGINT) % 100 < 90 THEN 'val'
           |              ELSE 'test' END AS split
           |  FROM documents)
           |SELECT source, split,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS n_chars
           |FROM split GROUP BY source, split ORDER BY source, split""".stripMargin))

  /** X11 — cross-source contamination screen: for every source pair, the
    * number of shared distinct 3-gram shingles and the overlap
    * coefficient (shared / smaller source's vocabulary). The benchmark-
    * contamination question ("does my train source leak into my eval
    * source?") at corpus scale: the join key is the shingle, the pair
    * space is sources², and no document pair is ever materialized.
    */
  val x11Contamination = QueryDef(
    "x11_contamination",
    "shared-shingle overlap coefficient per source pair",
    (s, d) => {
      // same tokenization contract as the dedup operators (single source
      // of truth in DedupQueries), keyed by source instead of doc_id
      val srcSh = graft.dedup.DedupQueries.shingleSet(docs(s, d), "source")
      val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("sz"))
      val shared = srcSh.as("a")
        .join(srcSh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(sizes.as("sa"), col("source_a") === col("sa.source"))
        .join(sizes.as("sb"), col("source_b") === col("sb.source"))
        .select(col("source_a"), col("source_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            least(col("sa.sz"), col("sb.sz"))).as("overlap"))
        .orderBy("source_a", "source_b")
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.shingleSetSql("source")},
           |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY source),
           |shared AS (SELECT a.source AS source_a, b.source AS source_b,
           |                  CAST(count(*) AS BIGINT) AS n_shared
           |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
           |           GROUP BY 1, 2)
           |SELECT source_a, source_b, n_shared,
           |       CAST(n_shared AS DOUBLE) / least(sa.sz, sb.sz) AS overlap
           |FROM shared JOIN sizes sa ON source_a = sa.source
           |            JOIN sizes sb ON source_b = sb.source
           |ORDER BY source_a, source_b""".stripMargin))

  /** X12 — sequence packing audit: documents pack into fixed token-budget
    * bins by cumulative token count in deterministic (source, doc_id)
    * order — the sample-packing step before LLM pretraining, expressed as
    * a running-sum window per source (parallel across sources; one
    * spillable sort per source, never a global order). Reported per
    * source: bins used, docs and tokens per bin on average, and mean bin
    * utilization vs the budget.
    */
  val x12SequencePacking = QueryDef(
    "x12_sequence_packing",
    "cumulative-token packing into 2048-token bins, utilization per source",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 2048L
      // whitespace tokens as the packing unit (t22's proven-parity counter)
      val toks = docs(s, d).select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val binned = toks
        .withColumn("cum", sum(col("n_tokens")).over(w))
        // bin of the doc's LAST token — contiguous packing, a doc may
        // straddle a boundary (its tail spills into the next bin), which
        // is the cheap deterministic trade vs bin-exact first-fit.
        // `div` is exact integer division: Spark's `/` on longs goes
        // through a double, which mis-bins past 2^53 cumulative tokens
        .withColumn("bin", expr(s"(cum - 1) div ${budget}L"))
      val perBin = binned.groupBy("source", "bin")
        .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("toks"))
      perBin.groupBy("source")
        .agg(
          count(lit(1)).as("n_bins"),
          sum(col("docs")).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          (sum(col("toks")).cast("double") / (count(lit(1)) * budget))
            .as("mean_fill"))
        .orderBy("source")
    },
    Some("""WITH toks AS (
           |  SELECT source, doc_id,
           |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |  FROM documents),
           |binned AS (
           |  SELECT source, n_tokens,
           |         CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |                ROWS UNBOUNDED PRECEDING) - 1) // 2048 AS BIGINT) AS bin
           |  FROM toks),
           |per_bin AS (
           |  SELECT source, bin, CAST(count(*) AS BIGINT) AS docs,
           |         CAST(sum(n_tokens) AS BIGINT) AS toks
           |  FROM binned GROUP BY source, bin)
           |SELECT source,
           |       CAST(count(*) AS BIGINT) AS n_bins,
           |       CAST(sum(docs) AS BIGINT) AS n_docs,
           |       CAST(sum(toks) AS BIGINT) AS n_tokens,
           |       CAST(sum(toks) AS DOUBLE) / (count(*) * 2048) AS mean_fill
           |FROM per_bin GROUP BY source ORDER BY source""".stripMargin))

  val defs: Seq[QueryDef] =
    Seq(x10SplitStratified, x11Contamination, x12SequencePacking)
}
