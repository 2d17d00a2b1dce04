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
      val srcSh = docs(s, d)
        .select(col("source"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(col("source"),
          explode(expr("sequence(1, size(toks) - 2)")).as("i"), col("toks"))
        .select(col("source"),
          expr("concat_ws(' ', toks[i-1], toks[i], toks[i+1])").as("shingle"))
        .distinct()
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
    Some("""WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents
           |              WHERE len(string_split(text, ' ')) >= 3),
           |sh AS (SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           |       FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
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

  val defs: Seq[QueryDef] = Seq(x10SplitStratified, x11Contamination)
}
