package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup boilerplate stripping — the C4/trafilatura-style front door
  * every web-scale corpus passes through before quality scoring: raw pages
  * carry nav bars, link lists, footers, and cookie/legal chrome that
  * poison t21/t27's token statistics (stopword ratios, diversity,
  * letters-per-token) if scored as-is.
  *
  * Three-stage, per-row, expression-only (codegen'd — no UDFs, no shuffle;
  * embarrassingly parallel at 100 TB):
  *
  *  1. SEGMENT on block-level tags (`div p nav footer li …`) — the page
  *     becomes candidate text blocks, the jusText/boilerpipe unit of
  *     decision. Inline tags (`a`, `span`, `b`, `em`) stay inside their
  *     block so link mass is attributable to it.
  *  2. CLEAN each block: strip remaining tags, decode the five standard
  *     entities (`&amp;` LAST — decoding it first would double-decode
  *     `&amp;lt;`), collapse whitespace.
  *  3. KEEP a block iff (integer arithmetic only, portable across
  *     engines):
  *       - visible length ≥ [[MinBlockLen]] (short blocks are titles,
  *         nav crumbs, buttons);
  *       - anchor-text length × 4 ≤ visible length (link density ≤ 25% —
  *         the boilerpipe signal: nav/related/footer blocks are mostly
  *         links, prose is not);
  *       - no boilerplate marker (the C4 rule: lines with
  *         "copyright" / "all rights reserved" / cookie / subscribe
  *         chrome are dropped wholesale).
  *
  * Kept blocks re-join in document order = the main content. Reference
  * scope: the reference pipeline ingests raw scraped `text` payloads with
  * no markup front door (`utils-dev/s3_parquet_query.py` queries them
  * as-is) — this operator supplies the missing pre-t21 step.
  */
object HtmlStrip {

  /** Block-level elements that delimit candidate text blocks. Kept to the
    * Java∩RE2 common regex dialect (the t26 rule) so the same pattern
    * drives Spark and the DuckDB oracle.
    */
  val BlockTagPattern: String =
    "</?(?:html|head|title|style|script|body|header|nav|div|p|section|article|aside|ul|ol|li|table|tr|td|footer|h[1-6]|br)[^>]*>"

  /** Any remaining (inline) tag. */
  val AnyTagPattern: String = "<[^>]*>"

  /** Anchor text extractor (group 1). */
  val AnchorPattern: String = "<a[^>]*>([^<]*)</a>"

  /** Case-insensitive boilerplate markers (C4-style line filters). */
  val MarkerPattern: String =
    "(?i)copyright|all rights reserved|privacy policy|terms of|cookie|subscribe|sign in|log in"

  /** Minimum visible characters for a block to be considered content. */
  val MinBlockLen: Int = 25

  /** Visible text of one block: tags stripped, entities decoded
    * (`&amp;` last), whitespace collapsed, trimmed.
    */
  def cleanBlock(seg: Column): Column =
    trim(regexp_replace(
      replace(
        replace(
          replace(
            replace(
              replace(
                replace(regexp_replace(seg, AnyTagPattern, " "),
                  lit("&quot;"), lit("\"")),
                lit("&#39;"), lit("'")),
              lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&nbsp;"), lit(" ")),
        lit("&amp;"), lit("&")),
      " +", " "))

  /** Total anchor-text characters of one raw block (0 when linkless). */
  def anchorLen(seg: Column): Column =
    aggregate(
      transform(regexp_extract_all(seg, lit(AnchorPattern), lit(1)),
        t => length(t)),
      lit(0), (acc, n) => acc + n)

  /** The keep decision for one raw block — integer arithmetic only
    * (`ll * 4 <= len` IS "link density ≤ 2500 bp" without a division).
    */
  def keepBlock(seg: Column): Column = {
    val v = cleanBlock(seg)
    (length(v) >= MinBlockLen) &&
      (anchorLen(seg) * 4 <= length(v)) &&
      !v.rlike(MarkerPattern)
  }

  /** Raw block segments of a page (order preserved; empties retained —
    * downstream predicates drop them).
    */
  def blocks(html: Column): Column = split(html, BlockTagPattern)

  /** Main content of a page: kept blocks, cleaned, joined in order. */
  def mainContent(html: Column): Column =
    array_join(
      transform(filter(blocks(html), seg => keepBlock(seg)),
        seg => cleanBlock(seg)),
      " ")

  /** Non-empty candidate blocks (audit statistic). */
  def nBlocks(html: Column): Column =
    size(filter(blocks(html), seg => length(cleanBlock(seg)) > 0))

  /** Kept blocks (audit statistic). */
  def nKept(html: Column): Column =
    size(filter(blocks(html), seg => keepBlock(seg)))
}
