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

  /** Script/style ELEMENT SPANS — tag + body + close tag. These are
    * removed wholesale BEFORE block segmentation: their tags are block
    * delimiters, so without this an inline JS/CSS body ≥ [[MinBlockLen]]
    * visible chars with low link density and no marker words would pass
    * [[keepOf]] and leak code into the cleaned corpus (poisoning t21/t27
    * statistics). Dotall + case-insensitive via inline flags, non-greedy
    * body — all within the Java∩RE2 common dialect (the t26 rule).
    */
  val ScriptStylePattern: String =
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"

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

  /** The keep decision over an ALREADY-CLEANED block `v` and its raw
    * anchor-char count `a` — integer arithmetic only (`a * 4 <= len` IS
    * "link density ≤ 2500 bp" without a division). Decoupled from the
    * cleaning so pipelines can clean each segment ONCE: higher-order
    * lambdas are CodegenFallback with no subexpression elimination, so
    * every textual reference to `cleanBlock(seg)` re-runs the whole
    * regex/entity chain — the r14 one-pass rewrite took t29 from ~8
    * clean evaluations per segment to 1 (~3.9 → ~1 s at sf0.1).
    */
  def keepOf(v: Column, a: Column): Column =
    (length(v) >= MinBlockLen) &&
      (a * 4 <= length(v)) &&
      !v.rlike(MarkerPattern)

  /** Single-segment keep decision (compat form; re-cleans per reference
    * — prefer [[blockPairs]] + [[keepOf]] in anything hot).
    */
  def keepBlock(seg: Column): Column =
    keepOf(cleanBlock(seg), anchorLen(seg))

  /** Raw block segments of a page (order preserved; empties retained —
    * downstream predicates drop them). Script/style element contents are
    * removed first — see [[ScriptStylePattern]].
    */
  def blocks(html: Column): Column =
    split(regexp_replace(html, ScriptStylePattern, " "), BlockTagPattern)

  /** One clean pass over all blocks: array of (v = cleaned text,
    * a = raw anchor chars) structs — the shared input for keep/count/
    * join consumers.
    */
  def blockPairs(html: Column): Column =
    transform(blocks(html), seg =>
      struct(cleanBlock(seg).as("v"), anchorLen(seg).as("a")))

  /** Kept (v, a) pairs of a pre-computed [[blockPairs]] array. */
  def keptPairs(pairs: Column): Column =
    filter(pairs, p => keepOf(p.getField("v"), p.getField("a")))

  /** Main content of a page: kept blocks, cleaned, joined in order.
    * One clean pass (filter and join both read the pair array). */
  def mainContent(html: Column): Column =
    array_join(
      transform(keptPairs(blockPairs(html)), p => p.getField("v")),
      " ")

  /** Non-empty candidate blocks (audit statistic). */
  def nBlocks(html: Column): Column =
    size(filter(blockPairs(html), p => length(p.getField("v")) > 0))

  /** Kept blocks (audit statistic). */
  def nKept(html: Column): Column =
    size(keptPairs(blockPairs(html)))
}
