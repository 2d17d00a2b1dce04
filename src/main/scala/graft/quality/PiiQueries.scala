package graft.quality

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII audit + redaction queries.
  *
  * The synthetic corpus carries no PII by construction (documents have
  * zero digits; the relational tables are slimmed TPC-H without
  * phone/comment columns), so — the LinkageQueries planted-truth
  * discipline — the contact blob under audit is DERIVED IN-PLAN from
  * customer keys: a TPC-H-shaped phone, an email from the name, a
  * 16-digit card whose Luhn check digit is made VALID exactly for even
  * custkeys (so checksum validation is a measured, discriminating
  * count, not a constant), an SSN for every 7th key and an IPv4 for
  * every 5th. Both engines derive the SAME strings, then run the SAME
  * detector/redaction semantics — what is being graded is [[Pii]], not
  * the data.
  */
object PiiQueries {

  /** Customer contact blob with planted PII, derived identically in
    * Spark (here) and DuckDB ([[blobSql]]). */
  private[quality] def blob(s: SparkSession, d: String): DataFrame =
    // widen: the blob synthesis + the downstream detector/redaction regex
    // chains are per-row-heavy, and the single-row-group customer file
    // scans as ONE task (guide §2.5 unsplittable-input rescue; identity
    // at scale — Tables.widen is a no-op once the scan splits naturally)
    Tables.widen(Tables.load(s, d, "customer"))
      .withColumn("payload", lpad(col("c_custkey").cast("string"), 15, "4"))
      .withColumn("p0", concat(col("payload"), lit("0")))
      .withColumn("check_d",
        (lit(10) - Pii.luhnTotal("p0") % 10) % 10)
      .withColumn("cc", concat(col("payload"),
        when(col("c_custkey") % 2 === 0, col("check_d"))
          .otherwise((col("check_d") + 1) % 10).cast("string")))
      .select(col("c_custkey"), concat(
        col("c_name"),
        lit(" can be reached at "),
        lpad((col("c_custkey") % 90 + 10).cast("string"), 2, "0"), lit("-"),
        lpad(((col("c_custkey") * 3) % 1000).cast("string"), 3, "0"), lit("-"),
        lpad(((col("c_custkey") * 7) % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
        lit(" or "), lower(regexp_replace(col("c_name"), "#", ".")),
        lit("@example.com"),
        lit(" card "), col("cc"),
        when(col("c_custkey") % 7 === 0, concat(lit(" ssn "),
          lpad(((col("c_custkey") * 7) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("c_custkey") % 100).cast("string"), 2, "0"), lit("-"),
          lpad(((col("c_custkey") * 3) % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("c_custkey") % 5 === 0, concat(lit(" ip "),
          (col("c_custkey") % 256).cast("string"), lit("."),
          ((col("c_custkey") * 3) % 256).cast("string"), lit("."),
          ((col("c_custkey") * 7) % 256).cast("string"), lit("."),
          ((col("c_custkey") * 11) % 256).cast("string")))
          .otherwise(lit("")),
        lit(" segment "), col("c_mktsegment")).as("blob"))

  /** The identical derivation as a DuckDB CTE ending in
    * `pii_blob(c_custkey, blob)`. */
  private[quality] val blobSql: String = {
    val luhnP0 = Pii.luhnTotalSql("(payload || '0')")
    s"""pay AS (
          SELECT c_custkey, c_name, c_mktsegment,
                 lpad(CAST(c_custkey AS VARCHAR), 15, '4') AS payload
          FROM customer),
        chk AS (
          SELECT *, (10 - ($luhnP0) % 10) % 10 AS check_d FROM pay),
        ccd AS (
          SELECT *, payload || CAST(CASE WHEN c_custkey % 2 = 0 THEN check_d
                                         ELSE (check_d + 1) % 10 END AS VARCHAR) AS cc
          FROM chk),
        pii_blob AS (
          SELECT c_custkey,
                 c_name || ' can be reached at ' ||
                 lpad(CAST(c_custkey % 90 + 10 AS VARCHAR), 2, '0') || '-' ||
                 lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || '-' ||
                 lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
                 lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
                 ' or ' || lower(replace(c_name, '#', '.')) || '@example.com' ||
                 ' card ' || cc ||
                 CASE WHEN c_custkey % 7 = 0 THEN ' ssn ' ||
                   lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
                   lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' ||
                   lpad(CAST((c_custkey * 3) % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END ||
                 CASE WHEN c_custkey % 5 = 0 THEN ' ip ' ||
                   CAST(c_custkey % 256 AS VARCHAR) || '.' ||
                   CAST((c_custkey * 3) % 256 AS VARCHAR) || '.' ||
                   CAST((c_custkey * 7) % 256 AS VARCHAR) || '.' ||
                   CAST((c_custkey * 11) % 256 AS VARCHAR)
                 ELSE '' END ||
                 ' segment ' || c_mktsegment AS blob
          FROM ccd)"""
  }

  /** Q17 — per-detector row counts over the blob, including the
    * candidate-vs-Luhn-valid card split (valid ⇔ even custkey by
    * construction). One scan, map-combinable sums, 6-row output.
    */
  val q17PiiScan = QueryDef(
    "q17_pii_scan",
    "PII audit: rows matched per detector class + Luhn-valid card split",
    (s, d) => {
      val b = blob(s, d)
        .withColumn("cand", regexp_extract(col("blob"), "([0-9]{16})", 1))
      val agged = b.agg(
        sum(when(col("blob").rlike(Pii.EMAIL), 1L).otherwise(0L)).as("n_email"),
        sum(when(col("blob").rlike(Pii.PHONE), 1L).otherwise(0L)).as("n_phone"),
        sum(when(col("blob").rlike(Pii.SSN), 1L).otherwise(0L)).as("n_ssn"),
        sum(when(col("blob").rlike(Pii.IPV4), 1L).otherwise(0L)).as("n_ipv4"),
        sum(when(col("blob").rlike(Pii.CARD), 1L).otherwise(0L)).as("n_cand"),
        sum(when(Pii.luhnValid("cand"), 1L).otherwise(0L)).as("n_luhn"))
      agged.selectExpr(
        """stack(6,
             'ccard_candidate', n_cand,
             'ccard_luhn', n_luhn,
             'email', n_email,
             'ipv4', n_ipv4,
             'phone', n_phone,
             'ssn', n_ssn) AS (kind, n_hit)""")
        .orderBy("kind")
    },
    Some(s"""WITH $blobSql,
             scan AS (
               SELECT blob, regexp_extract(blob, '([0-9]{16})', 1) AS cand
               FROM pii_blob)
             SELECT kind, n_hit FROM (
               SELECT 'email' AS kind, CAST(sum(CASE WHEN regexp_matches(blob, '${Pii.EMAIL}') THEN 1 ELSE 0 END) AS BIGINT) AS n_hit FROM scan
               UNION ALL
               SELECT 'phone', CAST(sum(CASE WHEN regexp_matches(blob, '${Pii.PHONE}') THEN 1 ELSE 0 END) AS BIGINT) FROM scan
               UNION ALL
               SELECT 'ssn', CAST(sum(CASE WHEN regexp_matches(blob, '${Pii.SSN}') THEN 1 ELSE 0 END) AS BIGINT) FROM scan
               UNION ALL
               SELECT 'ipv4', CAST(sum(CASE WHEN regexp_matches(blob, '${Pii.IPV4}') THEN 1 ELSE 0 END) AS BIGINT) FROM scan
               UNION ALL
               SELECT 'ccard_candidate', CAST(sum(CASE WHEN regexp_matches(blob, '[0-9]{16}') THEN 1 ELSE 0 END) AS BIGINT) FROM scan
               UNION ALL
               SELECT 'ccard_luhn', CAST(sum(CASE WHEN cand <> '' AND (${Pii.luhnTotalSql("cand")}) % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM scan
             ) ORDER BY kind"""))

  /** T30 — the redaction rewrite itself: every customer's blob through
    * the fixed [[Pii.redact]] chain, value-compared string-for-string
    * against DuckDB replaying the same chain (global replace).
    */
  val t30PiiRedact = QueryDef(
    "t30_pii_redact",
    "PII redaction: masked contact blobs, bit-identical across engines",
    (s, d) => blob(s, d)
      .select(col("c_custkey"), Pii.redact(col("blob")).as("redacted"))
      .orderBy("c_custkey"),
    Some(s"""WITH $blobSql
             SELECT c_custkey,
                    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                      blob,
                      '${Pii.EMAIL}', '[EMAIL]', 'g'),
                      '[0-9]{16}', '[CARD]', 'g'),
                      '${Pii.PHONE}', '[PHONE]', 'g'),
                      '${Pii.SSN}', '[SSN]', 'g'),
                      '${Pii.IPV4}', '[IP]', 'g') AS redacted
             FROM pii_blob ORDER BY c_custkey"""))

  val defs: Seq[QueryDef] = Seq(q17PiiScan, t30PiiRedact)
}
