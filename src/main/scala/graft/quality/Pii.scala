package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over free text — the privacy front door a
  * training-data pipeline runs before any text leaves the raw zone
  * (and the warehouse cousin of q12's keyed pseudonymization: q12
  * protects KEYS, this scrubs VALUES embedded in prose).
  *
  * Relation to t26 (`text.TextQueries.t26PiiRedaction`): t26 is the
  * inline documents-side audit (email/phone/IP counts + a redacted
  * fingerprint); this object is the reusable OPERATOR form — adds SSN +
  * credit-card classes with Luhn checksum validation (the non-regex
  * second stage), emits full redacted strings (string-exact oracle
  * parity, not an md5), and feeds the streaming gate
  * ([[graft.streaming.PiiGate]]) and the clean/offender routing split.
  *
  * Detectors are regex classes chosen to behave identically under
  * Java's regex (Spark) and RE2 (DuckDB): character classes,
  * alternation and bounded repetition only — no backrefs, no
  * lookaround, no word boundaries. Credit-card candidates get a second,
  * non-regex stage: a Luhn checksum in pure integer SQL arithmetic
  * (`aggregate` over the 16 digits), so a random 16-digit run is
  * counted as a CANDIDATE but only checksum-valid numbers as LIKELY
  * cards — the precision/recall split a real audit reports.
  *
  * Redaction is one fixed chain of `regexp_replace` (email → card →
  * phone → SSN → IPv4; emails first because their local part may
  * contain digit runs) — per-row, shuffle-free, wholly inside
  * whole-stage codegen. Redaction deliberately masks ALL 16-digit runs,
  * Luhn-valid or not: privacy rewrites prefer recall, the audit carries
  * the precision.
  *
  * Scale posture: every function here is a stateless per-row
  * expression — composes onto any scan at 100 TB with zero shuffle,
  * and the same chain serves streams ([[graft.streaming.PiiGate]]).
  */
object Pii {

  /** Portable (Java ∩ RE2) detector patterns. */
  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val SSN   = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val IPV4  = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
              "(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"
  val CARD  = "[0-9]{16}"

  /** (kind, pattern) in audit order. `ccard_candidate` is the raw regex
    * class; `ccard_luhn` additionally requires the checksum. */
  val detectors: Seq[(String, String)] = Seq(
    "email" -> EMAIL, "phone" -> PHONE, "ssn" -> SSN,
    "ipv4" -> IPV4, "ccard_candidate" -> CARD)

  /** Fixed redaction chain. Order is part of the contract: emails
    * before numeric classes (their local part may embed digit runs),
    * longest digit shapes before shorter ones.
    */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EMAIL, "[EMAIL]")
    val k = regexp_replace(e, CARD, "[CARD]")
    val p = regexp_replace(k, PHONE, "[PHONE]")
    val s = regexp_replace(p, SSN, "[SSN]")
    regexp_replace(s, IPV4, "[IP]")
  }

  /** Luhn weighted digit sum of the 16-char digit string in `colName`
    * (rightmost digit undoubled). `% 10 == 0` ⇔ checksum-valid.
    * Pure integer `aggregate`/`transform` — replayable in any engine.
    */
  def luhnTotal(colName: String): Column = expr(
    s"""aggregate(transform(sequence(1, 16), i ->
          CASE WHEN (17 - i) % 2 = 0
               THEN IF(2 * CAST(substring($colName, i, 1) AS INT) > 9,
                       2 * CAST(substring($colName, i, 1) AS INT) - 9,
                       2 * CAST(substring($colName, i, 1) AS INT))
               ELSE CAST(substring($colName, i, 1) AS INT) END),
        0, (acc, x) -> acc + x)""")

  /** True iff `colName` holds exactly 16 digits passing Luhn. */
  def luhnValid(colName: String): Column =
    col(colName).rlike("^[0-9]{16}$") && luhnTotal(colName) % 10 === 0

  /** The matching DuckDB expression for [[luhnTotal]] (oracle side). */
  def luhnTotalSql(colName: String): String =
    s"""list_sum(list_transform(range(1, 17), i ->
          CASE WHEN (17 - i) % 2 = 0
               THEN CASE WHEN 2 * CAST(substring($colName, i, 1) AS INT) > 9
                         THEN 2 * CAST(substring($colName, i, 1) AS INT) - 9
                         ELSE 2 * CAST(substring($colName, i, 1) AS INT) END
               ELSE CAST(substring($colName, i, 1) AS INT) END))"""
}
