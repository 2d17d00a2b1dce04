package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Detector semantics, Luhn arithmetic, redaction order/idempotence,
  * and the planted-blob counting contract on real sf0.001 keys.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).as[String].head()

  test("each detector class masks its shape") {
    assert(redactOne("mail me at jo.doe+x@sub.example.org today") ==
      "mail me at [EMAIL] today")
    assert(redactOne("call 25-989-741-2988 now") == "call [PHONE] now")
    assert(redactOne("ssn 123-45-6789.") == "ssn [SSN].")
    assert(redactOne("host 192.168.10.254 up") == "host [IP] up")
    assert(redactOne("card 4111111111111111 on file") ==
      "card [CARD] on file")
  }

  test("clean text passes through byte-identical") {
    val s = "Customer#000000123 ordered 42 items for 17.50 dollars"
    assert(redactOne(s) == s)
  }

  test("redaction is idempotent") {
    val once = redactOne("x jo@a.com 4111111111111111 123-45-6789 y")
    assert(redactOne(once) == once)
  }

  test("emails redact before digit classes: a card inside a local part " +
    "disappears with the email, not as [CARD]") {
    assert(redactOne("a4111111111111111b@x.com paid") == "[EMAIL] paid")
  }

  test("invalid octets do not match the IPv4 detector") {
    val s = "weird 999.999.999.999 address"
    assert(redactOne(s) == s)
  }

  test("Luhn arithmetic: the canonical valid/invalid pair") {
    val df = Seq("4111111111111111", "4111111111111112").toDF("cand")
    val got = df.select(col("cand"), Pii.luhnValid("cand").as("ok"))
      .as[(String, Boolean)].collect().toMap
    assert(got("4111111111111111") && !got("4111111111111112"))
  }

  test("luhnValid rejects non-16-digit shapes without erroring") {
    val df = Seq("", "abc", "123", "41111111111111110").toDF("cand")
    assert(df.filter(Pii.luhnValid("cand")).count() == 0)
  }

  test("planted blobs: audit counts match key arithmetic exactly") {
    val n = graft.sources.Tables.load(spark, sfDir, "customer").count()
    val custs = graft.sources.Tables.load(spark, sfDir, "customer")
      .select("c_custkey").as[Long].collect()
    val counts = PiiQueries.q17PiiScan.run(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(counts("email") == n)
    assert(counts("phone") == n)
    assert(counts("ccard_candidate") == n)
    assert(counts("ccard_luhn") == custs.count(_ % 2 == 0))
    assert(counts("ssn") == custs.count(_ % 7 == 0))
    assert(counts("ipv4") == custs.count(_ % 5 == 0))
  }

  test("redacted blobs carry no residual detector hits") {
    val redacted = PiiQueries.t30PiiRedact.run(spark, sfDir)
    val residual = redacted.filter(
      col("redacted").rlike(Pii.EMAIL) || col("redacted").rlike(Pii.PHONE) ||
      col("redacted").rlike(Pii.SSN) || col("redacted").rlike(Pii.IPV4) ||
      col("redacted").rlike(Pii.CARD)).count()
    assert(residual == 0)
    // and the masks actually landed
    assert(redacted.filter(col("redacted").contains("[PHONE]")).count() ==
      redacted.count())
  }
}
