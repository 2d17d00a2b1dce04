package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compressed committed-id set behind every exactly-once ledger:
  * frontier semantics, out-of-order exactness, serialization round-trip,
  * legacy-format parsing, and the O(gaps) bound.
  */
class CommittedFrontierSpec extends AnyFunSuite {

  test("monotone ids compress to a single watermark with no exceptions") {
    val cf = new CommittedFrontier
    (0L to 9999L).foreach(cf.add)
    assert(cf.watermark === 9999L)
    assert(cf.exceptions.isEmpty)
    assert(cf.contains(0L) && cf.contains(9999L) && !cf.contains(10000L))
    // 10k committed ids serialize to TWO lines — the bound the r17
    // per-id ledgers missed
    assert(cf.serialize === "v2\n9999")
  }

  test("out-of-order ids land in the exception set and are never " +
    "silently skipped; the frontier drains through closed gaps") {
    val cf = new CommittedFrontier
    Seq(0L, 1L, 5L, 3L).foreach(cf.add)
    assert(cf.watermark === 1L)
    assert(cf.exceptions === Seq(3L, 5L))
    assert(cf.contains(3L) && cf.contains(5L))
    assert(!cf.contains(2L) && !cf.contains(4L), "gap ids must read uncommitted")
    cf.add(2L) // closes the 2-gap: frontier drains through 3
    assert(cf.watermark === 3L)
    assert(cf.exceptions === Seq(5L))
    cf.add(4L)
    assert(cf.watermark === 5L && cf.exceptions.isEmpty)
  }

  test("addFrontier merges a recovered watermark and absorbs covered " +
    "exceptions") {
    val cf = new CommittedFrontier
    Seq(7L, 9L, 2L).foreach(cf.add)
    cf.addFrontier(7L)
    assert(cf.watermark === 7L)
    assert(cf.exceptions === Seq(9L))
    cf.addFrontier(8L) // drains straight through the 9 exception
    assert(cf.watermark === 9L && cf.exceptions.isEmpty)
    cf.addFrontier(3L) // never regresses
    assert(cf.watermark === 9L)
  }

  test("serialize/parse round-trips, and the LEGACY one-id-per-line " +
    "format parses (a prefix compresses; gaps stay exceptions)") {
    val cf = new CommittedFrontier
    Seq(0L, 1L, 2L, 6L).foreach(cf.add)
    val back = CommittedFrontier.parse(cf.serialize)
    assert(back.watermark === 2L && back.exceptions === Seq(6L))
    val legacy = CommittedFrontier.parse("0\n1\n2\n3\n4")
    assert(legacy.watermark === 4L && legacy.exceptions.isEmpty)
    val legacyGap = CommittedFrontier.parse("0\n2")
    assert(legacyGap.watermark === 0L && legacyGap.exceptions === Seq(2L))
    assert(!legacyGap.contains(1L))
    val empty = CommittedFrontier.parse("")
    assert(empty.watermark === -1L && !empty.contains(0L))
  }
}
