package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Linkage

class LinkageSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val records = Seq(
    (1L, "acme corp"), (2L, "acme corp"),  // exact duplicates contract
    (3L, "acme corpp"),                    // typo — shares FIRST token
    (4L, "beta inc"),
    (5L, "alpha gadget"), (6L, "alpho gadget"), // typo — shares LAST token only
    (7L, "qq rr"), (8L, "qs rt")           // dist 2 but NO shared block token
  ).toDF("id", "name")

  test("fuzzyNamePairs contracts exact names and matches through either block") {
    val out = Linkage.fuzzyNamePairs(records, "id", "name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
      .toMap
    // first-token block: the duplicate-contracted "acme corp" (n=2) pairs
    // with its typo once, carrying the 2×1 record-pair count and each
    // side's min-key exemplar record
    assert(out(("acme corp", "acme corpp")) === ((1L, 2L, 1L, 1L, 3L, 2L)))
    // last-token block catches the first-token typo
    assert(out(("alpha gadget", "alpho gadget")) === ((1L, 1L, 1L, 5L, 6L, 1L)))
    // blocking is deliberate recall loss: no shared token → never compared
    assert(!out.contains(("qq rr", "qs rt")))
    assert(out.size === 2)
  }

  test("fuzzyNamePairs emits nothing above the distance threshold") {
    val out = Linkage.fuzzyNamePairs(records, "id", "name", maxDist = 0)
    assert(out.count() === 0) // distinct names never at distance 0
  }
}
