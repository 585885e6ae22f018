package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Fuzzy.fuzzyPairs]] — q-gram-blocked edit-distance join: exact
  * verification, the documented blocking contract (complete for long
  * strings, best-effort for sub-(maxDist+1)*q ones), the length
  * filter, and the flood-gram cap with its overflow report.
  */
class FuzzySpec extends SparkSpec {

  import spark.implicits._

  private def pairs(ws: Seq[String], maxDist: Int = 2,
      maxGramDf: Int = 10000) =
    Fuzzy.fuzzyPairs(ws.toDF("w"), "w", maxDist = maxDist,
      maxGramDf = maxGramDf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("typo pairs verify with exact distances; far strings excluded") {
    val got = pairs(Seq("spark", "sparkk", "spork", "flink", "duckdb"))
    assert(got.contains(("spark", "sparkk", 1L)))
    assert(got.contains(("spark", "spork", 1L)))
    assert(got.contains(("sparkk", "spork", 2L)))
    assert(!got.exists { case (a, b, _) => a == "duckdb" || b == "duckdb" })
  }

  test("blocking is complete at length >= (maxDist+1)*q, best-effort below") {
    // 8-char strings 2 edits apart share a 2-gram -> found
    val long = pairs(Seq("abcdefgh", "abcdefxy"))
    assert(long.contains(("abcdefgh", "abcdefxy", 2L)))
    // "ab" vs "ba": lev 2 but no shared 2-gram -> documented miss
    assert(pairs(Seq("ab", "ba")).isEmpty)
  }

  test("length filter: shared-gram pairs with |len diff| > maxDist never pair") {
    assert(pairs(Seq("abc", "abcdefghij")).isEmpty)
  }

  test("flood-gram cap drops blocking grams and reports them") {
    // 20 "qqq<i>" strings: their only shared gram "qq" floods past the
    // cap, so the genuine lev-1 pairs among them (qqq1/qqq2, ...) are
    // MISSED through it — the documented recall trade. An unrelated
    // near-dup pair with rare grams is unaffected.
    val flood = (0 until 20).map(i => s"qqq$i")
    val got = pairs(flood ++ Seq("hello", "helo"), maxGramDf = 5)
    assert(got === Set(("hello", "helo", 1L)),
      s"flooded pairs must be missed, rare pair kept: $got")
    val overflow = Fuzzy.overflowGrams(
      (flood ++ Seq("hello", "helo")).toDF("w"), "w", maxGramDf = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(overflow.get("qq").exists(_ === 20L))
    // raising the cap recovers the flooded pairs
    val uncapped = pairs(flood ++ Seq("hello", "helo"), maxGramDf = 100)
    assert(uncapped.contains(("qqq1", "qqq2", 1L)))
  }

  test("input rows deduplicate on the string (id grain is the caller's)") {
    val got = pairs(Seq("hello", "hello", "helo", "helo"))
    assert(got === Set(("hello", "helo", 1L)))
  }
}
