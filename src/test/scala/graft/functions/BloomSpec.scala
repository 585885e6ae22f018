package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import BloomFunctions._

/** [[BloomAgg]]/[[BloomContains]]/[[bloomSemiFilter]]: no false
  * negatives, real filtering, partition-invariant build, pre-exchange
  * probe placement.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildDf = (1L to 50L).map(_ * 3L).toDF("key")
  private def probeDf = (1L to 600L).toDF("pkey")

  test("every build key survives the filter (no false negatives)") {
    val surv = bloomSemiFilter(probeDf, "pkey", buildDf, "key",
      mWords = 8, k = 4).collect().map(_.getLong(0)).toSet
    val members = (1L to 50L).map(_ * 3L).filter(_ <= 600L).toSet
    assert(members.subsetOf(surv),
      s"missing members: ${members.diff(surv)}")
  }

  test("the filter actually filters (survivors well under the probe count)") {
    val n = bloomSemiFilter(probeDf, "pkey", buildDf, "key",
      mWords = 8, k = 4).count()
    // 50 members + deterministic FPs; anything near 600 means no-op
    assert(n >= 50 && n < 300, s"survivors=$n of 600")
  }

  test("build partitioning does not change the survivor set (OR-merge)") {
    def surv(parts: Int) = bloomSemiFilter(
      probeDf, "pkey", buildDf.repartition(parts), "key",
      mWords = 8, k = 4).collect().map(_.getLong(0)).toSet
    assert(surv(1) === surv(7))
  }

  test("null probe keys never survive") {
    val probes = Seq(Some(3L), None, Some(999L)).toDF("pkey")
    val surv = bloomSemiFilter(probes, "pkey", buildDf, "key",
      mWords = 8, k = 4).collect().map(_.getLong(0)).toSet
    assert(surv.contains(3L))
    assert(!surv.contains(999L) || surv.size <= 2) // 999 may be an FP
    assert(surv.forall(_ != 0L)) // the null row is gone either way
  }

  test("bigger m shrinks the FP set toward the exact members") {
    def fps(mWords: Int) = bloomSemiFilter(probeDf, "pkey", buildDf, "key",
      mWords, k = 4).collect().map(_.getLong(0)).toSet
      .diff((1L to 50L).map(_ * 3L).toSet)
    assert(fps(1024).size <= fps(8).size)
    assert(fps(1024).isEmpty, s"FPs at 64k bits: ${fps(1024)}")
  }

  test("probe filter sits BELOW the aggregation exchange (pre-shuffle)") {
    withNoAqe {
      val q = bloomSemiFilter(probeDf, "pkey", buildDf, "key",
        mWords = 8, k = 4).groupBy("pkey").count()
      val plan = q.queryExecution.executedPlan.toString
      val probeIdx = plan.indexOf("bloom_contains")
      val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
      assert(probeIdx >= 0, s"bloom_contains not in plan:\n$plan")
      assert(exchangeIdx >= 0, s"no exchange:\n$plan")
      assert(probeIdx > exchangeIdx,
        s"bloom probe should sit below (before) the exchange:\n$plan")
    }
  }

  test("materialized bloom artifact: write/read round-trip, indexed == direct, append == union rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString + "/corpus_bloom"
    val corpusA = (1L to 40L).map(_ * 3L).toDF("key")
    val corpusB = (1L to 40L).map(_ * 7L).toDF("key")

    // build over A, persist, filter a probe batch against the artifact
    writeBloom(corpusA, "key", dir, mWords = 8, k = 4)
    val direct = bloomSemiFilter(probeDf, "pkey", corpusA, "key",
      mWords = 8, k = 4).collect().map(_.getLong(0)).toSet
    val indexed = bloomSemiFilterIndexed(probeDf, "pkey", dir)
      .collect().map(_.getLong(0)).toSet
    assert(indexed === direct)

    // append B: artifact must now equal a bloom built over A union B
    appendToBloom(corpusB, "key", dir)
    val indexedAB = bloomSemiFilterIndexed(probeDf, "pkey", dir)
      .collect().map(_.getLong(0)).toSet
    val directAB = bloomSemiFilter(probeDf, "pkey",
      corpusA.union(corpusB), "key", mWords = 8, k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(indexedAB === directAB)
    // and it still contains everything the A-only filter passed
    assert(direct.subsetOf(indexedAB))
  }
}
