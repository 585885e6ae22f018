package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-budget mixture sampling ([[Sampling.tokenBudgetMix]]):
  * oversubscription caps at keep-everything, fractional strata land
  * near their allocation, absent strata get the default share, and
  * the kept set is partitioning-invariant.
  */
class TokenBudgetMixSpec extends SparkSpec {

  import spark.implicits._

  // big: 2000 docs x 100 tokens; small: 40 docs x 50 tokens
  private lazy val docs = (
    (0 until 2000).map(i => (i.toLong, "big", 100L)) ++
      (0 until 40).map(i => ((10000 + i).toLong, "small", 50L))
    ).toDF("doc_id", "source", "n_tokens")

  test("an oversubscribed stratum caps at rate 1.0 and keeps everything") {
    // total = 202_000; budget = 10% = 20_200; small's share 50% =
    // 10_100 tokens >> its 2_000 supply => rate caps at 1.0
    val out = Sampling.tokenBudgetMix(docs, "source", "n_tokens",
      shares = Map("small" -> 0.5), defaultShare = 0.5,
      budgetFrac = 0.1, keyCol = "doc_id")
    val small = out.where(col("source") === "small")
    assert(small.count() === 40L)
    assert(small.select("rate").distinct().collect().head.getDouble(0) === 1.0)
  }

  test("a fractional stratum keeps ~ rate x docs (deterministic, binomial-tight)") {
    // big: share 0.5 of 20_200 = 10_100 / 200_000 => rate 0.0505
    val out = Sampling.tokenBudgetMix(docs, "source", "n_tokens",
      shares = Map("small" -> 0.5), defaultShare = 0.5,
      budgetFrac = 0.1, keyCol = "doc_id")
    val big = out.where(col("source") === "big")
    val rate = big.select("rate").distinct().collect().head.getDouble(0)
    assert(math.abs(rate - 0.0505) < 1e-12)
    val kept = big.count()
    // binomial(2000, .0505): mean 101, sd ~9.8; 5-sd deterministic band
    assert(kept > 50 && kept < 152, s"kept=$kept")
  }

  test("strata absent from the share map use the default share") {
    val out = Sampling.tokenBudgetMix(docs, "source", "n_tokens",
      shares = Map.empty, defaultShare = 0.25, budgetFrac = 0.2,
      keyCol = "doc_id")
    // both strata get share .25 of 40_400: big rate 10_100/200_000,
    // small rate 10_100/2_000 -> capped
    val rates = out.select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") === 1.0)
    assert(math.abs(rates("big") - 0.0505) < 1e-12)
  }

  test("kept set is a pure function of the row: partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetMix(d, "source", "n_tokens",
        shares = Map("small" -> 0.3), defaultShare = 0.2,
        budgetFrac = 0.15, keyCol = "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(run(docs) === run(docs.repartition(17)))
  }
}
