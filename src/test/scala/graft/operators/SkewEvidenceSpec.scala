package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-key evidence for the two documented skew escape hatches
  * (VERDICT r6 item 5): a planted key owning ~50% of all events, with
  * assertions on BOTH result equivalence and the physical shuffle
  * shape that makes the escape hatch actually spread the key.
  * Measured wall-clock for the same shapes at bench scale lives in
  * BASELINE.md (graft.SkewBench).
  */
class SkewEvidenceSpec extends SparkSpec {

  import spark.implicits._

  /** every hashpartitioning(...) span of a physical plan string */
  private def hashPartitionings(df: DataFrame): Seq[String] =
    "hashpartitioning\\([^)]*\\)".r
      .findAllIn(df.queryExecution.executedPlan.toString).toSeq

  // ~50% hot: user 0 has 400 quotes + 100 trades; 8 cold users share
  // the other half. Deterministic micro-times inside one day.
  private val dayMicros = 86400L * 1000000L
  private def quotes = spark.range(800).select(
    when($"id" < 400, 0L).otherwise(($"id" % 8) + 1).as("user_id"),
    timestamp_micros(pmod(xxhash64($"id"), lit(dayMicros))).as("qts"),
    $"id".as("quote_id"),
    ($"id" * 2).cast("double").as("px"))
  private def trades = spark.range(200).select(
    when($"id" < 100, 0L).otherwise(($"id" % 8) + 1).as("user_id"),
    timestamp_micros(pmod(xxhash64($"id" + 5000), lit(dayMicros))).as("tts"),
    $"id".as("trade_id"))

  test("binned as-of equals carry-forward under a 50% hot key; its exchange key includes the time bucket") {
    val tol = 3600L * 1000000L // 1h
    val plain = Asof.joinAsOf(trades, quotes, Seq("user_id"),
      "tts", "qts", "quote_id", toleranceMicros = Some(tol))
    val binned = Asof.joinAsOfBinned(trades, quotes, Seq("user_id"),
      "tts", "qts", "quote_id", toleranceMicros = tol,
      bucketMicros = 1800L * 1000000L)
    val key = (r: org.apache.spark.sql.Row) => r.mkString("|")
    assert(binned.collect().map(key).sorted.toSeq ===
      plain.collect().map(key).sorted.toSeq)

    withNoAqe {
      // at bench/cluster scale neither side broadcasts — disable the
      // threshold so the plan inspected here is the shuffled one
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val prior = spark.conf.get(thr)
      spark.conf.set(thr, "-1")
      try {
        // carry-forward: the ONLY shuffle key is the equality key — the
        // hot key's whole day serializes into one sort task
        val plain2 = Asof.joinAsOf(trades, quotes, Seq("user_id"),
          "tts", "qts", "quote_id", toleranceMicros = Some(tol))
        val plainParts = hashPartitionings(plain2)
        assert(plainParts.nonEmpty && plainParts.forall(p =>
          p.contains("user_id") && !p.contains("__b")), s"plain: $plainParts")
        // binned: the range join's exchanges hash on (user_id, __b) —
        // the hot key spreads over its time buckets
        val binned2 = Asof.joinAsOfBinned(trades, quotes, Seq("user_id"),
          "tts", "qts", "quote_id", toleranceMicros = tol,
          bucketMicros = 1800L * 1000000L)
        val binnedParts = hashPartitionings(binned2)
        assert(binnedParts.exists(p => p.contains("user_id") && p.contains("__b")),
          s"no (key, bucket) exchange in: $binnedParts")
      } finally spark.conf.set(thr, prior)
    }
  }

  private def skewedRows = spark.range(2000).select(
    when($"id" < 1000, 0L).otherwise($"id" % 16 + 1).as("key"),
    $"id".cast("double").as("v"))
  private val aggsSpec = Map(
    "s" -> (col("v"), "sum"), "n" -> (col("v"), "count"))

  test("saltedAgg: subset-satisfies pitfall on a key-partitioned input; spread=true restores the (key, salt) exchange") {
    val pre = skewedRows.repartition($"key") // the post-join shape
    val plain = pre.groupBy("key").agg(sum("v").as("s"), count("v").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    withNoAqe {
      // default (spread=false): HashPartitioning(key) satisfies
      // ClusteredDistribution(key, __salt), so NO exchange carries the
      // salt — the hot key stays physically concentrated. This pins
      // WHY the spread flag exists.
      val unspread = Skew.saltedAgg(pre, Seq("key"), 8, aggsSpec)
      assert(!hashPartitionings(unspread).exists(_.contains("__salt")),
        s"expected the pitfall (no salt exchange): ${hashPartitionings(unspread)}")

      // spread=true: an explicit raw-row repartition on (key, __salt)
      // physically moves the hot key to saltBuckets tasks
      val sp = Skew.saltedAgg(pre, Seq("key"), 8, aggsSpec, spread = true)
      assert(hashPartitionings(sp).exists(p =>
        p.contains("key") && p.contains("__salt")),
        s"no (key, salt) exchange: ${hashPartitionings(sp)}")
      val got = sp.collect()
        .map(r => r.getAs[Long]("key") ->
          (r.getAs[Double]("s"), r.getAs[Long]("n"))).toMap
      assert(got.keySet === plain.keySet)
      got.foreach { case (k, (s, n)) =>
        assert(n === plain(k)._2)
        assert(math.abs(s - plain(k)._1) <= math.abs(plain(k)._1) * 1e-12)
      }
    }
  }

  test("saltedJoin on a key-partitioned probe: observe whether the join exchange carries the salt") {
    val probe = skewedRows.repartition($"key")
    val build = (0L to 16L).map(k => (k, s"name$k")).toDF("key", "name")
      .hint("shuffle_hash") // force a shuffled join: broadcast would hide the question
    withNoAqe {
      val joined = Skew.saltedJoin(probe, build, "key", saltBuckets = 4)
      info(s"saltedJoin exchanges: ${hashPartitionings(joined)}")
      assert(hashPartitionings(joined).exists(_.contains("__salt")),
        s"salted join never spreads the probe: ${hashPartitionings(joined)}")
    }
  }
}
