package graft.pipeline

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property layer for the round-10 session operators (p99–p110
  * family): randomized inputs asserting the invariants that hold by
  * construction — conservation, idempotence, monotonicity and
  * window-form equivalences a targeted fixture can miss. Raw
  * ScalaCheck `Gen` with fixed seeds (the scalatest-plus bridge
  * isn't in the offline cache).
  */
class Round10PropertiesSpec extends SparkSpec {
  import spark.implicits._

  // (id, stratum, tokens) rows — skewed strata, duplicate-free ids
  private val rowsGen: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(60, Gen.zip(
      Gen.oneOf("s0", "s0", "s0", "s1", "s2"), // s0 hot
      Gen.chooseNum(0L, 40L)))
      .map(_.zipWithIndex.map { case ((s, n), i) => (i.toLong, s, n) })

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("kAnonymitySuppress: every surviving combo has >= k members, and the op is idempotent (8 samples)") {
    for (rows <- samples(rowsGen, 8)) {
      val df = rows.map { case (id, s, n) => (id, s, (n % 3).toString) }
        .toDF("doc_id", "source", "grp")
      val once = Pii.kAnonymitySuppress(df, Seq("source", "grp"), k = 4)
      val counts = once.groupBy("source", "grp").count().collect()
      assert(counts.forall(_.getAs[Long]("count") >= 4))
      // suppression removes whole combos, so surviving combos keep
      // their exact pre-suppression size -> a second pass is a no-op
      val twice = Pii.kAnonymitySuppress(
        once.select("doc_id", "source", "grp"), Seq("source", "grp"), k = 4)
      assert(twice.select("doc_id").collect().map(_.getLong(0)).sorted
        === once.select("doc_id").collect().map(_.getLong(0)).sorted)
    }
  }

  test("tokenBudgetMix: kept sets NEST as the budget grows; a huge budget keeps everything (6 samples)") {
    for (rows <- samples(rowsGen, 6)) {
      val df = rows.toDF("doc_id", "source", "n_tokens")
      def kept(frac: Double): Set[Long] =
        Sampling.tokenBudgetMix(df, "source", "n_tokens",
          Map.empty, defaultShare = 0.34, budgetFrac = frac,
          keyCol = "doc_id", salt = "prop")
          .select("doc_id").collect().map(_.getLong(0)).toSet
      // rate is monotone in budgetFrac and the variate test is a
      // fixed threshold per key -> kept sets NEST as the budget grows
      val k1 = kept(0.3); val k2 = kept(0.6); val k3 = kept(1.2)
      assert(k1.subsetOf(k2) && k2.subsetOf(k3))
      // at a huge budget every stratum caps at rate 1.0 -> everything kept
      assert(kept(100.0).size === rows.length)
    }
  }

  test("epochAllocation: n_repeats in {floor(rate), floor(rate)+1}; zero-share strata vanish (6 samples)") {
    for (rows <- samples(rowsGen, 6)) {
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val out = Sampling.epochAllocation(df, "source", "n_tokens",
        Map("s2" -> 0.0), defaultShare = 0.4, budgetFrac = 2.0,
        keyCol = "doc_id", salt = "prop")
        .select($"source", $"rate", $"n_repeats").collect()
      assert(out.forall { r =>
        val rate = r.getDouble(1); val rep = r.getLong(2)
        rep == math.floor(rate).toLong || rep == math.floor(rate).toLong + 1
      })
      assert(!out.exists(_.getString(0) == "s2"))
    }
  }

  test("bucketedBatchesFromCounts: a partition — every doc exactly once, slots 0..n-1 contiguous per (bucket, batch) (6 samples)") {
    for (rows <- samples(rowsGen, 6)) {
      val df = rows.toDF("doc_id", "source", "n_tokens")
        .select($"doc_id", $"n_tokens")
      val out = Packing.bucketedBatchesFromCounts(df, bucketWidth = 10,
        batchSize = 4, idCol = "doc_id", tokensCol = "n_tokens")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"),
          r.getAs[Long]("batch_id"), r.getAs[Long]("slot")))
      assert(out.length === rows.length) // no doc dropped or duplicated
      assert(out.map(_._1).distinct.length === rows.length)
      out.groupBy(x => (x._2, x._3)).foreach { case (_, members) =>
        val slots = members.map(_._4).sorted
        assert(slots === (0L until slots.length.toLong))
        assert(slots.length <= 4)
      }
    }
  }

  test("sampleQuantiles: emitted values are actual data values and monotone in q (6 samples)") {
    for (rows <- samples(rowsGen, 6)) {
      val df = rows.toDF("doc_id", "source", "n_tokens")
      val out = Sampling.sampleQuantiles(df, "source", "n_tokens",
        "doc_id", k = 16, qs = Seq(0.1, 0.5, 0.9), salt = "prop")
        .collect()
      val bySource = rows.groupBy(_._2)
        .map { case (s, rs) => s -> rs.map(_._3.toDouble).toSet }
      out.foreach { r =>
        val s = r.getString(0)
        val (p10, p50, p90) =
          (r.getAs[Double]("p10"), r.getAs[Double]("p50"),
            r.getAs[Double]("p90"))
        assert(p10 <= p50 && p50 <= p90, s"non-monotone quantiles for $s")
        // selection, not interpolation: every bound is a real value
        assert(Seq(p10, p50, p90).forall(bySource(s).contains), s)
      }
    }
  }

  test("topKByStratum: output size min(k, stratum size); members dominate non-members (6 samples)") {
    for (rows <- samples(rowsGen, 6)) {
      val df = rows.map { case (id, s, n) => (id, s, n / 40.0) }
        .toDF("doc_id", "source", "score")
      val kept = Sampling.topKByStratum(df, "source", "score", "doc_id", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val byStratum = rows.groupBy(_._2)
      byStratum.foreach { case (s, rs) =>
        val members = kept.collect { case (`s`, id) => id }
        assert(members.size === math.min(5, rs.size), s)
        // every kept (score, -id) weakly dominates every dropped one
        val scoreOf = rs.map(r => r._1 -> r._3 / 40.0).toMap
        val dropped = rs.map(_._1).filterNot(members.contains)
        for (m <- members; d <- dropped) {
          val (sm, sd) = (scoreOf(m), scoreOf(d))
          assert(sm > sd || (sm == sd && m < d),
            s"$s: kept $m ($sm) dominated by dropped $d ($sd)")
        }
      }
    }
  }
}
