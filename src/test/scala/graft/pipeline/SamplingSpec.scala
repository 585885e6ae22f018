package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (0L until 2000L).map(i =>
    (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("fixedSizeStratifiedAgg == window formulation; partition-invariant; SQL-registered") {
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    def kept(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaAgg = kept(Sampling.fixedSizeStratifiedAgg(
      docs, "lang", k = 15, keyCol = "doc_id", salt = "s1")
      .select(col("lang"), col("doc_id")))
    val viaWindow = Sampling.fixedSizeStratified(
      docs, "lang", k = 15, keyCol = "doc_id", salt = "s1")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(viaAgg === viaWindow, "aggregate and window forms must agree exactly")
    assert(viaAgg.groupBy(_._1).forall(_._2.size == 15))
    // bounded-state merge across partitionings cannot change the set
    val repart = kept(Sampling.fixedSizeStratifiedAgg(
      docs.repartition(17), "lang", k = 15, keyCol = "doc_id", salt = "s1")
      .select(col("lang"), col("doc_id")))
    assert(repart === viaAgg)
    // whole small strata pass through (k larger than the stratum)
    val small = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "lang")
    assert(Sampling.fixedSizeStratifiedAgg(small, "lang", 15, "doc_id")
      .count() === 2L)
    // SQL surface: same aggregate through the registered function
    docs.createOrReplaceTempView("rsv_docs")
    val viaSql = spark.sql(
      """SELECT lang, explode(reservoir_keys(
        |  CAST(conv(substring(md5(concat(length(CAST(doc_id AS STRING)),
        |    ':', CAST(doc_id AS STRING), '/s1')), 1, 8), 16, 10) AS BIGINT),
        |  doc_id, 15)) AS doc_id
        |FROM rsv_docs GROUP BY lang""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaSql === viaAgg)
  }

  test("epochShuffle: a reproducible permutation per epoch; epochs differ") {
    val docs = corpus.select(col("doc_id"))
    val e1 = Sampling.epochShuffle(docs, epoch = 1, keyCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation: ranks are exactly 1..n, each doc once
    assert(e1.values.toSeq.sorted === (1L to 2000L))
    // partitioning-invariant (range partition boundaries move, ranks
    // cannot — rank is a function of the total order alone)
    val e1b = Sampling.epochShuffle(docs.repartition(17), epoch = 1,
      keyCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 === e1b)
    // epoch 2 is a genuinely different permutation
    val e2 = Sampling.epochShuffle(docs, epoch = 2, keyCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e2 !== e1)
    assert(e2.values.toSeq.sorted === (1L to 2000L))
  }

  test("uniformByKey: deterministic across runs AND partitionings; ~fraction kept") {
    val a = Sampling.uniformByKey(corpus, 0.3, "doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.uniformByKey(corpus.repartition(17), 0.3, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b) // df.sample() would fail this: per-partition seeding
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"kept ${a.size}/2000")
    // a different salt draws a genuinely different set
    val salted = Sampling.uniformByKey(corpus, 0.3, "doc_id", salt = "v2")
      .collect().map(_.getLong(0)).toSet
    assert(salted !== a)
  }

  test("stratified: per-language fractions honored") {
    val kept = Sampling.stratified(corpus, "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 0.5, keyCol = "doc_id")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") === 500L) // fraction 1.0: every en doc
    assert(!kept.contains("de")) // fraction 0.0: none
    assert(math.abs(kept("fr") / 1000.0 - 0.5) < 0.06, s"fr kept ${kept("fr")}")
  }

  test("null keys stay disjoint-and-covering; '/' in keys cannot collide with salt") {
    // null key: md5(NULL) is NULL and a null variate fails BOTH split
    // predicates — rows would silently vanish from every split
    val withNulls = Seq((Some("a"), 1), (None, 2), (None, 3))
      .toDF("k", "v")
    val (train, test) = Sampling.trainTestSplit(withNulls, 0.5, "k")
    assert(train.count() + test.count() === 3,
      "null-keyed rows fell out of the split")
    // all null-keyed rows share one variate -> they travel together
    val nullSides = Seq(train, test).map(_.where(col("k").isNull).count())
    assert(nullSides.contains(0L) && nullSides.contains(2L))

    // injective (key, salt) encoding: without the length prefix,
    // (key="a", salt="b/c") and (key="a/b", salt="c") hash the same
    // string and correlate perfectly
    val u1 = Seq("a").toDF("k").select(Sampling.uniform(col("k"), "b/c")).head().getDouble(0)
    val u2 = Seq("a/b").toDF("k").select(Sampling.uniform(col("k"), "c")).head().getDouble(0)
    assert(u1 !== u2)
  }

  test("trainTestSplit: disjoint, covering, stable") {
    val (train, test) = Sampling.trainTestSplit(corpus, 0.25, "doc_id")
    val tr = train.collect().map(_.getLong(0)).toSet
    val te = test.collect().map(_.getLong(0)).toSet
    assert(tr.intersect(te).isEmpty)
    assert(tr.union(te).size === 2000)
    assert(math.abs(te.size / 2000.0 - 0.25) < 0.05, s"test ${te.size}/2000")
    // re-derivation (e.g. months later, different cluster) is identical
    val (_, test2) = Sampling.trainTestSplit(corpus.repartition(5), 0.25, "doc_id")
    assert(test2.collect().map(_.getLong(0)).toSet === te)
  }

  test("fixedSizeStratified: exactly k per stratum, stable across partitionings, small strata whole") {
    import spark.implicits._
    val rows = (1L to 200L).map(i => (i, if (i <= 150) "big" else if (i <= 190) "mid" else "tiny"))
    val df = rows.toDF("doc_id", "src")
    val a = Sampling.fixedSizeStratified(df, "src", k = 25, keyCol = "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.count(_._2 == "big") === 25)
    assert(a.count(_._2 == "mid") === 25)
    assert(a.count(_._2 == "tiny") === 10) // smaller than k: kept whole
    val b = Sampling.fixedSizeStratified(df.repartition(7), "src", k = 25,
      keyCol = "doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    // different salt -> different (but still size-k) selection
    val c = Sampling.fixedSizeStratified(df, "src", k = 25, keyCol = "doc_id",
      salt = "other").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(c.count(_._2 == "big") === 25)
    assert(c !== a)
  }

  // skewed mix: en 1000, de 600, fr 400
  private def skewedCorpus = (0L until 2000L).map(i =>
    (i, if (i % 2 == 0) "en" else if (i % 5 < 3) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("temperatureMix: alpha=1 identity, alpha=0 equalizes to the smallest stratum, alpha=0.5 in between") {
    val df = skewedCorpus
    val natural = df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natural === Map("en" -> 1000L, "de" -> 600L, "fr" -> 400L))

    // alpha = 1: f == 1 everywhere, nothing dropped
    val a1 = Sampling.temperatureMix(df, "lang", alpha = 1.0, keyCol = "doc_id")
    assert(a1.count() === 2000L)

    // alpha = 0: every stratum's EXPECTED kept count = cnt_min = 400
    val a0 = Sampling.temperatureMix(df, "lang", alpha = 0.0, keyCol = "doc_id")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a0("fr") === 400L) // f = 1: smallest stratum kept whole
    assert(math.abs(a0("en") - 400.0) < 80, s"en kept ${a0("en")}")
    assert(math.abs(a0("de") - 400.0) < 80, s"de kept ${a0("de")}")

    // alpha = 0.5: expected kept = sqrt(400 * cnt) — between the two
    val a5 = Sampling.temperatureMix(df, "lang", alpha = 0.5, keyCol = "doc_id")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a5("fr") === 400L)
    assert(math.abs(a5("en") - math.sqrt(400.0 * 1000)) < 90, s"en kept ${a5("en")}")
    assert(a5("en") > a0("en") && a5("en") < 1000L)
  }

  test("temperatureMix: kept sets are NESTED in alpha and deterministic across partitionings") {
    val df = skewedCorpus
    def keptAt(alpha: Double, d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(d, "lang", alpha, keyCol = "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val k0 = keptAt(0.0, df); val k5 = keptAt(0.5, df); val k1 = keptAt(1.0, df)
    assert(k0.subsetOf(k5) && k5.subsetOf(k1)) // u < f monotone in f
    assert(keptAt(0.5, df.repartition(13)) === k5)
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "lang", alpha = 1.5, keyCol = "doc_id"))
  }

  test("weightedByKey: kept set matches the closed-form predicate exactly") {
    // weights 1..200 over 200 docs; c = 0.4 * 200 / sum(1..200)
    val df = (1L to 200L).map(i => (i, i)).toDF("doc_id", "w")
    val kept = Sampling.weightedByKey(df, "w", targetFraction = 0.4,
      keyCol = "doc_id", salt = "s")
      .collect().map(_.getLong(0)).toSet
    val c = 0.4 * 200L / BigDecimal((1L to 200L).sum).setScale(6).toDouble
    val variates = df
      .select(col("doc_id"), Sampling.uniform(col("doc_id"), "s").as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = (1L to 200L).filter(i =>
      variates(i) < math.min(1.0, i.toDouble * c)).toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < 200)
    // heavier rows keep more often: compare the top and bottom decile
    val top = (181L to 200L).count(kept)
    val bottom = (1L to 20L).count(kept)
    assert(top > bottom, s"top-decile kept $top vs bottom $bottom")
  }

  test("weightedByKey: partitioning invariance, zero/null weights dropped, edge fractions") {
    val df = Seq((1L, Some(10L)), (2L, Some(0L)), (3L, None),
      (4L, Some(10L)), (5L, Some(5L))).toDF("doc_id", "w")
    val a = Sampling.weightedByKey(df, "w", 0.5, "doc_id", "x")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedByKey(df.repartition(7), "w", 0.5, "doc_id", "x")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(!a.contains(2L)) // zero weight: keep probability 0
    assert(!a.contains(3L)) // null weight: comparison never passes
    // targetFraction 0 -> empty; equal weights at 1.0 -> w*c = 1, all kept
    assert(Sampling.weightedByKey(df, "w", 0.0, "doc_id").count() === 0L)
    val eq = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("doc_id", "w")
    assert(Sampling.weightedByKey(eq, "w", 1.0, "doc_id").count() === 3L)
    // empty / all-null corpora return empty, not NPE
    assert(Sampling.weightedByKey(
      Seq.empty[(Long, Option[Long])].toDF("doc_id", "w"),
      "w", 0.5, "doc_id").count() === 0L)
  }

  test("epochAllocation: full epochs repeat everything, fractional epoch subsamples") {
    // stratum a: 100 tokens; b: 100 tokens; total 200.
    // budgetFrac=1, share(a)=0.5 -> a's rate = 0.5*200/100 = 1.0 exactly
    // (one full epoch, frac 0 -> every a doc repeats exactly once);
    // share(b)=1.25 -> rate 2.5 (all docs 2x, ~half get a 3rd).
    val df = (1 to 10).map(i => (i.toLong, "a", 10L)) ++
      (11 to 20).map(i => (i.toLong, "b", 10L))
    val out = Sampling.epochAllocation(df.toDF("doc_id", "src", "tok"),
      "src", "tok", Map("a" -> 0.5, "b" -> 1.25), defaultShare = 0.0,
      budgetFrac = 1.0, keyCol = "doc_id", salt = "e")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Long]("n_repeats")))
    val a = out.filter(_._2 == "a")
    val b = out.filter(_._2 == "b")
    assert(a.length === 10 && a.forall(_._3 === 1L))
    assert(b.length === 10 && b.forall(x => x._3 === 2L || x._3 === 3L))
    assert(b.exists(_._3 === 3L), "fractional epoch selected nobody")
    assert(b.exists(_._3 === 2L), "fractional epoch selected everybody")
  }

  test("zero-token strata drop finitely (no +Infinity rate / MaxValue repeats)") {
    // stratum 'z' is all empty docs: 0 supply. IEEE x/0 would give it
    // rate = +Inf and epochAllocation floor(Inf) = Long.MaxValue
    // repeats; the contract is zero-supply strata supply nothing.
    val df = ((1 to 10).map(i => (i.toLong, "a", 10L)) ++
      (11 to 14).map(i => (i.toLong, "z", 0L)))
      .toDF("doc_id", "src", "tok")
    val ep = Sampling.epochAllocation(df, "src", "tok",
      Map("a" -> 0.5, "z" -> 0.5), defaultShare = 0.0,
      budgetFrac = 1.0, keyCol = "doc_id", salt = "e").collect()
    assert(ep.forall(_.getAs[String]("src") == "a"), "z docs must drop")
    assert(ep.forall(_.getAs[Long]("n_repeats") < 1000L),
      "repeat counts must stay finite")
    val bm = Sampling.tokenBudgetMix(df, "src", "tok",
      Map("a" -> 0.5, "z" -> 0.5), defaultShare = 0.0,
      budgetFrac = 1.0, keyCol = "doc_id", salt = "b").collect()
    assert(bm.forall(_.getAs[String]("src") == "a"))
  }

  test("epochAllocation: zero-share strata vanish; deterministic across partitionings") {
    val df = (1 to 60).map(i => (i.toLong, s"s${i % 3}", (i % 7 + 1).toLong))
      .toDF("doc_id", "src", "tok")
    def run(parts: Int) = Sampling.epochAllocation(df.repartition(parts),
      "src", "tok", Map("s0" -> 0.0), defaultShare = 0.4,
      budgetFrac = 1.5, keyCol = "doc_id", salt = "e")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_repeats"))).toSet
    val one = run(1)
    assert(one === run(7))
    assert(one.nonEmpty)
    // s0 allocated zero tokens -> no repeats at all
    val s0Ids = (1 to 60).filter(_ % 3 == 0).map(_.toLong).toSet
    assert(one.forall { case (id, _) => !s0Ids.contains(id) })
  }
}
