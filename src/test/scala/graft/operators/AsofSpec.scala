package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Asof.joinAsOf]] semantics on hand-built fixtures: nearest-prior
  * selection, exact-time inclusion/exclusion, tolerance horizon,
  * same-time tie-break, missing-match nulls, key isolation.
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = timestamp_micros(lit(us))

  // left probes: (id, key, time-us)
  private def leftDf = Seq(
    (1L, "a", 1000L),
    (2L, "a", 5000L),
    (3L, "b", 1000L),
    (4L, "c", 9000L)
  ).toDF("id", "k", "us").withColumn("t", timestamp_micros(col("us"))).drop("us")

  // right states: (rid, key, time-us, price)
  private def rightDf = Seq(
    (10L, "a", 500L, 1.0),
    (11L, "a", 1000L, 2.0),  // exact tie with left id=1
    (12L, "a", 1000L, 3.0),  // same-time duplicate: greater rid wins
    (13L, "a", 4000L, 4.0),
    (14L, "b", 2000L, 5.0),  // after left id=3 — never matches backward
    (15L, "c", 100L, 6.0)    // far before left id=4 — tolerance test
  ).toDF("rid", "k", "us", "price")
    .withColumn("t", timestamp_micros(col("us"))).drop("us")

  private def run(tol: Option[Long], exact: Boolean) =
    Asof.joinAsOf(leftDf, rightDf, on = Seq("k"), leftTime = "t",
      rightTime = "t", rightTie = "rid",
      toleranceMicros = tol, allowExactMatches = exact)
      .select(col("id"), col("right_rid"), col("right_price"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

  test("backward as-of picks nearest prior; exact time counts; same-time tie -> greatest tie id") {
    val m = run(tol = None, exact = true)
    assert(m(1L) === 12L) // both 1000us rows qualify at exact time; rid 12 wins
    assert(m(2L) === 13L) // nearest prior of 5000 is 4000
    assert(m(3L) === -1L) // only right row for b is LATER — no match
    assert(m(4L) === 15L) // no tolerance: 8900us-old state still matches
  }

  test("allowExactMatches=false excludes the equal-timestamp state") {
    val m = run(tol = None, exact = false)
    assert(m(1L) === 10L) // 1000us rows excluded; falls back to 500us
    assert(m(2L) === 13L) // strictly-before unchanged for non-ties
  }

  test("tolerance nulls out matches older than the horizon") {
    val m = run(tol = Some(2000L), exact = true)
    assert(m(1L) === 12L) // age 0 <= 2000
    assert(m(2L) === 13L) // age 1000 <= 2000
    assert(m(4L) === -1L) // age 8900 > 2000 — nulled
  }

  test("carried right columns are null exactly when no match") {
    val rows = Asof.joinAsOf(leftDf, rightDf, Seq("k"), "t", "t", "rid")
      .where(col("id") === 3L).collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("right_price")))
    assert(rows.head.isNullAt(rows.head.fieldIndex("right_t")))
  }

  test("result is partitioning-invariant (1 vs 4 partitions)") {
    val a = run(tol = None, exact = true)
    val b = Asof.joinAsOf(leftDf.repartition(4), rightDf.repartition(1),
      Seq("k"), "t", "t", "rid")
      .select(col("id"), col("right_rid"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(a === b)
  }

  test("NULL keys never match (SQL equi-join semantics); left nulls survive unenriched") {
    import spark.implicits._
    val l = Seq((1L, Option("a"), 100L), (2L, Option.empty[String], 100L))
      .toDF("id", "k", "us")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val r = Seq((10L, Option("a"), 50L, 1.0), (11L, Option.empty[String], 50L, 2.0))
      .toDF("rid", "k", "us", "price")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val m = Asof.joinAsOf(l, r, Seq("k"), "t", "t", "rid")
      .collect().map(row => row.getLong(row.fieldIndex("id")) ->
        (if (row.isNullAt(row.fieldIndex("right_rid"))) -1L
         else row.getLong(row.fieldIndex("right_rid")))).toMap
    assert(m(1L) === 10L)  // normal match
    assert(m(2L) === -1L)  // NULL key: row kept, no match
    assert(m.size === 2)
  }

  test("joinAsOfBinned == joinAsOf under a shared tolerance (fixture + 10 random streams)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def run2(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
        tol: Long, bucket: Long) = {
      val a = Asof.joinAsOf(l, r, Seq("k"), "t", "t", "rid",
        toleranceMicros = Some(tol))
        .select(col("id"), col("right_rid"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
      val b = Asof.joinAsOfBinned(l, r, Seq("k"), "t", "t", "rid",
        toleranceMicros = tol, bucketMicros = bucket)
        .select(col("id"), col("right_rid"))
        .collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
      (a, b)
    }
    // shared hand fixture
    val (fa, fb) = run2(leftDf.withColumnRenamed("id", "id"), rightDf, 2000L, 700L)
    assert(fa === fb)

    // randomized streams with heavy ts collisions
    val gen = Gen.listOfN(50, for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 25L).map(_ * 10L)
    } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) })
    for (seed <- 1 to 10) {
      val ev = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val (rr, ll) = ev.partition(_._1 % 2 == 0)
      val l = ll.toDF("id", "k", "us")
        .withColumn("t", timestamp_micros(col("us"))).drop("us")
      val r = rr.map { case (id, k, t) => (id, k, t, t.toDouble) }
        .toDF("rid", "k", "us", "price")
        .withColumn("t", timestamp_micros(col("us"))).drop("us")
      val (a, b) = run2(l, r, 60L, 25L)
      assert(a === b, s"seed $seed diverged")
    }
  }

  private def runFwd(tol: Option[Long], exact: Boolean) =
    Asof.joinAsOfForward(leftDf, rightDf, on = Seq("k"), leftTime = "t",
      rightTime = "t", rightTie = "rid",
      toleranceMicros = tol, allowExactMatches = exact)
      .select(col("id"), col("right_rid"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

  test("forward as-of picks nearest following; exact counts; same-time tie -> SMALLEST tie id") {
    val m = runFwd(tol = None, exact = true)
    assert(m(1L) === 11L) // exact-time rows qualify; earliest rid wins forward
    assert(m(2L) === -1L) // nothing at or after 5000us for key a
    assert(m(3L) === 14L) // 2000us is the next b state after 1000us
    assert(m(4L) === -1L) // c's only state is BEFORE the probe
  }

  test("forward: allowExactMatches=false skips the equal-time states") {
    val m = runFwd(tol = None, exact = false)
    assert(m(1L) === 13L) // 1000us rows excluded; next is 4000us
  }

  test("forward tolerance nulls out matches beyond the horizon") {
    val m = runFwd(tol = Some(1000L), exact = false)
    assert(m(1L) === -1L) // 4000us is 3000us ahead — beyond 1000us
    assert(m(3L) === 14L) // 1000us ahead — exactly at the horizon
  }

  test("forward mirrors backward under time negation") {
    // negate the time axis (numeric time columns) and the forward
    // join must reproduce the backward join's matches exactly
    def neg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("nt", -unix_micros(col("t")))
    val back = Asof.joinAsOf(leftDf, rightDf, Seq("k"), "t", "t", "rid")
      .select(col("id"), col("right_rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val fwdOnNeg = Asof.joinAsOfForward(neg(leftDf), neg(rightDf),
      Seq("k"), "nt", "nt", "rid")
      .select(col("id"), col("right_rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ties flip too (greatest-rid backward vs smallest-rid forward),
    // so compare only on keys without same-time duplicates
    (back.keySet - 1L).foreach(id => assert(back(id) === fwdOnNeg(id), s"id $id"))
  }
}
