package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Snapshots.diff]]: all four statuses, null-content equality,
  * injective multi-column encoding, partitioning invariance.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(old: Seq[(Long, String)], cur: Seq[(Long, String)]) =
    Snapshots.diff(old.toDF("doc_id", "text"), cur.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("added / removed / changed / unchanged all classify") {
    val old = Seq(1L -> "a", 2L -> "b", 3L -> "c")
    val cur = Seq(2L -> "b", 3L -> "C", 4L -> "d")
    assert(statuses(old, cur) === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("NULL content compares equal to NULL, not changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("doc_id", "text")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Snapshots.diff(old, cur)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("multi-column encoding is injective across column boundaries") {
    // ("ab","c") vs ("a","bc"): a bare concat would hash equal
    val old = Seq((1L, "ab", "c")).toDF("doc_id", "t1", "t2")
    val cur = Seq((1L, "a", "bc")).toDF("doc_id", "t1", "t2")
    val got = Snapshots.diff(old, cur, contentCols = Seq("t1", "t2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed"))
  }

  test("result is invariant under partitioning") {
    val old = (1L to 500L).map(i => i -> s"t$i").toDF("doc_id", "text")
    val cur = (200L to 700L).map(i => i -> s"t${i + (i % 3)}").toDF("doc_id", "text")
    val a = Snapshots.diff(old, cur)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Snapshots.diff(old.repartition(13), cur.repartition(7))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    assert(a.size === 700)
  }

  test("diffCard: per-(status, stratum) counts; removed rows read the OLD side") {
    import spark.implicits._
    val old = Seq(
      (1L, "a b c", "s1"),       // unchanged
      (2L, "d e", "s1"),         // changed (2 -> 3 tokens in cur)
      (3L, "x y z w", "s2"))     // removed: 4 tokens, counted from OLD
      .toDF("doc_id", "text", "source")
    val cur = Seq(
      (1L, "a b c", "s1"),
      (2L, "d e f", "s1"),
      (4L, "new doc", "s2"))     // added
      .toDF("doc_id", "text", "source")
    val card = Snapshots.diffCard(old, cur, stratumCol = "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(card(("unchanged", "s1")) === ((1L, 3L)))
    assert(card(("changed", "s1")) === ((1L, 3L))) // CURRENT tokens
    assert(card(("removed", "s2")) === ((1L, 4L))) // OLD tokens
    assert(card(("added", "s2")) === ((1L, 2L)))
    assert(card.size === 4)
  }

  test("tokenDrift: zero on identical snapshots, near ln 2 on disjoint vocabularies, ordered in between") {
    val spark2 = spark
    import spark2.implicits._
    def corpus(words: Seq[String]) = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => words((i + j) % words.size)).mkString(" "))
    }.toDF("doc_id", "text")
    val va = corpus(Seq("alpha", "beta", "gamma", "delta"))
    val vb = corpus(Seq("omega", "sigma", "theta", "kappa"))
    def drift(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) = {
      val r = Snapshots.tokenDrift(a, b).head()
      (r.getAs[Double]("js_divergence"), r.getAs[Double]("tv_distance"))
    }
    // identical snapshots: both measures exactly 0 (p == q bucket-wise)
    val (js0, tv0) = drift(va, va)
    assert(math.abs(js0) < 1e-12 && math.abs(tv0) < 1e-12)
    // disjoint vocabularies: JS approaches its ln 2 bound, TV its 1 bound
    val (jsD, tvD) = drift(va, vb)
    assert(jsD > 0.5 * math.log(2) && jsD <= math.log(2) + 1e-9, s"js=$jsD")
    assert(tvD > 0.5 && tvD <= 1.0 + 1e-9, s"tv=$tvD")
    // a small edit sits strictly between the extremes, and JS is symmetric
    val vaEdited = va.withColumn("text",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.lit(" drifted")))
    val (jsE, _) = drift(va, vaEdited)
    assert(jsE > 0.0 && jsE < jsD, s"jsE=$jsE not between 0 and $jsD")
    val (jsE2, _) = drift(vaEdited, va)
    assert(math.abs(jsE - jsE2) < 1e-12, "JS not symmetric")
  }
}
