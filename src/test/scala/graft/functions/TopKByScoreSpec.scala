package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TopKByScore]] — the bounded-state grouped top-k selector:
  * window-form equivalence, tie/NaN/null contracts, partitioning
  * invariance (the merge law exercised through real map-side
  * partials), and the SQL registration.
  */
class TopKByScoreSpec extends SparkSpec {

  import spark.implicits._

  // (group, key, score) — group a has ties; group b is single-row;
  // group c carries null + NaN rows that must be skipped
  private def fixture = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.9), ("a", 4L, 0.1),
    ("a", 5L, 0.7), ("b", 6L, 0.5),
    ("c", 7L, 0.3), ("c", 8L, Double.NaN), ("c", 9L, 0.4))
    .toDF("g", "k", "s")

  private def topK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(SketchFunctions.topKByScore($"s", $"k", k).as("keys"))
      .select($"g", posexplode($"keys").as(Seq("rank", "k")))

  test("keeps the k best by (score desc, key asc), best-first") {
    val got = topK(fixture, 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // a: 0.9@1, 0.9@3 (tie -> smaller key first), 0.7@2
    // b: everything (fewer than k rows)
    // c: 0.4@9, 0.3@7 — NaN@8 skipped
    assert(got === Set(
      ("a", 0, 1L), ("a", 1, 3L), ("a", 2, 2L),
      ("b", 0, 6L),
      ("c", 0, 9L), ("c", 1, 7L)))
  }

  test("equals the window form on randomized data, any partitioning") {
    val n = 500
    val rnd = new scala.util.Random(7)
    val df = (1 to n).map { i =>
      (s"g${i % 7}", i.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    }.toDF("g", "k", "s")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"s".desc, $"k".asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 10).select($"g", $"k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = topK(df.repartition(parts), 10).select($"g", $"k").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("null scores and null keys are skipped; all-null group is empty") {
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, null), ("a", null, 0.5), ("a", 2L, 0.2))
      .toDF("g", "k", "s")
    val got = topK(df, 5).select($"k").as[Long].collect().toSeq
    assert(got === Seq(2L))
    val allNull = Seq[(String, java.lang.Long, java.lang.Double)](
      ("z", 1L, null)).toDF("g", "k", "s")
    val rows = allNull.groupBy($"g")
      .agg(SketchFunctions.topKByScore($"s", $"k", 5).as("keys"))
      .select(size($"keys")).as[Int].collect()
    assert(rows === Seq(0))
  }

  test("registered in SQL as top_k_by_score") {
    fixture.createOrReplaceTempView("topk_fixture")
    val got = spark.sql(
      """SELECT g, top_k_by_score(s, k, 2) AS keys
        |FROM topk_fixture GROUP BY g""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 3L))
    assert(got("b") === Seq(6L))
  }

  test("-0.0 == 0.0 like the window sort (tie broken by key, not sign bit)") {
    // Double.compare alone says -0.0 < 0.0; Spark's window sort and
    // SQL engines compare them EQUAL, tie broken by key. The
    // aggregate normalizes -0.0 at update so the kept set cannot
    // diverge when signed zeros straddle the k boundary:
    // keys (1,-0.0),(2,0.0), k=1 — window keeps 1; unnormalized
    // Double.compare would keep 2.
    val df = Seq(("a", 1L, -0.0), ("a", 2L, 0.0))
      .toDF("g", "k", "s")
    val got = topK(df, 1).select($"k").as[Long].collect().toSeq
    assert(got === Seq(1L))
    // and the full order still puts both zeros below a real score
    val df2 = Seq(("a", 1L, 0.0), ("a", 2L, -0.0), ("a", 3L, 0.1))
      .toDF("g", "k", "s")
    assert(topK(df2, 2).select($"k").as[Long].collect().toSeq === Seq(3L, 1L))
  }
}
