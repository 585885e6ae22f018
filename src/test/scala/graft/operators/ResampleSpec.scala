package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Resample.gapFillDaily]] — gapfill + locf: dense per-key daily
  * grids, forward-filled values, and the one-data-shuffle plan shape.
  */
class ResampleSpec extends SparkSpec {

  import spark.implicits._

  private def sparse = Seq(
    ("A", "2026-01-01", 10.0), ("A", "2026-01-03", 30.0),
    ("A", "2026-01-06", 60.0),
    ("B", "2026-01-02", 2.0))
    .toDF("k", "d", "v")
    .select(col("k"), to_date(col("d")).as("d"), col("v"))

  test("dense grid per key, observed values kept, gaps carry forward") {
    val out = Resample.gapFillDaily(sparse, Seq("k"), "d", Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    assert(out === Set(
      ("A", "2026-01-01", 10.0), ("A", "2026-01-02", 10.0),
      ("A", "2026-01-03", 30.0), ("A", "2026-01-04", 30.0),
      ("A", "2026-01-05", 30.0), ("A", "2026-01-06", 60.0),
      ("B", "2026-01-02", 2.0)))
  }

  test("multiple value columns fill independently; nulls in data do not break locf") {
    val df = Seq(
      ("A", "2026-01-01", Some(1.0), Some(10L)),
      ("A", "2026-01-03", None, Some(30L)), // v1 missing on an observed day
      ("A", "2026-01-04", Some(4.0), None))
      .toDF("k", "d", "v1", "v2")
      .select(col("k"), to_date(col("d")).as("d"), col("v1"), col("v2"))
    val out = Resample.gapFillDaily(df, Seq("k"), "d", Seq("v1", "v2"))
      .collect()
      .map(r => (r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    // a NULL observation is indistinguishable from a gap for that
    // column — it carries the previous value forward (locf semantics)
    assert(out === Set(
      ("2026-01-01", Some(1.0), Some(10L)),
      ("2026-01-02", Some(1.0), Some(10L)),
      ("2026-01-03", Some(1.0), Some(30L)),
      ("2026-01-04", Some(4.0), Some(30L))))
  }

  test("backward fill: gaps take the next observation; observed days keep their own") {
    val out = Resample.gapFillDailyBackward(sparse, Seq("k"), "d", Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .toSet
    assert(out === Set(
      ("A", "2026-01-01", 10.0), ("A", "2026-01-02", 30.0),
      ("A", "2026-01-03", 30.0), ("A", "2026-01-04", 60.0),
      ("A", "2026-01-05", 60.0), ("A", "2026-01-06", 60.0),
      ("B", "2026-01-02", 2.0)))
  }

  test("linear interpolation: gaps slope between anchors, the tail holds, observed days exact") {
    val out = Resample.gapFillInterpolate(
      Seq(("A", "2026-01-01", 10.0), ("A", "2026-01-04", 40.0),
        ("A", "2026-01-06", 40.0))
        .toDF("k", "d", "v")
        .select(col("k"), to_date(col("d")).as("d"), col("v")),
      Seq("k"), "d", Seq("v"))
      .collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
    assert(out === Set(
      ("2026-01-01", 10.0), ("2026-01-02", 20.0), ("2026-01-03", 30.0),
      ("2026-01-04", 40.0), ("2026-01-05", 40.0), ("2026-01-06", 40.0)))
  }

  test("plan: the fill is one data shuffle — no (key, date) join, grid via partial-agg span") {
    val q = Resample.gapFillDaily(sparse, Seq("k"), "d", Seq("v"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"gap-fill must not join two corpus-scale sides:\n$plan")
    val exchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    // span partial-agg + the per-key window — nothing else
    assert(exchanges <= 2, s"too many shuffles:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"span aggregation not map-side combined:\n$plan")
  }
}
