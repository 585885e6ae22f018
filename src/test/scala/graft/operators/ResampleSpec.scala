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

  private def hourly = Seq(
    ("A", "2026-01-01 00:00:00", 10.0), ("A", "2026-01-01 03:00:00", 40.0),
    ("B", "2026-01-01 05:00:00", 5.0))
    .toDF("k", "t", "v")
    .select(col("k"), col("t").cast("timestamp").as("t"), col("v"))

  test("hour grain: dense hourly grid, all three modes") {
    def run(mode: String) =
      Resample.gapFill(hourly, Seq("k"), "t", Seq("v"), mode, "hour")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2)))
        .toSet
    assert(run("locf") === Set(
      ("A", "2026-01-01 00:00:00.0", 10.0), ("A", "2026-01-01 01:00:00.0", 10.0),
      ("A", "2026-01-01 02:00:00.0", 10.0), ("A", "2026-01-01 03:00:00.0", 40.0),
      ("B", "2026-01-01 05:00:00.0", 5.0)))
    assert(run("bfill") === Set(
      ("A", "2026-01-01 00:00:00.0", 10.0), ("A", "2026-01-01 01:00:00.0", 40.0),
      ("A", "2026-01-01 02:00:00.0", 40.0), ("A", "2026-01-01 03:00:00.0", 40.0),
      ("B", "2026-01-01 05:00:00.0", 5.0)))
    assert(run("interp") === Set(
      ("A", "2026-01-01 00:00:00.0", 10.0), ("A", "2026-01-01 01:00:00.0", 20.0),
      ("A", "2026-01-01 02:00:00.0", 30.0), ("A", "2026-01-01 03:00:00.0", 40.0),
      ("B", "2026-01-01 05:00:00.0", 5.0)))
  }

  test("week and month grains step the grid by calendar interval") {
    val weekly = Seq(("A", "2026-01-05 00:00:00", 1.0),
      ("A", "2026-01-26 00:00:00", 4.0))
      .toDF("k", "t", "v")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("v"))
    val w = Resample.gapFill(weekly, Seq("k"), "t", Seq("v"), "locf", "week")
      .collect().map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(w === Map(
      "2026-01-05 00:00:00.0" -> 1.0, "2026-01-12 00:00:00.0" -> 1.0,
      "2026-01-19 00:00:00.0" -> 1.0, "2026-01-26 00:00:00.0" -> 4.0))
    val monthly = Seq(("A", "2026-01-01 00:00:00", 1.0),
      ("A", "2026-04-01 00:00:00", 4.0))
      .toDF("k", "t", "v")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("v"))
    // unequal month lengths: interpolation is linear in REAL time
    // (seconds), so Feb/Mar buckets are not at thirds
    val m = Resample.gapFill(monthly, Seq("k"), "t", Seq("v"), "interp", "month")
      .collect().map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(m.keySet === Set("2026-01-01 00:00:00.0", "2026-02-01 00:00:00.0",
      "2026-03-01 00:00:00.0", "2026-04-01 00:00:00.0"))
    assert(m("2026-01-01 00:00:00.0") === 1.0 && m("2026-04-01 00:00:00.0") === 4.0)
    val total = 90.0 // days Jan 1 → Apr 1
    assert(math.abs(m("2026-02-01 00:00:00.0") - (1.0 + 3.0 * 31 / total)) < 1e-9)
    assert(math.abs(m("2026-03-01 00:00:00.0") - (1.0 + 3.0 * 59 / total)) < 1e-9)
  }

  test("hour grain refuses a DateType column; unknown grain/mode refuse") {
    intercept[IllegalArgumentException] {
      Resample.gapFill(sparse, Seq("k"), "d", Seq("v"), "locf", "hour").collect()
    }
    intercept[IllegalArgumentException] {
      Resample.gapFill(sparse, Seq("k"), "d", Seq("v"), "locf", "minute")
    }
    intercept[IllegalArgumentException] {
      Resample.gapFill(sparse, Seq("k"), "d", Seq("v"), "nearest")
    }
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
