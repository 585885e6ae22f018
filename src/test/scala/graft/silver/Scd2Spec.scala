package graft.silver

import graft.SparkSpec

/** [[Scd2.history]]: change-collapse, validity chaining, null-safe
  * attribute compare, same-ts tie order, A->B->A re-change.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, tie, ts, attr): key 1 goes A,A,B,A (re-change must open a
  // THIRD version, not merge with version 0); key 2: null -> null
  // (no change) -> X (change)
  private def snaps = Seq(
    (1L, 1L, 10L, Some("A")),
    (1L, 2L, 20L, Some("A")),
    (1L, 3L, 30L, Some("B")),
    (1L, 4L, 40L, Some("A")),
    (2L, 5L, 10L, None),
    (2L, 6L, 20L, None),
    (2L, 7L, 30L, Some("X"))
  ).toDF("k", "tie", "ts", "attr")

  private def rows = Scd2.history(snaps, "k", "ts", "tie", Seq("attr"))
    .collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> (
        Option(r.getString(2)),
        r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getLong(5),
        r.getBoolean(6))
    }.toMap

  test("consecutive equal snapshots collapse; changes chain validity ranges") {
    val m = rows
    assert(m((1L, 0L)) === ((Some("A"), 10L, 30L, 2L, false)))
    assert(m((1L, 1L)) === ((Some("B"), 30L, 40L, 1L, false)))
    assert(m((1L, 2L)) === ((Some("A"), 40L, -1L, 1L, true))) // re-change: new version
    assert(m.keys.count(_._1 == 1L) === 3)
  }

  test("null -> null is no change; null -> value is a change (IS DISTINCT FROM)") {
    val m = rows
    assert(m((2L, 0L)) === ((None, 10L, 30L, 2L, false)))
    assert(m((2L, 1L)) === ((Some("X"), 30L, -1L, 1L, true)))
  }

  test("same-timestamp snapshots order by tie for the change boundary") {
    val df = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 10L, "B") // same ts: A then B by tie
    ).toDF("k", "tie", "ts", "attr")
    val m = Scd2.history(df, "k", "ts", "tie", Seq("attr"))
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(m === Map(0L -> "A", 1L -> "B"))
  }

  test("a NULL-ts first snapshot does not fake a version break for its successor") {
    // NULLs sort first: with lag(ts).isNull first-row detection the
    // 10L row would see lag = NULL and open a spurious second version
    // of the SAME attribute value (round-6 advice 5) — positional
    // row_number detection keeps it in version 0.
    val df = Seq(
      (3L, 1L, None: Option[Long], "A"),
      (3L, 2L, Some(10L), "A"),
      (3L, 3L, Some(20L), "B")
    ).toDF("k", "tie", "ts", "attr")
    val m = Scd2.history(df, "k", "ts", "tie", Seq("attr"))
      .collect().map(r => r.getLong(1) -> (r.getString(2), r.getLong(5))).toMap
    assert(m === Map(0L -> (("A", 2L)), 1L -> (("B", 1L))),
      s"NULL-ts snapshot split a version: $m")
  }

  test("exactly one current version per key") {
    val cur = Scd2.history(snaps, "k", "ts", "tie", Seq("attr"))
      .where($"is_current").groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cur === Map(1L -> 1L, 2L -> 1L))
  }
}
