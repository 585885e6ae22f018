package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class CohortsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: hand-computed matrix, cohort by FIRST activity") {
    val ev = Seq(
      // user 1: cohort Mar 1, returns day+1 and day+3
      (1L, ts("2026-03-01 10:00:00")),
      (1L, ts("2026-03-01 23:00:00")), // same-day repeat: one active row
      (1L, ts("2026-03-02 09:00:00")),
      (1L, ts("2026-03-04 09:00:00")),
      // user 2: cohort Mar 1, never returns
      (2L, ts("2026-03-01 12:00:00")),
      // user 3: cohort Mar 2, returns day+2
      (3L, ts("2026-03-02 08:00:00")),
      (3L, ts("2026-03-04 08:00:00")))
      .toDF("user_id", "ts")
    val got = Cohorts.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("2026-03-01", 0)) === ((2L, 2L, 1.0)))
    assert(got(("2026-03-01", 1)) === ((1L, 2L, 0.5)))
    assert(got(("2026-03-01", 3)) === ((1L, 2L, 0.5)))
    assert(!got.contains(("2026-03-01", 2)))
    // user 3 joined Mar 2 — their Mar 2 activity belongs to THEIR
    // cohort's offset 0, not cohort Mar 1's offset 1
    assert(got(("2026-03-02", 0)) === ((1L, 1L, 1.0)))
    assert(got(("2026-03-02", 2)) === ((1L, 1L, 1.0)))
    assert(got.size === 5)
  }

  test("retention: null users/timestamps drop; partitioning-invariant") {
    val ev = Seq(
      (Some(1L), Some(ts("2026-03-01 10:00:00"))),
      (None, Some(ts("2026-03-01 11:00:00"))),
      (Some(2L), None))
      .toDF("user_id", "ts")
    val got = Cohorts.retention(ev).collect()
    assert(got.length === 1 && got.head.getLong(2) === 1L)

    val big = (0L until 500L).flatMap(i => Seq(
      (i % 40, ts(f"2026-03-${1 + (i % 9).toInt}%02d 06:00:00"))))
      .toDF("user_id", "ts")
    val a = Cohorts.retention(big).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    val b = Cohorts.retention(big.repartition(17)).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
