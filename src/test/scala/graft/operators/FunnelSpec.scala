package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Funnel.analyze]]: step ordering strictness, window anchoring,
  * stalls, pre-step-1 events ignored, key isolation.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (key, time-us, type)
  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("k", "us", "et")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")

  private def run(df: org.apache.spark.sql.DataFrame,
      window: Option[Long] = Some(1000L)) =
    Funnel.analyze(df, "k", "t", "et", Seq("A", "B", "C"), window)
      .collect().map { r =>
        r.getLong(0) -> (
          (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)),
          r.getLong(4), r.getBoolean(5))
      }.toMap

  test("full conversion, stall, and never-started keys") {
    val m = run(ev(
      (1L, 0L, "A"), (1L, 10L, "B"), (1L, 20L, "C"), // converts
      (2L, 0L, "A"), (2L, 10L, "B"),                 // stalls at 2
      (3L, 5L, "B"), (3L, 6L, "C")))                 // never did A
    assert(m(1L) === ((Seq(0L, 10L, 20L), 3L, true)))
    assert(m(2L) === ((Seq(0L, 10L, -1L), 2L, false)))
    assert(!m.contains(3L)) // no step-1 -> no funnel row
  }

  test("steps before step 1 (or at the same instant) do not count") {
    val m = run(ev(
      (1L, 10L, "B"), (1L, 20L, "A"), (1L, 20L, "B"), (1L, 30L, "B"),
      (1L, 30L, "C")))
    // B at 10 precedes A; B at 20 is NOT strictly after A(20); the
    // B at 30 counts, and C at 30 is not strictly after B(30)
    assert(m(1L) === ((Seq(20L, 30L, -1L), 2L, false)))
  }

  test("conversion window anchors at step 1") {
    val m = run(ev(
      (1L, 0L, "A"), (1L, 500L, "B"), (1L, 1500L, "C"), // C outside 1000
      (2L, 0L, "A"), (2L, 999L, "B"), (2L, 1000L, "C"))) // C exactly at bound
    assert(m(1L) === ((Seq(0L, 500L, -1L), 2L, false)))
    assert(m(2L) === ((Seq(0L, 999L, 1000L), 3L, true)))
  }

  test("earliest qualifying time wins at every step") {
    val m = run(ev(
      (1L, 0L, "A"), (1L, 5L, "A"), // t1 = min(A)
      (1L, 3L, "B"), (1L, 8L, "B"), // both after t1: min = 3
      (1L, 4L, "C")))               // after B(3): converts at 4
    assert(m(1L) === ((Seq(0L, 3L, 4L), 3L, true)))
  }

  test("unbounded window converts late steps") {
    val m = run(ev((1L, 0L, "A"), (1L, 99999L, "B"), (1L, 999999L, "C")),
      window = None)
    assert(m(1L) === ((Seq(0L, 99999L, 999999L), 3L, true)))
  }
}
