package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

/** Autoregressive example assembly ([[Sequences.nextEventExamples]]):
  * hand-folded expectations, (ts, event_id) tie-breaks, the
  * fixed-length-context filter, and partitioning invariance.
  */
class SequencesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: five events, two with EQUAL timestamps (ids 3,4 decide);
  // user 2: exactly `window` events => contributes nothing at W=2
  private lazy val events = Seq(
    (1L, 1L, ts("2026-03-01 09:00:00"), "view"),
    (2L, 1L, ts("2026-03-01 09:01:00"), "click"),
    (4L, 1L, ts("2026-03-01 09:02:00"), "purchase"), // tie: id 3 < 4
    (3L, 1L, ts("2026-03-01 09:02:00"), "signup"),
    (5L, 1L, ts("2026-03-01 09:03:00"), "error"),
    (6L, 2L, ts("2026-03-01 09:00:00"), "view"),
    (7L, 2L, ts("2026-03-01 09:01:00"), "click"))
    .toDF("event_id", "user_id", "ts", "event_type")

  test("contexts are the previous W types, oldest first, ties by event_id") {
    val out = Sequences.nextEventExamples(events, window = 2).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("pos"), r.getAs[String]("context"), r.getAs[String]("label")))
      .toMap
    // user 1 order: 1(view) 2(click) 3(signup) 4(purchase) 5(error)
    assert(out === Map(
      3L -> (3L, "view click", "signup"),
      4L -> (4L, "click signup", "purchase"),
      5L -> (5L, "signup purchase", "error")))
  }

  test("users with <= window events emit nothing; window=4 empties user 1 too") {
    val w2 = Sequences.nextEventExamples(events, window = 2)
    assert(w2.where("user_id = 2").count() === 0)
    assert(Sequences.nextEventExamples(events, window = 4)
      .where("user_id = 1").count() === 1) // only pos 5 has 4 predecessors
    assert(Sequences.nextEventExamples(events, window = 5).count() === 0)
  }

  test("output is invariant under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Sequences.nextEventExamples(d, window = 2).collect()
        .map(_.toSeq).toSet
    assert(run(events) === run(events.repartition(7)))
  }
}
