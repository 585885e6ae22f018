package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sessionize]] on hand-built fixtures: gap splits, boundary
  * inclusivity (gap == threshold stays in-session), per-key
  * isolation, same-timestamp ties, stats aggregation.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (eid, user, time-us): user 1 has sessions {0,100,1100} and {5000},
  // with the 1000us gap exactly AT the threshold (inclusive — same
  // session) and the 3900us gap above it. user 2: one event.
  private def events = Seq(
    (1L, 1L, 0L),
    (2L, 1L, 100L),
    (3L, 1L, 1100L),   // gap 1000 == threshold -> same session
    (4L, 1L, 5000L),   // gap 3900 > threshold  -> new session
    (5L, 2L, 50L)
  ).toDF("eid", "user", "us")
    .withColumn("t", timestamp_micros(col("us"))).drop("us")

  test("gap == threshold stays in-session; gap > threshold splits") {
    val seqs = Sessionize.assignSessions(events, "user", "t", "eid", 1000L)
      .select(col("eid"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seqs === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("sessionStats aggregates per (key, session)") {
    val rows = Sessionize.sessionStats(events, "user", "t", "eid", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows((1L, 0L)) === ((0L, 1100L, 3L)))
    assert(rows((1L, 1L)) === ((5000L, 5000L, 1L)))
    assert(rows((2L, 0L)) === ((50L, 50L, 1L)))
  }

  test("same-timestamp events share a session and order by tie") {
    val dup = Seq((1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 2000L))
      .toDF("eid", "user", "us")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val seqs = Sessionize.assignSessions(dup, "user", "t", "eid", 500L)
      .select(col("eid"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seqs === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("a NULL-ts first event does not fake a session break for its successor") {
    // NULLs sort first: with prev.isNull break detection the 0us event
    // would misread itself as a NEW session start (round-6 advice 5) —
    // positional first-row detection keeps the numbering contiguous.
    val withNull = Seq(
      (1L, 1L, None: Option[Long]),
      (2L, 1L, Some(0L)),
      (3L, 1L, Some(100L)),
      (4L, 1L, Some(5000L))) // only this one opens a new session
      .toDF("eid", "user", "us")
      .withColumn("t", timestamp_micros(col("us"))).drop("us")
    val seqs = Sessionize.assignSessions(withNull, "user", "t", "eid", 1000L)
      .select(col("eid"), col("session_seq"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seqs === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L),
      s"NULL-ts event split the numbering: $seqs")
  }

  test("partitioning-invariant session numbering") {
    val a = Sessionize.assignSessions(events, "user", "t", "eid", 1000L)
      .select("eid", "session_seq").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sessionize.assignSessions(events.repartition(4), "user", "t", "eid", 1000L)
      .select("eid", "session_seq").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("one exchange + one sort feed both the lag and the running sum") {
    val plan = Sessionize.assignSessions(events, "user", "t", "eid", 1000L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    val sorts = plan.linesIterator.count(_.trim.matches("^[+:-]*\\s*Sort \\[.*"))
    assert(exchanges === 1, s"expected one Exchange, plan:\n$plan")
    assert(sorts === 1, s"expected one Sort, plan:\n$plan")
  }
}
