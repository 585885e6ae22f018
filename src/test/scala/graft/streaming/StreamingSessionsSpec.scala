package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Sessionize
import StreamingSessions.{ClosedSession, SessionEvent}

/** Streaming sessions == batch [[Sessionize.sessionStats]] on replayed
  * input; gap-split inside a batch; timeout close via watermark.
  */
class StreamingSessionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val GapUs = 30L * 60 * 1000000 // 30 min

  private val fixture = Seq(
    SessionEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view", 1.00),
    SessionEvent(2L, 1L, ts("2026-03-01 09:10:00"), "purchase", 2.50),
    SessionEvent(3L, 1L, ts("2026-03-01 09:40:00"), "view", 0.75),   // gap 30m == threshold: same session
    SessionEvent(4L, 1L, ts("2026-03-01 11:00:00"), "purchase", 4.00), // gap 80m: new session
    SessionEvent(5L, 2L, ts("2026-03-01 09:05:00"), "click", 1.25))

  test("replayed fixture: streaming sessions == batch sessionStats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val out = StreamingSessions.sessions(
      mem.toDS().withWatermark("ts", "10 minutes"), GapUs)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(fixture: _*)
    q.processAllAvailable()
    // push event time far past every end+gap so open sessions time out
    mem.addData(SessionEvent(99L, 9L, ts("2026-03-02 12:00:00"), "view", 0.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(100L, 9L, ts("2026-03-02 13:00:00"), "view", 0.0))
    q.processAllAvailable()

    val streamed = spark.table("sess").as[ClosedSession].collect()
      .filter(_.user_id != 9L)
      .map(s => (s.user_id, s.session_seq) ->
        (s.start_us, s.end_us, s.n_events, s.n_purchases, s.value_cents))
      .toMap
    q.stop()

    val batch = Sessionize.sessionStats(
      fixture.toDF(), "user_id", "ts", "event_id", GapUs,
      aggs = Seq(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("value_cents")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

    assert(streamed === batch)
    assert(batch.size === 3) // user1 x2 sessions, user2 x1
  }

  test("in-batch gap split emits the closed session immediately") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val out = StreamingSessions.sessions(
      mem.toDS().withWatermark("ts", "10 minutes"), GapUs)
    val q = out.writeStream.format("memory").queryName("sess2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // both sessions of user 1 arrive in ONE micro-batch, out of order —
    // the fold must sort by (ts, event_id) before splitting
    mem.addData(
      SessionEvent(4L, 1L, ts("2026-03-01 11:00:00"), "view", 1.0),
      SessionEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view", 2.0))
    q.processAllAvailable()

    val got = spark.table("sess2").as[ClosedSession].collect()
    q.stop()
    assert(got.length === 1) // first session closed by the second's start
    assert(got.head.session_seq === 0L)
    assert(got.head.n_events === 1L)
    assert(got.head.value_cents === 200L) // the 09:00 event, despite arrival order
  }

  test("negative half-cent values round HALF_UP like the batch round()") {
    // -0.125 * 100 = -12.5 exactly: math.round gives -12 (half toward
    // +inf) but Spark round() gives -13 (away from zero) — streaming
    // must match batch (round-6 advice item 2).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      SessionEvent(1L, 1L, ts("2026-03-01 09:00:00"), "refund", -0.125),
      SessionEvent(2L, 1L, ts("2026-03-01 09:01:00"), "view", 0.125))
    val mem = MemoryStream[SessionEvent]
    val q = StreamingSessions.sessions(
      mem.toDS().withWatermark("ts", "10 minutes"), GapUs)
      .writeStream.format("memory").queryName("sess_neg")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(SessionEvent(90L, 9L, ts("2026-03-02 12:00:00"), "view", 0.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(91L, 9L, ts("2026-03-02 13:00:00"), "view", 0.0))
    q.processAllAvailable()
    val streamedCents = spark.table("sess_neg").as[ClosedSession].collect()
      .filter(_.user_id == 1L).map(_.value_cents).sum
    q.stop()
    val batchCents = Sessionize.sessionStats(
      events.toDF(), "user_id", "ts", "event_id", GapUs,
      aggs = Seq(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(round(col("value") * 100).cast("long")).as("value_cents")))
      .collect().map(_.getLong(6)).sum
    assert(streamedCents === batchCents)
    assert(streamedCents === 0L) // -13 + 13: both halves rounded away from zero
  }

  test("timeout-closed session does not reset numbering: returning user continues the sequence") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionEvent]
    val q = StreamingSessions.sessions(
      mem.toDS().withWatermark("ts", "10 minutes"), GapUs)
      .writeStream.format("memory").queryName("sess3")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // session 0 for user 1, then advance the watermark far past
    // end+gap via another user so it closes by TIMEOUT
    mem.addData(SessionEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view", 1.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(90L, 9L, ts("2026-03-01 12:00:00"), "view", 0.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(91L, 9L, ts("2026-03-01 13:00:00"), "view", 0.0))
    q.processAllAvailable()
    // user 1 returns -> must open session_seq 1, NOT 0
    mem.addData(SessionEvent(2L, 1L, ts("2026-03-01 14:00:00"), "view", 2.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(92L, 9L, ts("2026-03-02 09:00:00"), "view", 0.0))
    q.processAllAvailable()
    mem.addData(SessionEvent(93L, 9L, ts("2026-03-02 10:00:00"), "view", 0.0))
    q.processAllAvailable()

    val got = spark.table("sess3").as[ClosedSession].collect()
      .filter(_.user_id == 1L).map(s => s.session_seq -> s.n_events).toMap
    q.stop()
    assert(got === Map(0L -> 1L, 1L -> 1L),
      s"expected sessions 0 and 1 for the returning user, got $got")
  }
}
