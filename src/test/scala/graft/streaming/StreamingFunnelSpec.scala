package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Funnel
import StreamingFunnel.{FunnelEvent, FunnelResult}

/** Streaming funnel == batch [[Funnel.analyze]] on replayed input;
  * conversion emits immediately and frees state; window expiry
  * emits the stalled row.
  */
class StreamingFunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Steps = Seq("view", "click", "purchase")
  private val DayUs = 86400000000L

  private val fixture = Seq(
    // user 1 converts; user 2 stalls at click; user 3 never views
    FunnelEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view"),
    FunnelEvent(2L, 1L, ts("2026-03-01 09:05:00"), "click"),
    FunnelEvent(3L, 1L, ts("2026-03-01 09:10:00"), "purchase"),
    FunnelEvent(4L, 2L, ts("2026-03-01 09:00:00"), "view"),
    FunnelEvent(5L, 2L, ts("2026-03-01 09:30:00"), "click"),
    FunnelEvent(6L, 3L, ts("2026-03-01 09:00:00"), "purchase"))

  test("replayed fixture: streaming results == batch Funnel.analyze") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.analyze(
      mem.toDS().withWatermark("ts", "10 minutes"), Steps, DayUs)
      .writeStream.format("memory").queryName("fun1")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(fixture: _*)
    q.processAllAvailable()
    // advance event time past every open window so stalls flush
    mem.addData(FunnelEvent(90L, 9L, ts("2026-03-03 09:00:00"), "view"))
    q.processAllAvailable()
    mem.addData(FunnelEvent(91L, 9L, ts("2026-03-05 09:00:00"), "other"))
    q.processAllAvailable()

    val streamed = spark.table("fun1").as[FunnelResult].collect()
      .filter(_.key != 9L)
      .map(r => r.key -> (r.furthest_step, r.converted)).toMap
    q.stop()

    val batch = Funnel.analyze(
      fixture.map(e => (e.event_id, e.key, e.ts, e.event_type))
        .toDF("event_id", "key", "t", "et"),
      "key", "t", "et", Steps, Some(DayUs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("furthest_step")),
          r.getBoolean(r.fieldIndex("converted")))).toMap

    assert(streamed === batch)
    assert(streamed === Map(1L -> ((3L, true)), 2L -> ((2L, false))))
  }

  test("conversion emits immediately without waiting for the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.analyze(
      mem.toDS().withWatermark("ts", "10 minutes"), Steps, DayUs)
      .writeStream.format("memory").queryName("fun2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(
      FunnelEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view"),
      FunnelEvent(2L, 1L, ts("2026-03-01 09:01:00"), "click"),
      FunnelEvent(3L, 1L, ts("2026-03-01 09:02:00"), "purchase"))
    q.processAllAvailable()
    val got = spark.table("fun2").as[FunnelResult].collect()
    q.stop()
    assert(got.length === 1)
    assert(got.head.converted)
    assert(got.head.step_times_us.length === 3)
  }

  test("lifecycle: default restarts per attempt; oncePerKey never re-emits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def run(once: Boolean, name: String): Map[Long, Long] = {
      val mem = MemoryStream[FunnelEvent]
      val q = StreamingFunnel.analyze(
        mem.toDS().withWatermark("ts", "10 minutes"), Steps, 3600000000L,
        oncePerKey = once)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
      // attempt 1: view only, expires
      mem.addData(FunnelEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(FunnelEvent(90L, 9L, ts("2026-03-01 12:00:00"), "view"))
      q.processAllAvailable()
      mem.addData(FunnelEvent(91L, 9L, ts("2026-03-01 13:00:00"), "other"))
      q.processAllAvailable()
      // attempt 2: full conversion after the first window expired
      mem.addData(
        FunnelEvent(2L, 1L, ts("2026-03-01 14:00:00"), "view"),
        FunnelEvent(3L, 1L, ts("2026-03-01 14:01:00"), "click"),
        FunnelEvent(4L, 1L, ts("2026-03-01 14:02:00"), "purchase"))
      q.processAllAvailable()
      val rows = spark.table(name).as[FunnelResult].collect()
        .filter(_.key == 1L)
      q.stop()
      rows.groupBy(_.furthest_step).map { case (k, v) => k -> v.length.toLong }
    }
    // default: expired attempt (furthest 1) AND the new converting
    // attempt (furthest 3) both emit
    assert(run(once = false, "funA") === Map(1L -> 1L, 3L -> 1L))
    // oncePerKey: only the first attempt's expiry row, ever — strict
    // parity with single-shot batch analyze
    assert(run(once = true, "funB") === Map(1L -> 1L))
  }
}
