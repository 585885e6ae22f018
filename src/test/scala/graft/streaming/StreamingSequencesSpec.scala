package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.Sequences
import StreamingSequences.SeqEvent

/** Online sequence-example assembly ([[StreamingSequences]]): batch
  * parity on a replayed fixture, state carried across micro-batches,
  * and the intra-batch (ts, event_id) fold order.
  */
class StreamingSequencesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    SeqEvent(1L, 1L, ts("2026-03-01 09:00:00"), "view"),
    SeqEvent(2L, 1L, ts("2026-03-01 09:01:00"), "click"),
    SeqEvent(4L, 1L, ts("2026-03-01 09:02:00"), "purchase"), // tie with 3
    SeqEvent(3L, 1L, ts("2026-03-01 09:02:00"), "signup"),
    SeqEvent(5L, 1L, ts("2026-03-01 09:03:00"), "error"),
    SeqEvent(6L, 2L, ts("2026-03-01 09:00:00"), "view"),
    SeqEvent(7L, 2L, ts("2026-03-01 09:01:00"), "click"))

  private def collectStream(batches: Seq[Seq[SeqEvent]], window: Int,
      name: String): Map[Long, (Long, String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SeqEvent]
    val out = StreamingSequences.examples(
      mem.toDS().withWatermark("ts", "10 minutes"), window)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("pos"), r.getAs[String]("context"),
          r.getAs[String]("label")))
      .toMap
    q.stop()
    rows
  }

  private def batchRows(window: Int): Map[Long, (Long, String, String)] = {
    import spark.implicits._
    Sequences.nextEventExamples(
      fixture.toDF("event_id", "user_id", "ts", "event_type")
        .select("user_id", "event_id", "ts", "event_type"),
      window).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("pos"), r.getAs[String]("context"),
          r.getAs[String]("label")))
      .toMap
  }

  test("single-batch replay == batch operator (ties folded by event_id)") {
    assert(collectStream(Seq(fixture), window = 2, "seq1") === batchRows(2))
  }

  test("state carries across micro-batches: split mid-user, same rows") {
    // user 1's history split across three batches IN EVENT-TIME ORDER
    // (the documented parity regime); user 2 rides along in batch 2
    val batches = Seq(
      fixture.take(2), // events 1,2
      Seq(fixture(2), fixture(3), fixture(5)), // 4,3 (tie), 6
      Seq(fixture(4), fixture(6))) // 5, 7
    assert(collectStream(batches, window = 2, "seq2") === batchRows(2))
  }

  test("a user with <= window events emits nothing; late key starts fresh") {
    val rows = collectStream(Seq(fixture), window = 4, "seq3")
    // only user 1's 5th event has 4 predecessors
    assert(rows.keySet === Set(5L))
    assert(rows(5L) === ((5L, "view click signup purchase", "error")))
  }
}
