package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Asof
import StreamingAsof.{AsofInput, Enriched}

/** Streaming as-of enrichment == batch [[Asof.joinAsOf]] on replayed
  * in-order input; state superseding across batches; unmatched
  * probes emit null enrichment.
  */
class StreamingAsofSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // states (quotes) and probes (trades) for two keys
  private val fixture = Seq(
    AsofInput(10L, 1L, ts("2026-03-01 09:00:00"), is_state = true, 100.0),
    AsofInput(11L, 1L, ts("2026-03-01 09:30:00"), is_state = true, 110.0),
    AsofInput(1L, 1L, ts("2026-03-01 09:15:00"), is_state = false, 0.0),
    AsofInput(2L, 1L, ts("2026-03-01 09:30:00"), is_state = false, 0.0), // exact tie -> state 11
    AsofInput(3L, 2L, ts("2026-03-01 09:10:00"), is_state = false, 0.0), // keyless state -> null
    AsofInput(20L, 2L, ts("2026-03-01 09:20:00"), is_state = true, 200.0),
    AsofInput(4L, 2L, ts("2026-03-01 09:40:00"), is_state = false, 0.0))

  test("replayed fixture: streaming enrichment == batch joinAsOf") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(
      mem.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("asof1")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    mem.addData(fixture: _*)
    q.processAllAvailable()
    val streamed = spark.table("asof1").as[Enriched].collect()
      .map(e => e.id -> (e.state_id.getOrElse(-1L),
        e.state_value.getOrElse(-1.0))).toMap
    q.stop()

    val probes = fixture.filter(!_.is_state)
      .map(e => (e.id, e.key, e.ts)).toDF("id", "key", "t")
    val states = fixture.filter(_.is_state)
      .map(e => (e.id, e.key, e.ts, e.value)).toDF("sid", "key", "t", "value")
    val batch = Asof.joinAsOf(probes, states, Seq("key"), "t", "t", "sid")
      .collect().map { r =>
        val sidIx = r.fieldIndex("right_sid")
        val valIx = r.fieldIndex("right_value")
        r.getLong(r.fieldIndex("id")) ->
          ((if (r.isNullAt(sidIx)) -1L else r.getLong(sidIx)),
           (if (r.isNullAt(valIx)) -1.0 else r.getDouble(valIx)))
      }.toMap

    assert(streamed === batch)
    assert(streamed(1L) === ((10L, 100.0)))
    assert(streamed(2L) === ((11L, 110.0))) // exact-time state counts
    assert(streamed(3L) === ((-1L, -1.0))) // no prior state
    assert(streamed(4L) === ((20L, 200.0)))
  }

  test("state supersedes across micro-batches; new probes bind the newest prior state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(
      mem.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("asof2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(AsofInput(10L, 1L, ts("2026-03-01 09:00:00"), is_state = true, 1.0))
    q.processAllAvailable()
    mem.addData(AsofInput(11L, 1L, ts("2026-03-01 10:00:00"), is_state = true, 2.0))
    q.processAllAvailable()
    // probe after both states -> newest wins, across batch boundaries
    mem.addData(AsofInput(1L, 1L, ts("2026-03-01 11:00:00"), is_state = false, 0.0))
    // probe between them (late but in-watermark) -> the OLD state
    mem.addData(AsofInput(2L, 1L, ts("2026-03-01 09:30:00"), is_state = false, 0.0))
    q.processAllAvailable()

    val got = spark.table("asof2").as[Enriched].collect()
      .map(e => e.id -> e.state_id.getOrElse(-1L)).toMap
    q.stop()
    assert(got(1L) === 11L)
    assert(got(2L) === 10L) // pre-watermark ring row still present
  }

  test("burst of states in one batch: probes bind the newest; keepStates cap holds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[AsofInput]
    val q = StreamingAsof.enrich(
      mem.toDS().withWatermark("ts", "10 minutes"), keepStates = 8)
      .writeStream.format("memory").queryName("asof3")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    // 100 states at second granularity + one probe after them all,
    // in ONE batch — the fold must survive the cap and still pick
    // the newest prior state
    val states = (1 to 100).map(i => AsofInput(
      100L + i, 1L, ts(f"2026-03-01 09:${i / 60}%02d:${i % 60}%02d"),
      is_state = true, i.toDouble))
    val probe = AsofInput(1L, 1L, ts("2026-03-01 10:00:00"),
      is_state = false, 0.0)
    mem.addData(states :+ probe: _*)
    q.processAllAvailable()
    val got = spark.table("asof3").as[Enriched].collect()
    q.stop()
    assert(got.length === 1)
    assert(got.head.state_id === Some(200L)) // the 100th (newest) state
    assert(got.head.state_value === Some(100.0))
  }
}
