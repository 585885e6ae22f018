package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import ListingLifetimes.{Disappearance, ListingEvent}

class ListingLifetimesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("listing unseen past the event-time gap emits one disappearance") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[ListingEvent]
    val out = ListingLifetimes.disappearances(
      mem.toDS().withWatermark("created_at", "1 hour"), gapHours = 36)
    val q = out.writeStream.format("memory").queryName("lifetimes")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // day 1: listings 1 and 2; day 2: only listing 2 survives
    mem.addData(
      ListingEvent(1L, 10L, 5L, ts("2026-03-01 09:00:00")),
      ListingEvent(2L, 10L, 3L, ts("2026-03-01 09:00:00")))
    q.processAllAvailable()
    mem.addData(ListingEvent(2L, 10L, 3L, ts("2026-03-02 09:00:00")))
    q.processAllAvailable()
    // advance event time far past listing 1's (day1 + 36h) timeout;
    // listing 2's last_seen + 36h is still ahead of the watermark
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-03 12:00:00")))
    q.processAllAvailable()
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-03 13:00:00")))
    q.processAllAvailable()

    val got = spark.table("lifetimes").as[Disappearance].collect()
    q.stop()
    assert(got.map(_.id).toSeq === Seq(1L))
    val d = got.head
    assert(d.item_id === 10L)
    assert(d.quantity === 5L)
    assert(d.first_seen === ts("2026-03-01 09:00:00"))
    assert(d.last_seen === ts("2026-03-01 09:00:00"))
  }

  test("re-observation inside the gap extends the listing's life") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[ListingEvent]
    val out = ListingLifetimes.disappearances(
      mem.toDS().withWatermark("created_at", "1 hour"), gapHours = 36)
    val q = out.writeStream.format("memory").queryName("lifetimes2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(ListingEvent(1L, 10L, 5L, ts("2026-03-01 09:00:00")))
    q.processAllAvailable()
    // seen again a day later -> timeout pushed to 03-02 09:00 + 36h
    mem.addData(ListingEvent(1L, 10L, 4L, ts("2026-03-02 09:00:00")))
    q.processAllAvailable()
    // watermark to 03-02 12:00 (would have fired the ORIGINAL timeout)
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-02 13:00:00")))
    q.processAllAvailable()
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-02 14:00:00")))
    q.processAllAvailable()
    assert(spark.table("lifetimes2").count() === 0) // still alive

    // now past the extended timeout: disappearance carries the
    // LATEST quantity and the full first/last span
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-04 09:00:00")))
    q.processAllAvailable()
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-04 10:00:00")))
    q.processAllAvailable()
    val got = spark.table("lifetimes2").as[Disappearance].collect()
    q.stop()
    assert(got.map(_.id).toSeq === Seq(1L))
    assert(got.head.quantity === 4L)
    assert(got.head.first_seen === ts("2026-03-01 09:00:00"))
    assert(got.head.last_seen === ts("2026-03-02 09:00:00"))
  }

  test("quantity follows max event time, not intra-batch iterator order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[ListingEvent]
    val out = ListingLifetimes.disappearances(
      mem.toDS().withWatermark("created_at", "1 hour"), gapHours = 36)
    val q = out.writeStream.format("memory").queryName("lifetimes3")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // backfill shape: several snapshots of ONE listing in ONE
    // micro-batch, added newest-first so naive last-event-wins logic
    // would emit the stalest quantity
    mem.addData(
      ListingEvent(1L, 10L, 7L, ts("2026-03-02 09:00:00")), // newest, qty 7
      ListingEvent(1L, 10L, 9L, ts("2026-03-01 15:00:00")),
      ListingEvent(1L, 10L, 5L, ts("2026-03-01 09:00:00"))) // oldest
    q.processAllAvailable()
    // advance the watermark far past last_seen + 36h to flush it out
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-05 09:00:00")))
    q.processAllAvailable()
    mem.addData(ListingEvent(99L, 11L, 1L, ts("2026-03-05 10:00:00")))
    q.processAllAvailable()

    val got = spark.table("lifetimes3").as[Disappearance].collect()
    q.stop()
    assert(got.map(_.id).toSeq === Seq(1L))
    assert(got.head.quantity === 7L) // the 03-02 snapshot's quantity
    assert(got.head.first_seen === ts("2026-03-01 09:00:00"))
    assert(got.head.last_seen === ts("2026-03-02 09:00:00"))
  }
}
