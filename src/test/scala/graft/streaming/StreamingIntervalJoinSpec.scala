package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Native watermarked stream-stream interval join: pairs complete
  * ACROSS micro-batches through the symmetric-hash join state (the
  * part the single-batch st11 gate cannot see), out-of-window rows
  * never match, and rows behind the watermark horizon are dropped
  * rather than retro-matched (bounded state: this is the eviction
  * contract that keeps the join runnable on an unbounded stream).
  */
class StreamingIntervalJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-batch pair completion; out-of-gap and keyless rows never match") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vmem = MemoryStream[(Long, Long, Timestamp)]
    val pmem = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamingIntervalJoin.within(
      vmem.toDF().toDF("view_id", "v_user", "view_ts"),
      pmem.toDF().toDF("purchase_id", "p_user", "purchase_ts", "amount"),
      ("v_user", "p_user"), ("view_ts", "purchase_ts"),
      watermarkDelay = "1 hour", maxGap = "2 hours")
      .select("view_id", "purchase_id", "amount")
    val q = joined.writeStream.format("memory").queryName("sij1")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // batch 1: the view arrives alone — nothing can emit yet
    vmem.addData((1L, 7L, ts("2026-03-01 09:00:00")))
    q.processAllAvailable()
    assert(spark.table("sij1").count() === 0)

    // batch 2: an in-gap purchase completes the pair ACROSS batches
    // (the view is join STATE now, not input); an out-of-gap and a
    // keyless purchase must not match
    pmem.addData(
      (100L, 7L, ts("2026-03-01 09:30:00"), 5.0), // in (ts, ts+2h]
      (101L, 7L, ts("2026-03-01 11:30:00"), 6.0), // beyond the gap
      (102L, 8L, ts("2026-03-01 09:10:00"), 7.0)) // no view for user 8
    q.processAllAvailable()
    val pairs = spark.table("sij1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(pairs === Set((1L, 100L, 5.0)))
  }

  test("rows behind the watermark horizon are dropped, not retro-matched (bounded state)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vmem = MemoryStream[(Long, Long, Timestamp)]
    val pmem = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamingIntervalJoin.within(
      vmem.toDF().toDF("view_id", "v_user", "view_ts"),
      pmem.toDF().toDF("purchase_id", "p_user", "purchase_ts", "amount"),
      ("v_user", "p_user"), ("view_ts", "purchase_ts"),
      watermarkDelay = "1 hour", maxGap = "2 hours")
      .select("view_id", "purchase_id", "amount")
    val q = joined.writeStream.format("memory").queryName("sij2")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    vmem.addData((1L, 7L, ts("2026-03-01 09:00:00")))
    q.processAllAvailable()
    // advance the watermark far past the view's admissible window on
    // BOTH inputs — the global watermark is the MIN across them
    // (multipleWatermarkPolicy=min: an idle side holds it back, which
    // is itself the correctness-preserving default). After this batch
    // the horizon is 19:00; the 09:00 view's state is reclaimable
    // (eviction horizon = watermark - maxGap) and a 09:40 purchase is
    // itself behind the watermark — neither side may resurrect the
    // pair
    vmem.addData((2L, 9L, ts("2026-03-01 20:00:00")))
    pmem.addData((999L, 10L, ts("2026-03-01 20:00:00"), 1.0))
    q.processAllAvailable()
    pmem.addData((100L, 7L, ts("2026-03-01 09:40:00"), 5.0))
    q.processAllAvailable()
    val n = spark.table("sij2").count()
    q.stop()
    assert(n === 0, "late purchase retro-matched an evicted view")
  }

  test("left outer: matches emit like inner; unmatched views emit NULLs on eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vmem = MemoryStream[(Long, Long, Timestamp)]
    val pmem = MemoryStream[(Long, Long, Timestamp, Double)]
    val joined = StreamingIntervalJoin.withinLeftOuter(
      vmem.toDF().toDF("view_id", "v_user", "view_ts"),
      pmem.toDF().toDF("purchase_id", "p_user", "purchase_ts", "amount"),
      ("v_user", "p_user"), ("view_ts", "purchase_ts"),
      watermarkDelay = "0 seconds", maxGap = "2 hours")
      .select("view_id", "purchase_id", "amount")
    val q = joined.writeStream.format("memory").queryName("sij3")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    // view 1 converts; view 2 never will
    vmem.addData((1L, 7L, ts("2026-03-01 09:00:00")),
      (2L, 8L, ts("2026-03-01 09:00:00")))
    pmem.addData((100L, 7L, ts("2026-03-01 09:30:00"), 5.0))
    q.processAllAvailable()
    val afterMatch = spark.table("sij3").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    // the match emits in the completing batch; view 2's NULL row must
    // NOT have emitted yet — the watermark cannot prove no purchase
    // is coming
    assert(afterMatch === Set((1L, Some(100L))))

    // watermark two-step past view 2's horizon (11:00) on BOTH sides
    vmem.addData((3L, 9L, ts("2026-03-01 12:00:00")))
    pmem.addData((998L, 10L, ts("2026-03-01 12:00:00"), 1.0))
    q.processAllAvailable()
    vmem.addData((4L, 9L, ts("2026-03-01 13:00:00")))
    pmem.addData((999L, 10L, ts("2026-03-01 13:00:00"), 1.0))
    q.processAllAvailable()
    val rows = spark.table("sij3").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    q.stop()
    assert(rows(1L) === Some(100L))
    assert(rows.contains(2L) && rows(2L) === None,
      s"unmatched view must emit a NULL row on eviction: $rows")
  }
}
