package graft.streaming

import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import StreamingGapFill.SeriesObs

/** Streaming gap-fill: accumulated emissions == the batch
  * [[graft.operators.Resample.gapFillDaily]] grid; state carries
  * across micro-batches; late duplicates drop.
  */
class StreamingGapFillSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("cross-batch fill: gaps close retroactively at the next observation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SeriesObs]
    val q = StreamingGapFill.locfFilled(mem.toDS())
      .writeStream.format("memory").queryName("gf1")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      // batch 1: A@1=10, A@3=30 (in-batch gap), B@2=2
      mem.addData(SeriesObs(1L, d("2026-01-03"), 30.0), // out of order in batch
        SeriesObs(1L, d("2026-01-01"), 10.0),
        SeriesObs(2L, d("2026-01-02"), 2.0))
      q.processAllAvailable()
      // batch 2: A@6=60 (cross-batch gap from state), plus a LATE
      // duplicate A@2 that must drop (at-or-before lastDay=3? no —
      // before day 6 arrives the state is day 3; 2 < 3 drops)
      mem.addData(SeriesObs(1L, d("2026-01-02"), 999.0),
        SeriesObs(1L, d("2026-01-06"), 60.0))
      q.processAllAvailable()
      val got = spark.table("gf1").collect()
        .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
        .toSet
      assert(got === Set(
        (1L, "2026-01-01", 10.0), (1L, "2026-01-02", 10.0),
        (1L, "2026-01-03", 30.0), (1L, "2026-01-04", 30.0),
        (1L, "2026-01-05", 30.0), (1L, "2026-01-06", 60.0),
        (2L, "2026-01-02", 2.0)),
        s"late duplicate leaked or a gap day is missing: $got")
    } finally q.stop()
  }

  test("interp mode: gap days slope toward the arriving observation, cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SeriesObs]
    val q = StreamingGapFill.interpFilled(mem.toDS())
      .writeStream.format("memory").queryName("gf2")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObs(1L, d("2026-01-01"), 10.0))
      q.processAllAvailable()
      // arrival at day 4 retroactively interpolates days 2 and 3 —
      // the forward anchor IS the arriving row, so no extra state
      mem.addData(SeriesObs(1L, d("2026-01-04"), 40.0))
      q.processAllAvailable()
      val got = spark.table("gf2").collect()
        .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2026-01-01", 10.0), ("2026-01-02", 20.0),
        ("2026-01-03", 30.0), ("2026-01-04", 40.0)))
    } finally q.stop()
  }

  test("bfill mode: gap days take the arriving value, cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SeriesObs]
    val q = StreamingGapFill.bfillFilled(mem.toDS())
      .writeStream.format("memory").queryName("gf3")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObs(1L, d("2026-01-01"), 10.0))
      q.processAllAvailable()
      mem.addData(SeriesObs(1L, d("2026-01-04"), 40.0))
      q.processAllAvailable()
      val got = spark.table("gf3").collect()
        .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2026-01-01", 10.0), ("2026-01-02", 40.0),
        ("2026-01-03", 40.0), ("2026-01-04", 40.0)))
    } finally q.stop()
  }

  test("hour grain: gaps close at the fixed step, cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingGapFill.SeriesObsTs
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SeriesObsTs]
    val q = StreamingGapFill.locfFilledAtGrain(mem.toDS())
      .writeStream.format("memory").queryName("gf6")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObsTs(1L, ts("2026-01-01 00:00:00"), 10.0))
      q.processAllAvailable()
      mem.addData(SeriesObsTs(1L, ts("2026-01-01 03:00:00"), 40.0))
      q.processAllAvailable()
      val got = spark.table("gf6").collect()
        .map(r => (r.getTimestamp(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2026-01-01 00:00:00.0", 10.0), ("2026-01-01 01:00:00.0", 10.0),
        ("2026-01-01 02:00:00.0", 10.0), ("2026-01-01 03:00:00.0", 40.0)))
    } finally q.stop()
  }

  test("month grain: calendar-step gaps close cross-batch; interp is real-day linear") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SeriesObs]
    val q = StreamingGapFill.locfFilledAtMonth(mem.toDS())
      .writeStream.format("memory").queryName("gf7")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObs(1L, d("2025-11-01"), 10.0))
      q.processAllAvailable()
      // cross-batch arrival 4 months on: Dec/Jan/Feb fill at 10.0 —
      // calendar stepping must land exactly on month STARTS across
      // the year boundary and unequal month lengths
      mem.addData(SeriesObs(1L, d("2026-03-01"), 50.0))
      q.processAllAvailable()
      val got = spark.table("gf7").collect()
        .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2025-11-01", 10.0), ("2025-12-01", 10.0),
        ("2026-01-01", 10.0), ("2026-02-01", 10.0),
        ("2026-03-01", 50.0)))
    } finally q.stop()

    val mem2 = MemoryStream[SeriesObs]
    val q2 = StreamingGapFill.interpFilledAtMonth(mem2.toDS())
      .writeStream.format("memory").queryName("gf8")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      // Jan→Apr: gap months interpolate in REAL days (31/90, 59/90),
      // not month ordinals (1/3, 2/3) — the p150 batch semantics
      mem2.addData(SeriesObs(1L, d("2026-01-01"), 0.0))
      q2.processAllAvailable()
      mem2.addData(SeriesObs(1L, d("2026-04-01"), 90.0))
      q2.processAllAvailable()
      val got = spark.table("gf8").collect()
        .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2026-01-01", 0.0), ("2026-02-01", 31.0),
        ("2026-03-01", 59.0), ("2026-04-01", 90.0)),
        s"interp must be linear in days, got $got")
    } finally q2.stop()

    val mem3 = MemoryStream[SeriesObs]
    val q3 = StreamingGapFill.bfillFilledAtMonth(mem3.toDS())
      .writeStream.format("memory").queryName("gf8b")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem3.addData(SeriesObs(1L, d("2026-01-01"), 10.0))
      q3.processAllAvailable()
      mem3.addData(SeriesObs(1L, d("2026-04-01"), 40.0))
      q3.processAllAvailable()
      val got = spark.table("gf8b").collect()
        .map(r => (r.getDate(1).toString, r.getDouble(2))).toSet
      assert(got === Set(
        ("2026-01-01", 10.0), ("2026-02-01", 40.0),
        ("2026-03-01", 40.0), ("2026-04-01", 40.0)))
    } finally q3.stop()
  }

  test("maxGapBuckets trips loudly instead of buffering an unbounded gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import StreamingGapFill.SeriesObsTs
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[SeriesObsTs]
    val q = StreamingGapFill.locfFilledAtGrain(mem.toDS(), maxGapBuckets = 10)
      .writeStream.format("memory").queryName("gf9")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObsTs(1L, ts("2026-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      // 24h later = 23 gap buckets > 10: the batch must FAIL with the
      // bound in the message, not buffer the gap silently
      mem.addData(SeriesObsTs(1L, ts("2026-01-02 00:00:00"), 2.0))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
      assert(msgs(ex).exists(m => m != null && m.contains("maxGapBuckets")),
        s"gap-bound trip must name maxGapBuckets: $ex")
    } finally q.stop()
  }

  test("ordering-contract drops are durably counted; strict mode fails the batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("gapfillDrops")
    val mem = MemoryStream[SeriesObs]
    val q = StreamingGapFill.locfFilled(mem.toDS(), dropCounter = Some(acc))
      .writeStream.format("memory").queryName("gf4")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem.addData(SeriesObs(1L, d("2026-01-05"), 50.0))
      q.processAllAvailable()
      // two contract violations: a day strictly before and a duplicate
      mem.addData(SeriesObs(1L, d("2026-01-03"), 30.0),
        SeriesObs(1L, d("2026-01-05"), 99.0))
      q.processAllAvailable()
      assert(acc.value === 2L,
        s"drops must surface through the accumulator, got ${acc.value}")
      assert(spark.table("gf4").count() === 1L)
    } finally q.stop()

    val mem2 = MemoryStream[SeriesObs]
    val q2 = StreamingGapFill.locfFilled(mem2.toDS(), strict = true)
      .writeStream.format("memory").queryName("gf5")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    try {
      mem2.addData(SeriesObs(1L, d("2026-01-05"), 50.0))
      q2.processAllAvailable()
      mem2.addData(SeriesObs(1L, d("2026-01-03"), 30.0))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      assert(ex.getMessage.contains("time-ordered") ||
        Option(ex.getCause).exists(_.getMessage.contains("time-ordered")),
        s"strict mode must fail the batch with the contract message: $ex")
    } finally q2.stop()
  }
}
