package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.Fixtures
import graft.sources.Bronze

case class Tick(item_id: Long, created_at: Timestamp, unit_price: Long, quantity: Long)

class StreamingSilverSpec extends SparkSpec {

  test("bronze file stream -> silver parquet, date derived from path") {
    val root = Files.createTempDirectory("graft-stream").toString
    val bronze = new Bronze(s"$root/bronze")
    bronze.saveJson(java.time.LocalDate.parse("2026-02-13"), Fixtures.day1Json)
    bronze.saveJson(java.time.LocalDate.parse("2026-02-14"), Fixtures.day2Json)

    val q = StreamingSilver.writeSilver(
      StreamingSilver.silverStream(spark, s"$root/bronze"),
      path = s"$root/silver",
      checkpoint = s"$root/ckpt")
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$root/silver")
    assert(out.count() === 9) // 6 + 3 (streaming = raw explode; dedup downstream)
    assert(out.where("snapshot_date = DATE'2026-02-13'").count() === 6)
    assert(out.where("snapshot_date = DATE'2026-02-14'").count() === 3)
    // normalization ran: derived unit price present
    assert(out.where("id = 1006 AND unit_price = 249").count() === 1)
  }

  test("malformed bronze dir (non-date) fails the batch loudly, not null dates") {
    val root = Files.createTempDirectory("graft-stream-bad").toString
    // matches the source glob (*/raw_auctions_*.json) but violates the
    // {yyyy-MM-dd} dir contract
    val badDir = java.nio.file.Paths.get(root, "bronze", "not-a-date")
    Files.createDirectories(badDir)
    Files.writeString(badDir.resolve("raw_auctions_x.json"), Fixtures.day1Json)

    val q = StreamingSilver.writeSilver(
      StreamingSilver.silverStream(spark, s"$root/bronze"),
      path = s"$root/silver",
      checkpoint = s"$root/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("violates")), ex.toString)
  }

  test("firstSeenStream: duplicate ids within the watermark are dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Tick]
    // reuse Tick: item_id stands in for the auction id here
    val q = StreamingSilver.firstSeenStream(
      mem.toDF().withColumnRenamed("item_id", "id"), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("fs_test")
      .outputMode("append").start()
    def ts(s: String) = Timestamp.valueOf(s)
    mem.addData(
      Tick(10L, ts("2026-01-01 10:00:00"), 100L, 1L),
      Tick(10L, ts("2026-01-01 10:05:00"), 200L, 1L), // dup id -> dropped
      Tick(11L, ts("2026-01-01 10:10:00"), 300L, 1L))
    q.processAllAvailable()
    mem.addData(Tick(10L, ts("2026-01-01 10:20:00"), 400L, 1L)) // still dup
    q.processAllAvailable()
    val out = spark.table("fs_test").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("id")).sorted.toSeq === Seq(10L, 11L))
    // first occurrence won (price 100, not 200/400)
    assert(out.find(_.getAs[Long]("id") == 10L).get.getAs[Long]("unit_price") === 100L)
  }

  test("streaming hourly OHLC with watermark emits closed windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Tick]
    val q = StreamingSilver.streamingPriceHistory(mem.toDF())
      .writeStream.format("memory").queryName("ohlc_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    def ts(s: String) = Timestamp.valueOf(s)
    mem.addData(
      Tick(1L, ts("2026-01-01 10:00:00"), 100L, 1L),
      Tick(1L, ts("2026-01-01 10:30:00"), 120L, 2L),
      Tick(1L, ts("2026-01-01 10:59:00"), 90L, 1L))
    q.processAllAvailable()
    // advance watermark far past the 10:00 window (delay 2h)
    mem.addData(Tick(1L, ts("2026-01-01 14:00:00"), 50L, 1L))
    q.processAllAvailable()

    val out = spark.table("ohlc_test").collect()
    q.stop()
    assert(out.length === 1) // only the closed 10:00 window emitted
    val r = out.head
    assert(r.getAs[Timestamp]("snapshot_hour") === ts("2026-01-01 10:00:00"))
    assert(r.getAs[Double]("open_price") === 100.0)
    assert(r.getAs[Double]("close_price") === 90.0)
    assert(r.getAs[Long]("high_price") === 120L)
    assert(r.getAs[Long]("low_price") === 90L)
    assert(r.getAs[Long]("volume") === 4L)
  }
}
