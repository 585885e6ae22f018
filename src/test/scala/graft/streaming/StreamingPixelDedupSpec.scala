package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.Multimodal

/** [[StreamingPixelDedup]] — online content dedup through the codec:
  * cross-format first-wins, deterministic claimant, cross-batch state
  * denial, quarantine isolation.
  */
class StreamingPixelDedupSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  private case class M(media_id: Long, payload: Array[Byte],
      ingested_at: Timestamp)

  test("first decoded content wins across containers; later batches denied by state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[M]
    val q = StreamingPixelDedup.keepers(mem.toDF())
      .writeStream.format("memory").queryName("pix_keep")
      .outputMode("append").start()
    // batch 1: pattern A as PNG (id 2, earliest ts) + as BMP (id 5),
    // pattern B as BMP (id 3), one undecodable (id 9)
    mem.addData(
      M(5L, Multimodal.syntheticBmp(7L, 16, 12), ts(20)),
      M(2L, Multimodal.syntheticPng(7L, 16, 12), ts(10)),
      M(3L, Multimodal.syntheticBmp(8L, 16, 12), ts(15)),
      M(9L, "junk".getBytes, ts(12)))
    q.processAllAvailable()
    // batch 2: pattern A again (new id, PNG) — state denies the claim
    mem.addData(M(11L, Multimodal.syntheticPng(7L, 16, 12), ts(30)))
    q.processAllAvailable()
    val got = spark.table("pix_keep").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("keeper"), r.getAs[Boolean]("quarantined"))).toMap
    q.stop()
    assert(got(2L) === ((true, false)), "earliest (ts, id) claims the hash")
    assert(got(5L) === ((false, false)), "same pixels via BMP must drop")
    assert(got(3L) === ((true, false)), "distinct content keeps")
    assert(got(9L) === ((true, true)), "undecodable quarantines as keeper")
    assert(got(11L) === ((false, false)), "cross-batch state denies replays")
  }

  test("quarantined payloads never contest a hash (unique synthetic keys)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[M]
    val q = StreamingPixelDedup.keepers(mem.toDF())
      .writeStream.format("memory").queryName("pix_quar")
      .outputMode("append").start()
    mem.addData(
      M(1L, Array.empty[Byte], ts(1)),
      M(2L, "not an image".getBytes, ts(2)),
      M(3L, Multimodal.syntheticPng(1L, 8, 8), ts(3)))
    q.processAllAvailable()
    val got = spark.table("pix_quar").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("keeper"), r.getAs[Boolean]("quarantined"))).toMap
    q.stop()
    // both broken rows keep+flag independently; the real image keeps
    assert(got === Map(1L -> ((true, true)), 2L -> ((true, true)),
      3L -> ((true, false))))
  }
}
