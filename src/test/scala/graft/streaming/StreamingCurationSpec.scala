package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

case class Doc(doc_id: Long, text: String, ingested_at: Timestamp)

class StreamingCurationSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // passes the 0.5 quality bar: long enough, stopworded, alphabetic
  private val goodText =
    "the quick brown fox jumps over the lazy dog and the cat is in the " +
      "house with all of the other animals that live in this big place"

  test("curate: quality filter + watermark-bounded fingerprint dedup + lang tag") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamingCuration.curate(mem.toDF())
      .select("doc_id", "predicted_lang")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(
      Doc(1L, goodText, ts("2026-05-01 10:00:00")),
      Doc(2L, "x 1 2 3", ts("2026-05-01 10:00:00")), // junk: filtered
      Doc(3L, "  " + goodText.toUpperCase + "  ", ts("2026-05-01 11:00:00"))) // canonical dup of 1
    q.processAllAvailable()
    mem.addData(Doc(4L, goodText + " but this one differs at the end",
      ts("2026-05-01 12:00:00")))
    q.processAllAvailable()

    val got = spark.table("curated").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
    q.stop()
    // junk gone, canonical dup gone, the two distinct good docs kept
    assert(got.map(_._1).sorted.toSeq === Seq(1L, 4L))
    assert(got.forall(_._2 == "en"))
  }

  test("corpusStats: closed windows emit integral per-language stats once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamingCuration.corpusStats(
      StreamingCuration.curate(mem.toDF(), watermarkDelay = "30 minutes"))
      .writeStream.format("memory").queryName("corpus_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    mem.addData(
      Doc(1L, goodText, ts("2026-05-01 10:05:00")),
      Doc(2L, goodText + " different tail here", ts("2026-05-01 10:20:00")))
    q.processAllAvailable()
    // advance the watermark far past the 10:00 window
    mem.addData(Doc(9L, goodText + " closer", ts("2026-05-01 13:00:00")))
    q.processAllAvailable()
    mem.addData(Doc(10L, goodText + " closes it", ts("2026-05-01 14:00:00")))
    q.processAllAvailable()

    val got = spark.table("corpus_stats").collect()
    q.stop()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("predicted_lang") === "en")
    assert(r.getAs[Timestamp]("window_start") === ts("2026-05-01 10:00:00"))
    assert(r.getAs[Long]("n_docs") === 2L)
    val wsTokens = goodText.split("\\s+").length
    assert(r.getAs[Long]("total_tokens") === wsTokens + (wsTokens + 3))
  }
}
