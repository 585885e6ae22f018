package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.{EmbeddingFixture, Similarity}

case class Emb(vec_id: Long, embedding: Array[Float], ingested_at: Timestamp)

/** Streaming embedding near-dup suppression must agree with a
  * batch-side greedy first-wins replay over the SAME sign-LSH buckets
  * ([[graft.pipeline.Similarity.lshBucket]] is computed in-scan, so
  * bucket identity is batch==stream by construction), quarantine
  * malformed vectors instead of letting them claim, and keep drops
  * observable. No statefulOperator.checkCorrectness disable is
  * needed — single stateful stage.
  */
class StreamingEmbeddingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val dim = 16
  private def member(c: Int, m: Int) =
    EmbeddingFixture.member("sed", dim, 0.01f)(c, m)

  // two tight clusters (near-dup groups) + a lone vector + a
  // malformed (truncated) vector
  private val fixture = Seq(
    Emb(1L, member(0, 0), ts("2026-05-01 10:00:00")),
    Emb(2L, member(0, 1), ts("2026-05-01 10:10:00")), // near-dup of 1
    Emb(3L, member(1, 0), ts("2026-05-01 10:20:00")),
    Emb(4L, member(1, 1), ts("2026-05-01 10:30:00")), // near-dup of 3
    Emb(5L, member(2, 0), ts("2026-05-01 10:40:00")), // lone
    Emb(6L, member(0, 2), ts("2026-05-01 10:50:00")), // near-dup of 1
    Emb(7L, member(3, 0).take(dim - 4), ts("2026-05-01 10:55:00"))) // malformed

  test("streaming keepers == batch greedy first-wins over identical buckets") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // batch-side bucket identity + greedy replay
    val batchBuckets = fixture.toDF()
      .select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), bits = 8, dim = dim).as("b"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // sanity: the clusters actually collide, the malformed is NULL
    assert(batchBuckets(1L) === batchBuckets(2L))
    assert(batchBuckets(1L) === batchBuckets(6L))
    assert(batchBuckets(3L) === batchBuckets(4L))
    assert(batchBuckets(7L).isEmpty)
    val seen = scala.collection.mutable.Set.empty[Long]
    val expectedKeepers = fixture.sortBy(_.ingested_at.getTime).flatMap { e =>
      batchBuckets(e.vec_id) match {
        case None => Some(e.vec_id) // quarantine keeps
        case Some(b) => if (seen.add(b)) Some(e.vec_id) else None
      }
    }.toSet

    val mem = MemoryStream[Emb]
    val q = StreamingCuration.embeddingNearDupKeepers(mem.toDF(),
      bits = 8, dim = dim, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("emb_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    fixture.foreach { e => mem.addData(e); q.processAllAvailable() }
    val rows = spark.table("emb_dedup").collect()
    q.stop()

    val keepers = rows.filter(_.getAs[Boolean]("keeper"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(keepers === expectedKeepers,
      s"streaming keepers $keepers diverge from batch greedy $expectedKeepers")
    // every row got a verdict (drops observable), and the malformed
    // row is flagged quarantined, kept, and claimed nothing
    assert(rows.map(_.getAs[Long]("vec_id")).toSet ===
      fixture.map(_.vec_id).toSet)
    val r7 = rows.find(_.getAs[Long]("vec_id") == 7L).get
    assert(r7.getAs[Boolean]("quarantined") && r7.getAs[Boolean]("keeper"))
    assert(rows.count(r => !r.getAs[Boolean]("keeper")) === 3) // 2, 4, 6
  }

  test("a whole near-dup group in one micro-batch keeps exactly its deterministic winner") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Emb]
    val q = StreamingCuration.embeddingNearDupKeepers(mem.toDF(),
      bits = 8, dim = dim, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("emb_dedup_batch")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    // same event time: the id breaks the tie, partition order must not
    mem.addData(
      Emb(11L, member(5, 0), ts("2026-05-01 10:00:00")),
      Emb(12L, member(5, 1), ts("2026-05-01 10:00:00")),
      Emb(13L, member(5, 2), ts("2026-05-01 10:00:00")))
    q.processAllAvailable()
    val rows = spark.table("emb_dedup_batch").collect()
    q.stop()
    val keepers = rows.filter(_.getAs[Boolean]("keeper"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(keepers === Set(11L), s"same-batch group mishandled: $keepers")
  }
}
