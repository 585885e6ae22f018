package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.Dedup

class StreamingNearDupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // No checkCorrectness set/restore here (round-6 verdict item 3): the
  // claimant stage declares its event-time column via
  // transformWithState, so the chained aggregation is checker-legal in
  // a shared session.

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat naps " +
      "in the warm afternoon sun near the old garden wall"
  private val other =
    "completely different subject matter about distributed query engines " +
      "optimizing shuffle partitions and broadcast joins at petabyte scale"

  // doc 1; near-dup of 1 (one word changed); distinct doc; near-dup of
  // the distinct doc; exact re-send of 1; an unrelated third topic
  private val fixture = Seq(
    Doc(1L, base, ts("2026-05-01 10:00:00")),
    Doc(2L, base.replace("lazy", "sleepy"), ts("2026-05-01 10:10:00")),
    Doc(3L, other, ts("2026-05-01 10:20:00")),
    Doc(4L, other.replace("petabyte", "exabyte"), ts("2026-05-01 10:30:00")),
    Doc(5L, base, ts("2026-05-01 10:40:00")),
    Doc(6L, "tiny", ts("2026-05-01 10:50:00"))) // < n tokens: sentinel bucket

  test("streaming band buckets are IDENTICAL to the batch LSH index") {
    import spark.implicits._
    val docs = fixture.toDF()
    val batch = Dedup.bandBuckets(
      Dedup.minHashSignatures(Dedup.wordShingles(docs)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val streamExpr = docs
      .select(col("doc_id"),
        explode(Dedup.minHashBandBuckets(col("doc_id"), col("text"))).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .where(col("doc_id") =!= 6L) // batch has no signature for shingle-less docs
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamExpr === batch)
  }

  test("replayed fixture: keepers match batch minHashNearDups greedy first-wins") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // batch ground truth on the same fixture: verified near-dup pairs
    val docs = fixture.toDF()
    val batchPairs = Dedup.minHashNearDups(docs, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(batchPairs === Set((1L, 2L), (3L, 4L), (1L, 5L), (2L, 5L)))

    // batch-side greedy replay over the SAME LSH index the stream
    // keys its state by: first arrival per bucket wins, a doc
    // survives iff none of its bands collided
    val bucketsByDoc = Dedup.bandBuckets(
      Dedup.minHashSignatures(Dedup.wordShingles(docs)))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getString(2))).toSet }
    val seen = scala.collection.mutable.Set.empty[(Int, String)]
    val expectedKeepers = fixture.sortBy(_.ingested_at.getTime).flatMap { d =>
      val bs = bucketsByDoc.getOrElse(d.doc_id, Set.empty)
      val keep = bs.forall(b => !seen.contains(b))
      seen ++= bs
      if (keep || bs.isEmpty) Some(d.doc_id) else None
    }.toSet
    // on this fixture candidates == verified dups, so the greedy
    // keeper set is exactly "first of each near-dup group + uniques"
    assert(expectedKeepers === Set(1L, 3L, 6L))

    val mem = MemoryStream[Doc]
    val q = StreamingCuration.nearDupKeepers(mem.toDF(),
      watermarkDelay = "2 hours", emitWindow = "10 minutes")
      .writeStream.format("memory").queryName("near_dup_keepers")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    // one micro-batch per doc: arrival order = event-time order
    fixture.foreach { d => mem.addData(d); q.processAllAvailable() }
    // push the watermark far past every fixture window so they close
    mem.addData(Doc(99L, "sentinel closes the windows", ts("2026-05-02 13:00:00")))
    q.processAllAvailable()
    mem.addData(Doc(100L, "and flushes the last state", ts("2026-05-02 14:00:00")))
    q.processAllAvailable()

    val kept = spark.table("near_dup_keepers").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    q.stop()
    assert(kept.intersect(fixture.map(_.doc_id).toSet) === expectedKeepers,
      s"streaming keepers $kept diverge from batch greedy $expectedKeepers")
  }

  test("a whole near-dup group in ONE micro-batch keeps exactly one member") {
    // the failure mode of per-row first-wins dedup: two near-dups in
    // one batch can split the contested buckets between them (each
    // loses a band, both drop, the content VANISHES). The
    // (event time, id)-deterministic claimant must keep doc 1.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamingCuration.nearDupKeepers(mem.toDF(),
      watermarkDelay = "2 hours", emitWindow = "10 minutes")
      .writeStream.format("memory").queryName("near_dup_batch")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    // all three docs + both near-dups land in the SAME micro-batch
    mem.addData(
      Doc(1L, base, ts("2026-05-01 10:00:00")),
      Doc(2L, base.replace("lazy", "sleepy"), ts("2026-05-01 10:00:00")),
      Doc(3L, other, ts("2026-05-01 10:05:00")))
    q.processAllAvailable()
    mem.addData(Doc(99L, "sentinel closes the windows", ts("2026-05-02 13:00:00")))
    q.processAllAvailable()
    mem.addData(Doc(100L, "and flushes the last state", ts("2026-05-02 14:00:00")))
    q.processAllAvailable()
    val kept = spark.table("near_dup_batch").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    q.stop()
    assert(kept.intersect(Set(1L, 2L, 3L)) === Set(1L, 3L),
      s"same-batch near-dup group mishandled: kept $kept")
  }

  test("nearDupDrops reports every dropped doc with its surviving band count") {
    // candidate-level dedup deletes on unverified band collisions —
    // a banding FP is silent data loss unless the drops are
    // observable. The side output must carry exactly the fixture's
    // non-keepers, each with kept_bands < numBands (= 16/4).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamingCuration.nearDupDrops(mem.toDF(),
      watermarkDelay = "2 hours", emitWindow = "10 minutes")
      .writeStream.format("memory").queryName("near_dup_drops")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    fixture.foreach { d => mem.addData(d); q.processAllAvailable() }
    mem.addData(Doc(99L, "sentinel closes the windows", ts("2026-05-02 13:00:00")))
    q.processAllAvailable()
    mem.addData(Doc(100L, "and flushes the last state", ts("2026-05-02 14:00:00")))
    q.processAllAvailable()
    val drops = spark.table("near_dup_drops").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kept_bands")).toMap
    q.stop()
    // keepers were {1, 3, 6} (previous test); the complement drops
    assert(drops.keySet.intersect(fixture.map(_.doc_id).toSet) === Set(2L, 4L, 5L),
      s"drop side-output wrong: $drops")
    assert(Set(2L, 4L, 5L).forall(k => drops(k) < 4),
      s"a 'drop' claims all its bands survived: $drops")
  }
}
