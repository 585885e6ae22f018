package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import StreamingBatching.SlotDoc

/** [[StreamingBatching]] — online batch formation: slot dealing in
  * arrival order, per-bucket counters across micro-batches, bucket
  * boundaries, and the full-batch structure.
  */
class StreamingBatchingSpec extends SparkSpec {

  private def run(batches: Seq[Seq[SlotDoc]], width: Int, size: Int,
      name: String): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SlotDoc]
    val q = StreamingBatching.assignSlots(mem.toDS(), width, size)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("batch_id"), r.getAs[Long]("slot"))).toSeq
    q.stop()
    rows
  }

  test("slots deal in doc_id order within a batch; counters persist across batches") {
    // bucket 0 (tokens < 10): docs 1,2 in batch 1, doc 3 in batch 2 —
    // doc 3's slot continues where batch 1 stopped
    val rows = run(Seq(
      Seq(SlotDoc(2, 5), SlotDoc(1, 3)),
      Seq(SlotDoc(3, 7))),
      width = 10, size = 2, name = "sb_persist")
    assert(rows.toSet === Set(
      (0L, 1L, 0L, 0L), (0L, 2L, 0L, 1L), // first batch fills batch_id 0
      (0L, 3L, 1L, 0L)))                  // next arrival opens batch_id 1
  }

  test("buckets deal independently; boundaries at n_tokens div width") {
    val rows = run(Seq(Seq(
      SlotDoc(1, 9), SlotDoc(2, 10), SlotDoc(3, 19), SlotDoc(4, 20))),
      width = 10, size = 8, name = "sb_buckets")
    val byId = rows.map(r => r._2 -> (r._1, r._4)).toMap
    assert(byId(1L) === ((0L, 0L)))
    assert(byId(2L) === ((1L, 0L))) // 10 div 10 = bucket 1, fresh slot 0
    assert(byId(3L) === ((1L, 1L)))
    assert(byId(4L) === ((2L, 0L)))
  }

  test("every batch fills before the next opens (batch_id = dealt div size)") {
    val rows = run(Seq((1 to 10).map(i => SlotDoc(i.toLong, 5))),
      width = 10, size = 4, name = "sb_fill")
    val slots = rows.sortBy(_._2).map(r => (r._3, r._4))
    assert(slots === Seq(
      (0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 0L), (2L, 1L)))
  }
}
