package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import StreamingAdmission.AdmitDoc

/** [[StreamingAdmission]] — per-source ingestion quota: the counter
  * persists across micro-batches (rejections in batch 2 come from
  * STATE, not in-batch arithmetic), admit_seq is the contiguous quota
  * slot, in-batch ordering is doc_id, and rejected docs emit nothing.
  */
class StreamingAdmissionSpec extends SparkSpec {

  private def run(batches: Seq[Seq[AdmitDoc]], k: Long,
      name: String): Seq[(String, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[AdmitDoc]
    val q = StreamingAdmission.admit(mem.toDS(), k)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("admit_seq"))).toSeq
    q.stop()
    rows
  }

  test("quota persists across batches: batch-2 overflow rejected by state") {
    // source x: 2 in batch 1, 2 in batch 2, k=3 -> the LAST batch-2
    // doc is rejected purely because the counter carried over
    val rows = run(Seq(
      Seq(AdmitDoc(1, "x"), AdmitDoc(2, "x"), AdmitDoc(10, "y")),
      Seq(AdmitDoc(3, "x"), AdmitDoc(4, "x"), AdmitDoc(11, "y"))),
      k = 3, name = "adm_state")
    assert(rows.toSet === Set(
      ("x", 1L, 1L), ("x", 2L, 2L), ("x", 3L, 3L),
      ("y", 10L, 1L), ("y", 11L, 2L)))
  }

  test("in-batch fold order is doc_id, not arrival order") {
    val rows = run(Seq(
      Seq(AdmitDoc(5, "x"), AdmitDoc(1, "x"), AdmitDoc(3, "x"))),
      k = 2, name = "adm_order")
    assert(rows.toSet === Set(("x", 1L, 1L), ("x", 3L, 2L)))
  }

  test("a source at quota admits nothing more, ever") {
    val rows = run(Seq(
      Seq(AdmitDoc(1, "x")),
      Seq(AdmitDoc(2, "x")),
      Seq(AdmitDoc(3, "x"))),
      k = 1, name = "adm_full")
    assert(rows === Seq(("x", 1L, 1L)))
  }

  private def runTokens(batches: Seq[Seq[StreamingAdmission.TokenDoc]],
      budget: Long, name: String): Seq[(String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[StreamingAdmission.TokenDoc]
    val q = StreamingAdmission.admitTokens(mem.toDS(), budget)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_before"))).toSeq
    q.stop()
    rows
  }

  import StreamingAdmission.TokenDoc

  test("token budget closes at first overflow: a smaller later doc never slips in") {
    // budget 10: doc1 (6) admitted, doc2 (7) overflows -> CLOSED,
    // doc3 (2) would fit arithmetically but must be rejected
    val rows = runTokens(Seq(Seq(
      TokenDoc(1, "x", 6), TokenDoc(2, "x", 7), TokenDoc(3, "x", 2))),
      budget = 10, name = "tok_close")
    assert(rows === Seq(("x", 1L, 6L, 0L)))
  }

  test("token budget accumulates across batches; tokens_before is the running total") {
    val rows = runTokens(Seq(
      Seq(TokenDoc(1, "x", 3), TokenDoc(10, "y", 9)),
      Seq(TokenDoc(2, "x", 4)),
      Seq(TokenDoc(3, "x", 4), TokenDoc(11, "y", 2))),
      budget = 10, name = "tok_acc")
    assert(rows.toSet === Set(
      ("x", 1L, 3L, 0L), ("x", 2L, 4L, 3L),
      // x at 7 + 4 = 11 > 10 -> closed; y admits 9 then closes on 2
      ("y", 10L, 9L, 0L)))
  }

  test("token budget: exact fit admits; the NEXT doc closes the quota") {
    val rows = runTokens(Seq(Seq(
      TokenDoc(1, "x", 10), TokenDoc(2, "x", 1))),
      budget = 10, name = "tok_fit")
    assert(rows === Seq(("x", 1L, 10L, 0L)))
  }

  test("admit_seq is contiguous per source across many batches") {
    val batches = (0 until 5).map(b =>
      (0 until 4).map(i => AdmitDoc(b * 10 + i, s"s${i % 2}")))
    val rows = run(batches, k = 7, name = "adm_seq")
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (_, rs) =>
      val seqs = rs.sortBy(_._2).map(_._3)
      assert(seqs === (1L to seqs.length))
      assert(seqs.length === 7)
    }
  }
}
