package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.TextAnalysis
import graft.pipeline.TextAnalysis.TermQuery

/** Online BM25 scoring ([[StreamingRetrieval]]): frozen stats match a
  * hand count, the stream scores batch-identically under same-corpus
  * stats, and micro-batch boundaries change nothing.
  */
class StreamingRetrievalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "spark spark table join"),
    (1L, "dup dup dup spark"),
    (2L, "vector index scan"),
    (3L, "table scan merge merge vector"),
    (4L, "join join join join")).toDF("doc_id", "text")

  private val queries = Seq(
    TermQuery(0L, Seq("spark", "dup")),
    TermQuery(1L, Seq("vector", "merge", "ghostterm")))

  test("frozenStats: doc count, token total and per-term df by hand") {
    val st = StreamingRetrieval.frozenStats(corpus,
      Seq("spark", "dup", "vector", "merge", "ghostterm"))
    assert(st.n === 5L)
    assert(st.tot === 4L + 4 + 3 + 5 + 4)
    assert(st.df === Map("spark" -> 2L, "dup" -> 1L, "vector" -> 2L,
      "merge" -> 1L)) // ghostterm absent => never scores
  }

  test("static parity: scoreStream == multiQueryBm25 under same-corpus stats") {
    val stats = StreamingRetrieval.frozenStats(corpus, queries.flatMap(_.terms))
    val streamed = StreamingRetrieval.scoreStream(corpus, queries, stats)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = TextAnalysis.multiQueryBm25(corpus, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // keys: batch emits (query_id, doc_id); streamed emits (doc_id,
    // query_id) first — normalize
    val streamedNorm = streamed.map { case ((d, q), v) => (q, d) -> v }
    assert(streamedNorm.keySet === batch.keySet)
    streamedNorm.foreach { case (k, (hits, score)) =>
      assert(hits === batch(k)._1, s"$k hits")
      assert(math.abs(score - batch(k)._2) < 1e-9, s"$k score")
    }
  }

  test("micro-batch boundaries cannot change a row (pure projection)") {
    implicit val sqlCtx = spark.sqlContext
    val stats = StreamingRetrieval.frozenStats(corpus, queries.flatMap(_.terms))
    val mem = MemoryStream[(Long, String)]
    val out = StreamingRetrieval.scoreStream(
      mem.toDS().toDF("doc_id", "text"), queries, stats)
    val q = out.writeStream.format("memory").queryName("ret")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    // one doc per micro-batch — the worst-case batching
    rows.foreach { r => mem.addData(r); q.processAllAvailable() }
    val streamed = spark.table("ret").collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    q.stop()
    val whole = StreamingRetrieval.scoreStream(corpus, queries, stats)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed === whole) // bit-identical: same pinned fold per row
  }
}
