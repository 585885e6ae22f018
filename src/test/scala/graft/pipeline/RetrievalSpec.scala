package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import TextAnalysis.TermQuery

/** Batched BM25 retrieval ([[TextAnalysis.multiQueryBm25]]): per-query
  * equivalence with the single-query operator, shared-term fan-out,
  * vocabulary misses, and the per-query top-k cut.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark spark table join"),
    (1L, "dup dup dup spark"),
    (2L, "vector index scan"),
    (3L, "table scan merge merge vector"),
    (4L, "join join join join"),
    (5L, "")).toDF("doc_id", "text")

  private val queries = Seq(
    TermQuery(0L, Seq("spark", "dup")),
    TermQuery(1L, Seq("vector", "merge")),
    TermQuery(2L, Seq("spark")), // shares 'spark' with q0
    TermQuery(3L, Seq("ghostterm"))) // vocabulary miss: df = 0

  test("each query scores exactly as the single-query operator") {
    val multi = TextAnalysis.multiQueryBm25(docs, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    queries.filter(_.queryId != 3L).foreach { q =>
      val single = TextAnalysis.bm25Scores(docs, q.terms).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val mine = multi.collect { case ((qid, d), v) if qid == q.queryId => d -> v }
      assert(mine.keySet === single.keySet, s"query ${q.queryId} doc set")
      mine.foreach { case (d, (hits, score)) =>
        val (sh, ss) = single(d)
        assert(hits === sh)
        assert(math.abs(score - ss) < 1e-9, s"q${q.queryId} doc $d")
      }
    }
  }

  test("a term shared by two queries scores once per query, identically") {
    val multi = TextAnalysis.multiQueryBm25(docs, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // q2 = {spark}: docs 0 and 1 must appear for BOTH q0 and q2, and
    // q2's score is the spark-only addend — strictly less than q0's
    // on doc 1 (which also hits 'dup')
    assert(multi.contains((0L, 0L)) && multi.contains((2L, 0L)))
    assert(multi.contains((0L, 1L)) && multi.contains((2L, 1L)))
    assert(multi((0L, 1L)) > multi((2L, 1L)))
  }

  test("df=0 terms never score; empty docs never appear") {
    val multi = TextAnalysis.multiQueryBm25(docs, queries).collect()
    assert(!multi.exists(_.getLong(0) == 3L), "ghostterm query must be empty")
    assert(!multi.exists(_.getLong(1) == 5L), "empty doc must not score")
  }

  test("per-query top-k cuts within each query, score desc / doc asc") {
    val top1 = TextAnalysis.multiQueryBm25TopK(docs, queries, n = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q0 {spark, dup}: doc 1 hits both terms (dup is rare => high idf)
    assert(top1(0L) === 1L)
    // every query emits at most n rows
    val counts = TextAnalysis.multiQueryBm25TopK(docs, queries, n = 2)
      .groupBy("query_id").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(counts.forall(_._2 <= 2))
  }

  test("corpus scan count is fixed — it does not grow with the query set") {
    // scan sites: tf / docFreq / dl / stats corpus reads + ONE
    // query-literal table — the whole query set rides the same
    // passes, the 100 TB contract
    def scans(qs: Seq[TermQuery]) = "LocalTableScan".r.findAllIn(
      TextAnalysis.multiQueryBm25(docs, qs)
        .queryExecution.executedPlan.toString).size
    val two = scans(queries.take(2))
    val many = scans(queries ++ queries.map(q =>
      q.copy(queryId = q.queryId + 10)))
    assert(many === two, s"scan count grew with |queries|: $two -> $many")
    assert(two <= 5, s"expected <= 5 local scans, got $two")
  }
}
