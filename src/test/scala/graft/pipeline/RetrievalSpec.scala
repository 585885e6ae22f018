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

  // ---- round 12: Retrieval library (topKRanks / rrfFuse / anchorTopK) ----

  test("topKRanks: dense 1-based ranks, score desc with id tie-break, cut at k") {
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.5), (4L, 0.1))
      .toDF("doc_id", "score")
    val got = Retrieval.topKRanks(scores, "doc_id", "score", 3).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // 0.9 first; the 0.5 tie breaks on id asc; 0.1 cut by k=3
    assert(got === Seq((2L, 1), (1L, 2), (3L, 3)))
  }

  test("rrfFuse: fused score is sum of 1/(k+rank); ties break on id") {
    val lex = Seq((10L, 1), (11L, 2)).toDF("doc_id", "rank")
    val sem = Seq((11L, 1), (12L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      "doc_id", k = 60, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val e11 = 1.0 / 62 + 1.0 / 61
    val e10 = 1.0 / 61
    val e12 = 1.0 / 62
    assert(got === Seq((11L, e11), (10L, e10), (12L, e12)))
  }

  test("rrfFuse: a missing side contributes 0.0 (COALESCE), never null") {
    val lex = Seq((10L, 1)).toDF("doc_id", "rank")
    val sem = Seq((12L, 1)).toDF("doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      "doc_id", k = 60, topK = 10).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(!r.isNullAt(3), "rrf must never be null")
      assert(r.getDouble(3) === 1.0 / 61)
      // exactly one rank column is null — the single-list shape
      assert(r.isNullAt(1) ^ r.isNullAt(2))
    }
  }

  test("rrfFuse: the k parameter reweights depth — small k favors rank-1 hits") {
    // a: rank 1 in one list; b: rank 3 in both lists
    val lex = Seq((1L, 1), (2L, 3)).toDF("doc_id", "rank")
    val sem = Seq((3L, 1), (2L, 3)).toDF("doc_id", "rank")
    def topId(k: Int): Long =
      Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "doc_id",
        k = k, topK = 1).collect()(0).getLong(0)
    // k=60: 2/(60+3) = 0.0317 > 1/(60+1) = 0.0164 — consensus wins
    assert(topId(60) === 2L)
    // k=0: 1/1 = 1.0 > 2/3 = 0.67 — a single rank-1 hit wins
    assert(topId(0) === 1L)
  }

  test("anchorTopK: counts per (dst, anchor); rank by count desc, h60 asc; null/empty drop") {
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (5L, 200L), (6L, 200L), (7L, 300L)).toDF("src", "dst")
    val anchors = Seq((1L, "apple"), (2L, "apple"), (3L, "banana"),
      (4L, "cherry"), (5L, ""), (6L, null.asInstanceOf[String]),
      (7L, "delta")).toDF("src", "anchor")
    val got = Retrieval.anchorTopK(edges, anchors, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    // dst 100: apple cnt=2 is rank 1; banana/cherry tie at cnt=1 —
    // the winner is the LOWER 60-bit md5 hash (compute, don't guess)
    val h = Seq("banana", "cherry").toDF("a")
      .select(col("a"), graft.functions.Md5Hash.h60(col("a")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val second = if (h("banana") < h("cherry")) "banana" else "cherry"
    // dst 200: both anchors null/empty -> no rows at all
    assert(got === Set((100L, 1, "apple", 2L), (100L, 2, second, 1L),
      (300L, 1, "delta", 1L)))
  }
}
