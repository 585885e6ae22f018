package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReportingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma", "en", "web", 15L),
    (2L, "uno dos", "es", "web", 7L),
    (3L, "one two three four", "en", "web", 18L),
    (4L, "", "en", "books", 0L),
    (5L, "un deux trois", "fr", "books", 13L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("data card: per-stratum counts and exact corpus shares") {
    val card = Reporting.dataCard(corpus).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) -> r)
      .toMap
    assert(card.size === 4)
    val webEn = card(("web", "en"))
    assert(webEn.getAs[Long]("n_docs") === 2L)
    assert(webEn.getAs[Long]("total_tokens") === 7L) // 3 + 4
    assert(webEn.getAs[Long]("total_chars") === 33L)
    assert(webEn.getAs[Double]("doc_share") === 2.0 / 5.0)
    assert(webEn.getAs[Double]("token_share") === 7.0 / 12.0)
    // the empty doc contributes a stratum with zero tokens, not a NULL
    val booksEn = card(("books", "en"))
    assert(booksEn.getAs[Long]("total_tokens") === 0L)
    assert(booksEn.getAs[Double]("token_share") === 0.0)
  }

  test("shares partition the corpus: doc and token shares each sum to 1") {
    val agg = Reporting.dataCard(corpus)
      .agg(sum("doc_share").as("ds"), sum("token_share").as("ts"))
      .head()
    assert(math.abs(agg.getAs[Double]("ds") - 1.0) < 1e-12)
    assert(math.abs(agg.getAs[Double]("ts") - 1.0) < 1e-12)
  }

  test("aggregation happens before the totals join: no corpus-grain window") {
    // the totals frame joins AGGREGATED stratum rows — the plan must
    // not contain a Window operator at all (a global `sum over ()`
    // on the corpus would serialize the scan through one partition)
    val plan = Reporting.dataCard(corpus).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }
}
