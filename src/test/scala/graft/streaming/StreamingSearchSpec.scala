package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TextAnalysis
import StreamingSearch.{Config, QueryIn}

/** [[StreamingSearch]] — online query serving off a frozen index:
  * per-epoch scores equal the batch multiQueryBm25 bit-for-bit,
  * replayed batches rewrite identical top-k, absent terms score
  * nothing.
  */
class StreamingSearchSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (0L, "spark dedup spark vector"),
    (1L, "vector stream merge stream"),
    (2L, "hash join spark"),
    (3L, "plain prose nothing relevant"))
    .toDF("doc_id", "text")

  private def mkCfg(): Config = {
    val dir = java.nio.file.Files.createTempDirectory("ssearch")
    Config(indexPath = dir.resolve("index").toString,
      outPath = dir.resolve("out").toString, k = 3)
  }

  test("batch-scored queries equal multiQueryBm25 bit-for-bit; replay idempotent") {
    val cfg = mkCfg()
    StreamingSearch.buildIndex(corpus, cfg.indexPath)
    val queries = Seq(
      TextAnalysis.TermQuery(0L, Seq("spark", "vector")),
      TextAnalysis.TermQuery(1L, Seq("stream", "nosuchterm")))
    StreamingSearch.processBatch(
      Seq(QueryIn(0L, Seq("spark", "vector"))).toDS(), 0L, cfg)
    StreamingSearch.processBatch(
      Seq(QueryIn(1L, Seq("stream", "nosuchterm"))).toDS(), 1L, cfg)

    def got = spark.read.parquet(cfg.outPath)
      .select("query_id", "doc_id", "n_hit_terms", "score", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet
    val expected = TextAnalysis.multiQueryBm25TopK(corpus, queries, n = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_hit_terms"), r.getAs[Double]("score"),
        r.getAs[Long]("rank"))).toSet
    assert(got === expected, "streamed scores diverged from the batch scorer")
    assert(got.nonEmpty && got.forall(_._5 <= 3))
    // replay batch 1: identical partition content
    StreamingSearch.processBatch(
      Seq(QueryIn(1L, Seq("stream", "nosuchterm"))).toDS(), 1L, cfg)
    assert(got === expected)
  }

  test("a query of only absent terms emits no rows") {
    val cfg = mkCfg()
    StreamingSearch.buildIndex(corpus, cfg.indexPath)
    StreamingSearch.processBatch(
      Seq(QueryIn(7L, Seq("zzz", "absent"))).toDS(), 0L, cfg)
    assert(spark.read.parquet(cfg.outPath + "/batch=0").count() === 0L)
  }
}
