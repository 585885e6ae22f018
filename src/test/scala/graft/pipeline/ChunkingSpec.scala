package graft.pipeline

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Context-window chunking contract (p43): offsets, overlap, coverage,
  * short-last-chunk, zero-token docs, and the no-shuffle plan shape.
  */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e f g"),            // 7 tokens
    (2L, "  x   y  "),                // 2 tokens, messy whitespace
    (3L, ""),                          // zero tokens
    (4L, " \t\n "),                    // whitespace-only => zero tokens
    (5L, (1 to 100).map(i => s"t$i").mkString(" ")) // 100 tokens
  ).toDF("doc_id", "text")

  test("chunk offsets, ids and sizes: step = chunk - overlap, short last chunk, empty docs dropped") {
    val out = Chunking.tokenChunks(docs, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // doc 1 (7 tokens, step 3): starts 0,3,6 -> sizes 4,4,1
    val d1 = out.filter(_._1 == 1L)
    assert(d1.toSeq === Seq(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "d e f g", 4L),
      (1L, 2L, "g", 1L)))
    // doc 2: 2 tokens -> one short chunk, whitespace normalized
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "x y", 2L)))
    // docs 3/4: zero tokens -> zero chunks
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    // doc 5 (100 tokens, step 3): ceil-coverage count = 34 starts
    val d5 = out.filter(_._1 == 5L)
    assert(d5.length === 34)
    assert(d5.last._4 === 1L) // 99 % 3 = 0 -> last start 99, size 1
  }

  test("overlap=0 roundtrip: concatenated chunks reproduce the token stream; token totals match tokenCount") {
    val out = Chunking.tokenChunks(docs, chunkTokens = 3, overlap = 0)
    val rebuilt = out.groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct($"chunk_id", $"chunk_text")))
        .getField("chunk_text")).as("joined"),
        sum("n_tokens").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val expect = docs.select($"doc_id",
        concat_ws(" ", TextAnalysis.tokens($"text")).as("norm"),
        TextAnalysis.tokenCount($"text").as("n"))
      .where($"n" > 0)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rebuilt === expect)
  }

  test("chunk counts: ceil(n / step) chunks per doc; every chunk except the last is full") {
    val out = Chunking.tokenChunks(docs, chunkTokens = 8, overlap = 3) // step 5
    val counts = out.groupBy("doc_id").agg(count("*").as("c"),
        max("chunk_id").as("maxid")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Map(1L -> 7L, 2L -> 2L, 5L -> 100L)
    n.foreach { case (d, tokens) =>
      val expect = (tokens + 4) / 5 // ceil(n/5)
      assert(counts(d)._1 === expect, s"doc $d")
      assert(counts(d)._2 === expect - 1)
    }
    // a chunk is full exactly when chunkTokens tokens remain past its
    // start (start = chunk_id * step); docs shorter than chunkTokens
    // (doc 1: 7 < 8) legitimately have short NON-last chunks
    val wrongSize = out
      .withColumn("n", when($"doc_id" === 1, 7L).when($"doc_id" === 2, 2L).otherwise(100L))
      .where($"n_tokens" =!= least(lit(8L), $"n" - $"chunk_id" * 5L))
    assert(wrongSize.count() === 0)
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](Chunking.tokenChunks(docs, 0, 0))
    intercept[IllegalArgumentException](Chunking.tokenChunks(docs, 4, 4))
    intercept[IllegalArgumentException](Chunking.tokenChunks(docs, 4, -1))
  }

  test("plan shape: chunking is narrow — zero exchanges, one whole-stage codegen span") {
    withNoAqe {
      val plan = Chunking.tokenChunks(docs, 64, 16).queryExecution.executedPlan
      val exchanges = plan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty, s"chunking must not shuffle:\n$plan")
    }
  }
}
