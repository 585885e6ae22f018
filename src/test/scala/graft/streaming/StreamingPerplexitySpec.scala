package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.TextAnalysis
import StreamingPerplexity.{PplDoc, frozenLm, scoreDoc}

/** [[StreamingPerplexity]] — frozen-LM online scoring: batch parity on
  * in-vocabulary text, the OOV floor (never ln(0)), the unseen-context
  * unigram fallback, and the tokenizer mirror.
  */
class StreamingPerplexitySpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "a cat and a dog"),
    (4L, "the cat and the dog sat"))

  test("in-vocabulary scores equal the batch operator's (1e-9)") {
    val df = corpus.toDF("doc_id", "text")
    val model = frozenLm(df)
    val batch = TextAnalysis.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    corpus.foreach { case (id, text) =>
      val got = scoreDoc(id, text, model)
      val (nTok, avg) = batch(id)
      assert(got.n_tokens === nTok, s"doc $id token count")
      assert(math.abs(got.avg_logprob - avg) < 1e-9,
        s"doc $id: ${got.avg_logprob} vs $avg")
    }
  }

  test("OOV unigram floors at count 1 — finite score, below in-vocab") {
    val model = frozenLm(corpus.toDF("doc_id", "text"))
    val oov = scoreDoc(99L, "zzz qqq", model)
    assert(oov.n_tokens === 2L)
    assert(!oov.avg_logprob.isNegInfinity && !oov.avg_logprob.isNaN)
    // both tokens score ln(1/n): the floor
    assert(math.abs(oov.avg_logprob - math.log(1.0 / model.n)) < 1e-12)
    val seen = scoreDoc(98L, "the cat", model)
    assert(seen.avg_logprob > oov.avg_logprob)
  }

  test("unseen context falls back to unigram-only (the first-token rule)") {
    val model = frozenLm(corpus.toDF("doc_id", "text"))
    // "zzz the": 'the' after an OOV prev must score exactly like a
    // first-token 'the' (cu/n), not through a zeroed bigram mixture
    val s = scoreDoc(97L, "zzz the", model)
    val expected = (math.log(1.0 / model.n) +
      math.log(model.uni("the").toDouble / model.n)) / 2.0
    assert(math.abs(s.avg_logprob - expected) < 1e-12)
  }

  test("empty and whitespace-only docs emit NO stream row (batch contract)") {
    // scoreDoc's internal sentinel is (0, 0.0) — but the batch
    // operator emits no row for a token-less doc, and 0.0 is the best
    // possible score: a band filter downstream would keep exactly the
    // docs it must drop. scoreStream must filter them.
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val model = frozenLm(corpus.toDF("doc_id", "text"))
    val mem = MemoryStream[PplDoc]
    val q = StreamingPerplexity.scoreStream(mem.toDS(), model)
      .writeStream.format("memory").queryName("ppl_empty")
      .outputMode("append").start()
    mem.addData(PplDoc(1L, ""), PplDoc(2L, "   \t\n"), PplDoc(3L, "the cat"))
    q.processAllAvailable()
    val got = spark.table("ppl_empty").collect().map(_.getAs[Long]("doc_id"))
    q.stop()
    assert(got.toSet === Set(3L), "token-less docs must emit no row")
  }

  test("tokenizer mirrors TextAnalysis.tokens on hostile whitespace") {
    val hostile = Seq((1L, "  a  b\tc\nd  "), (2L, " x "), (3L, "\t\n"))
    val sparkToks = hostile.toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.tokens($"text").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    hostile.foreach { case (id, t) =>
      assert(StreamingPerplexity.tokenize(t).toList === sparkToks(id),
        s"doc $id")
    }
  }

  test("streamed scores equal direct scoring (stateless across batches)") {
    implicit val sqlCtx = spark.sqlContext
    val model = frozenLm(corpus.toDF("doc_id", "text"))
    val mem = MemoryStream[PplDoc]
    implicit val sp = spark
    val q = StreamingPerplexity.scoreStream(mem.toDS(), model)
      .writeStream.format("memory").queryName("ppl_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(50)).start()
    val batches = corpus.map { case (id, t) => PplDoc(id, t) }.grouped(2).toSeq
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    val got = spark.table("ppl_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logprob"))
      .toMap
    q.stop()
    corpus.foreach { case (id, t) =>
      assert(got(id) === scoreDoc(id, t, model).avg_logprob, s"doc $id")
    }
  }

  // ---- round 12: bounded training pulls (minBigramCount / maxVocab) ----

  test("default caps reproduce the uncapped model exactly") {
    val df = corpus.toDF("doc_id", "text")
    val a = frozenLm(df)
    val b = frozenLm(df, minBigramCount = 1L, maxVocab = Int.MaxValue)
    assert(a.n === b.n)
    assert(a.uni === b.uni)
    assert(a.bi === b.bi)
  }

  test("minBigramCount filters below the collect; n and uni stay exact") {
    val df = corpus.toDF("doc_id", "text")
    val full = frozenLm(df)
    val capped = frozenLm(df, minBigramCount = 2L)
    // the capped model IS the full model with rare bigram types absent
    assert(capped.n === full.n)
    assert(capped.uni === full.uni)
    assert(capped.bi === full.bi.filter(_._2 >= 2L))
    assert(capped.bi.size < full.bi.size, "fixture must have rare bigrams")
    // a doc whose bigrams all survive the cap scores bit-identically
    // ("the cat" appears twice in the corpus -> count 2)
    assert(scoreDoc(1L, "the cat", capped).avg_logprob ===
      scoreDoc(1L, "the cat", full).avg_logprob)
    // a dropped bigram ("cat sat": count 1) scores as unseen-bigram —
    // the pure interpolation term, with the TRUE n and unigram counts
    val s = scoreDoc(2L, "cat sat", capped)
    val pCat = full.uni("cat").toDouble / full.n
    val pSat = (1.0 - full.lambda) * full.uni("sat").toDouble / full.n
    assert(math.abs(s.avg_logprob -
      (math.log(pCat) + math.log(pSat)) / 2.0) < 1e-12)
  }

  test("maxVocab keeps top-k terms (count desc, term asc); dropped terms hit the Laplace floor") {
    val df = corpus.toDF("doc_id", "text")
    val full = frozenLm(df)
    val k = 3
    val capped = frozenLm(df, maxVocab = k)
    val expectVocab = full.uni.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(k).toMap
    assert(capped.uni === expectVocab)
    assert(capped.n === full.n, "n is the TRUE token total, pre-cap")
    // a dropped unigram scores like any OOV token: the Laplace floor
    val dropped = (full.uni.keySet -- capped.uni.keySet).head
    val s = scoreDoc(3L, dropped, capped)
    assert(math.abs(s.avg_logprob - math.log(1.0 / full.n)) < 1e-12)
    // bigrams whose endpoints fell out of the capped vocabulary drop
    // WITH it — a retained count against a floored unigram would be a
    // hybrid probability that is neither capped nor uncapped
    assert(capped.bi.keySet.forall(_.split(' ').forall(capped.uni.contains)),
      s"out-of-vocab bigram survived the cap: ${capped.bi.keySet}")
    assert(capped.bi === full.bi.filter(
      _._1.split(' ').forall(capped.uni.contains)))
  }
}
