package graft.pipeline

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"), // contains bench 5-gram
    (2L, "completely novel words nothing shared here at all ok"),
    (3L, "quick brown fox jumps over and over again and again"), // shares the 5-gram too
    (4L, "short doc")                                            // < 5 tokens, no shingles
  ).toDF("doc_id", "text")

  private def benchmark = Seq(
    (100L, "we ask about the quick brown fox jumps over things")
  ).toDF("doc_id", "text")

  test("overlap reports shared distinct 5-grams per corpus doc") {
    val m = Contamination.overlap(corpus, benchmark, n = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap"))).toMap
    // bench 5-grams include "the quick brown fox jumps" and
    // "quick brown fox jumps over"
    assert(m(1L)._2 === 2L)
    assert(m(3L)._2 === 1L) // only "quick brown fox jumps over"
    assert(!m.contains(2L))
    assert(!m.contains(4L))
    // doc1 has 10 tokens -> 6 distinct 5-grams
    assert(m(1L)._1 === 6L)
  }

  test("decontaminate drops exactly the overlapping docs") {
    val kept = Contamination.decontaminate(corpus, benchmark, n = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 4L))
  }

  test("overlap counts distinct shingles, not occurrences") {
    val c = Seq((1L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    val b = Seq((9L, "x a b c d e y")).toDF("doc_id", "text")
    val r = Contamination.overlap(c, b, n = 5).collect().head
    // corpus doc repeats "a b c d e" shingles many times but each
    // distinct shingle counts once on each side
    assert(r.getAs[Long]("n_overlap") === 1L)
  }
}
