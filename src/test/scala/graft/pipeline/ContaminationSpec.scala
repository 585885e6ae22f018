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

  test("exciseOverlaps removes exactly the covered token windows") {
    val got = Contamination.exciseOverlaps(corpus, benchmark, n = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    // doc 1: grams "the quick brown fox jumps" (pos 0) and "quick
    // brown fox jumps over" (pos 1) hit -> union covers pos 0..5
    // ("the quick brown fox jumps over"); "the lazy dog today" stays
    assert(got(1L) === ((10L, 6L, "the lazy dog today")))
    // doc 3: gram at pos 0 covers 0..4; the tail survives
    assert(got(3L) === ((10L, 5L, "and over again and again")))
    // untouched and too-short docs pass through whole
    assert(got(2L)._2 === 0L)
    assert(got(2L)._3 === "completely novel words nothing shared here at all ok")
    assert(got(4L) === ((2L, 0L, "short doc")))
    // full coverage -> empty string, not a dropped row
    val tiny = Seq((7L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val all = Contamination.exciseOverlaps(tiny, benchmark, n = 5)
      .collect().head
    assert(all.getAs[Long]("n_removed") === 5L)
    assert(all.getAs[String]("clean_text") === "")
  }

  test("overlap counts distinct shingles, not occurrences") {
    val c = Seq((1L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    val b = Seq((9L, "x a b c d e y")).toDF("doc_id", "text")
    val r = Contamination.overlap(c, b, n = 5).collect().head
    // corpus doc repeats "a b c d e" shingles many times but each
    // distinct shingle counts once on each side
    assert(r.getAs[Long]("n_overlap") === 1L)
  }

  test("fingerprintOverlap catches edit-bridged quotes exact n-grams miss") {
    // the benchmark answer appears inside the corpus doc with the
    // words PUNCTUATION-joined: word-5-gram overlap sees zero shared
    // grams, but the shared character run still collides on winnowed
    // rolling-hash fingerprints
    val quote = "the quick brown fox jumps over the lazy dog again"
    val c = Seq(
      (1L, s"intro text then $quote and a long tail of words after"),
      (2L, "completely unrelated content with different characters"))
      .toDF("doc_id", "text")
    val b = Seq((9L, s"Q: what? A: $quote")).toDF("doc_id", "text")

    val exact = Contamination.overlap(
      c.withColumn("text",
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("text"), "fox jumps", "fox, jumps")),
      b, n = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet

    val fuzzy = Contamination.fingerprintOverlap(
      c.withColumn("text",
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.col("text"), "fox jumps", "fox, jumps")),
      b, window = 8, band = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_fp_hits")).toMap

    // doc 1 keeps long untouched char runs ("jumps over the lazy dog
    // again") -> fingerprint hits; doc 2 must not appear
    assert(fuzzy.contains(1L) && fuzzy(1L) >= 1L, s"fuzzy=$fuzzy")
    assert(!fuzzy.contains(2L))
    // the punctuation edit broke every shared word 5-gram spanning it;
    // if exact overlap ALSO caught doc 1 here the fixture is too easy
    // (it can: grams fully inside the untouched suffix) — the claim
    // we pin is only that fuzzy catches it
    assert(exact.subsetOf(Set(1L)))
  }

  test("fingerprintOverlap ratio: hits bounded by the doc's fingerprint count") {
    val c = Seq((1L, "shared text body here padded with extra words")).toDF("doc_id", "text")
    val b = Seq((9L, "shared text body here")).toDF("doc_id", "text")
    val r = Contamination.fingerprintOverlap(c, b).collect().head
    val (nf, nh, ratio) = (r.getAs[Long]("n_fps"), r.getAs[Long]("n_fp_hits"),
      r.getAs[Double]("fp_contamination"))
    assert(nh >= 1 && nh <= nf)
    assert(math.abs(ratio - nh.toDouble / nf) < 1e-15)
  }

  test("multiOverlap: per-benchmark rows equal single-benchmark overlap runs") {
    val benchB = Seq(
      (200L, "completely novel words nothing shared here at all maybe"))
      .toDF("doc_id", "text")
    val multi = Contamination.multiOverlap(corpus,
      Seq("a" -> benchmark, "b" -> benchB), n = 5).collect()
      .map(r => (r.getAs[String]("bench_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap")))
      .toMap
    for ((bid, bench) <- Seq("a" -> benchmark, "b" -> benchB)) {
      val single = Contamination.overlap(corpus, bench, n = 5).collect()
        .map(r => r.getLong(0) ->
          (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_overlap"))).toMap
      val got = multi.collect { case ((`bid`, id), v) => id -> v }.toMap
      assert(got === single, s"benchmark $bid")
    }
    // a doc contaminated against BOTH benchmarks appears once per bench
    assert(multi.keys.map(_._1).toSet === Set("a", "b"))
  }

  test("multiOverlap rejects duplicate benchmark ids") {
    intercept[IllegalArgumentException] {
      Contamination.multiOverlap(corpus,
        Seq("a" -> benchmark, "a" -> benchmark))
    }
  }
}
