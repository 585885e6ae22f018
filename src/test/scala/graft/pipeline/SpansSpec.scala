package graft.pipeline

import graft.SparkSpec

class SpansSpec extends SparkSpec {

  import spark.implicits._

  // a 25-char payload shared verbatim by docs 1 and 2, embedded at
  // different offsets in otherwise-unique text
  private val shared = "SHARED-PAYLOAD-0123456789" // 25 chars
  private def corpus = Seq(
    (1L, s"unique prefix one $shared and a unique tail here"),
    (2L, s"z${shared}xcompletely different remainder text"),
    (3L, "totally unrelated content with no repeats at all xyz"),
    (4L, "tiny")) // shorter than k -> no windows
    .toDF("doc_id", "text")

  test("a cross-doc shared substring becomes one maximal span per doc") {
    val spans = Spans.duplicatedWindowSpans(corpus, k = 20)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("span_start"), r.getAs[Int]("span_len"))).toMap
    // doc1: shared starts at 18; doc2: at 1. A 25-char repeat under
    // k=20 marks 6 consecutive windows -> one span of exactly 25.
    assert(spans(1L) === ((18, 25)))
    assert(spans(2L) === ((1, 25)))
    assert(!spans.contains(3L))
    assert(!spans.contains(4L))
  }

  test("within-doc repetition is caught by the same occurrence count") {
    // the second occurrence is followed by 'x' (vs ' ' for the first)
    // so no straddling window accidentally repeats too
    val df = Seq(
      (1L, "A-REPEATED-CHUNK-HERE! filler A-REPEATED-CHUNK-HERE!x end"))
      .toDF("doc_id", "text")
    val spans = Spans.duplicatedWindowSpans(df, k = 20).collect()
      .map(r => (r.getAs[Int]("span_start"), r.getAs[Int]("span_len")))
      .sortBy(_._1)
    // both 22-char occurrences (offsets 0 and 30) emerge as spans
    assert(spans === Seq((0, 22), (30, 22)))
  }

  test("nearby shared regions merge into one maximal span") {
    // one long shared region -> every window inside is marked, one span
    // distinct chars flank the region in each doc, so the straddling
    // windows (X*19 + flank) stay unique
    val long = "X" * 60
    val df = Seq((1L, s"aa${long}Qbb"), (2L, s"cc ${long}Wdd")).toDF("doc_id", "text")
    val spans = Spans.duplicatedWindowSpans(df, k = 20)
      .where($"doc_id" === 1L).collect()
    assert(spans.length === 1)
    assert(spans.head.getAs[Int]("span_len") === 60)
    assert(spans.head.getAs[Int]("span_start") === 2)
  }

  test("removeDuplicatedSpans excises exactly the span characters") {
    val cleaned = Spans.removeDuplicatedSpans(corpus, k = 20)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) === "unique prefix one  and a unique tail here")
    assert(cleaned(2L) === "zxcompletely different remainder text")
    assert(cleaned(3L) === "totally unrelated content with no repeats at all xyz")
    assert(cleaned(4L) === "tiny")
  }

  test("overlapping char spans from separated window islands do not double-keep") {
    // doc where two marked islands produce overlapping char spans:
    // repeat a 20-char block, a 1-char wedge, then the same block
    val b = "B" * 20
    val df = Seq((1L, s"$b?$b"), (2L, s"pad $b more pad"), (3L, s"also $b here"))
      .toDF("doc_id", "text")
    val cleaned = Spans.removeDuplicatedSpans(df, k = 20)
      .where($"doc_id" === 1L).select("clean_text").as[String].collect().head
    // every B window is duplicated (3 docs share the block); doc1's
    // spans cover [0,20) and [21,41) at minimum - only "?" may survive
    assert(!cleaned.contains("B"))
  }
}
