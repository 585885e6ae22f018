package graft.pipeline

import graft.SparkSpec

class LinesSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] =
    Lines.dedupLines(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))))
      .toMap

  test("a cross-doc repeated line survives only at its first occurrence") {
    val out = run(Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta"),
      (2L, "COOKIE BANNER\nunique gamma"),
      (3L, "unique delta\nCOOKIE BANNER")))
    assert(out(1L) === ((3L, 3L, "unique alpha\nCOOKIE BANNER\nunique beta")))
    assert(out(2L) === ((2L, 1L, "unique gamma")))
    assert(out(3L) === ((2L, 1L, "unique delta")))
  }

  test("within-doc repetition keeps only the earlier position") {
    val out = run(Seq((1L, "refrain\nverse\nrefrain")))
    assert(out(1L) === ((3L, 2L, "refrain\nverse")))
  }

  test("blank lines are always kept and never claim a winner slot") {
    // both docs have a blank middle line; doc 2's must survive even
    // though doc 1's came first
    val out = run(Seq(
      (1L, "a\n\nb"),
      (2L, "c\n\nd"),
      (3L, "   \ne"))) // whitespace-only counts as blank too
    assert(out(1L) === ((3L, 3L, "a\n\nb")))
    assert(out(2L) === ((3L, 3L, "c\n\nd")))
    assert(out(3L) === ((2L, 2L, "   \ne")))
  }

  test("first occurrence is the global (doc, pos) minimum, not per-doc") {
    // the dup appears at pos 1 of doc 1 and pos 0 of doc 2: doc 1
    // wins because doc id orders first
    val out = run(Seq(
      (1L, "x\nDUP"),
      (2L, "DUP\ny")))
    assert(out(1L)._3 === "x\nDUP")
    assert(out(2L)._3 === "y")
  }

  test("doc ids beyond 2^31 order correctly (no packed-long overflow)") {
    // with the old doc_id * 2^32 + pos packing, a 60-bit hash-derived
    // id overflows the BIGINT and can order BELOW a small id — the
    // small doc would lose its own first occurrence (round-6 advice
    // item 3). The struct min must keep doc 5's copy, not the huge id's.
    val huge = (1L << 60) + 7L
    val out = run(Seq(
      (5L, "SHARED\nmine"),
      (huge, "SHARED\nother")))
    assert(out(5L)._3 === "SHARED\nmine")
    assert(out(huge)._3 === "other")
  }

  test("a doc reduced to nothing yields an empty clean_text, not a lost row") {
    val out = run(Seq(
      (1L, "ONLY LINE"),
      (2L, "ONLY LINE")))
    assert(out(2L) === ((1L, 0L, "")))
    assert(out(1L) === ((1L, 1L, "ONLY LINE")))
  }

  test("trailing newline produces a kept trailing empty (blank) line") {
    val out = run(Seq((1L, "a\n")))
    assert(out(1L) === ((2L, 2L, "a\n")))
  }
}
