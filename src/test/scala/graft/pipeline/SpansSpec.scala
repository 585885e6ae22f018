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

  test("maximal substrings: aligned matches are exact, maximal, and length-thresholded") {
    val out = Spans.maximalDuplicateSubstrings(corpus, k = 20, minLen = 25)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Int]("pos_a"),
        r.getAs[Long]("doc_b"), r.getAs[Int]("pos_b"),
        r.getAs[Int]("match_len")))
    // exactly ONE maximal match: the 25-char payload at doc1 offset
    // 18 vs doc2 offset 1 — certified maximal (chars on both sides
    // differ), length exactly 25, canonical (doc_a < doc_b)
    assert(out.toSeq === Seq((1L, 18, 2L, 1, 25)))
    // threshold: at minLen 26 the same corpus yields nothing
    assert(Spans.maximalDuplicateSubstrings(corpus, k = 20, minLen = 26)
      .count() === 0L)
  }

  test("maximal substrings: island merge is NOT a match — different partners split") {
    // doc1 holds A+B (40 chars); doc2 shares A plus B's first 19
    // chars, doc3 shares A's last 19 chars plus B. Every window
    // position across doc1's 40-char region is duplicated somewhere,
    // so p27's island logic merges it into ONE 40-char span — but no
    // 40-char string repeats verbatim anywhere. The chain rule must
    // instead emit the three true maximal matches (39/39/38 chars),
    // each pinned to its actual partner alignment.
    val a = "FIRST-BLOCK-20-CHARS" // 20
    val b = "SECND-BLOCK-20-CHARS" // 20
    val df = Seq(
      (1L, s"xx$a$b!yy"),
      (2L, s"aa $a${b.substring(0, 19)}. zz"),
      (3L, s"bb. ${a.substring(1)}$b? qq"))
      .toDF("doc_id", "text")
    val island = Spans.duplicatedWindowSpans(df, k = 20)
      .where($"doc_id" === 1L).collect()
      .map(r => (r.getAs[Int]("span_start"), r.getAs[Int]("span_len")))
    assert(island.toSeq === Seq((2, 40)),
      s"precondition: the island view merges the region: ${island.toSeq}")
    val matches = Spans.maximalDuplicateSubstrings(df, k = 20, minLen = 20)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Int]("pos_a"),
        r.getAs[Long]("doc_b"), r.getAs[Int]("pos_b"),
        r.getAs[Int]("match_len"))).sortBy(t => (t._1, t._3, t._2))
    assert(matches.toSeq === Seq(
      (1L, 2, 2L, 3, 39), (1L, 3, 3L, 4, 39), (2L, 4, 3L, 4, 38)),
      s"chain extension must split mixed-partner islands: ${matches.toSeq}")
  }

  test("maximal substrings: within-doc repetition pairs on one diagonal") {
    val chunk = "A-REPEATED-CHUNK-HERE!" // 22 chars
    val df = Seq((1L, s"$chunk filler ${chunk}x end"))
      .toDF("doc_id", "text")
    val out = Spans.maximalDuplicateSubstrings(df, k = 20, minLen = 22)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Int]("pos_a"),
        r.getAs[Long]("doc_b"), r.getAs[Int]("pos_b"),
        r.getAs[Int]("match_len")))
    // one self-pair: offsets 0 and 30, exactly the 22 shared chars
    assert(out.toSeq === Seq((1L, 0, 1L, 30, 22)))
  }

  test("keep-first excision: only the doc_b occurrences go; the earliest survives") {
    val cleaned = Spans.removeMaximalDuplicates(corpus, k = 20, minLen = 25)
      .select($"doc_id", $"clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc1 holds the FIRST occurrence of the shared payload — kept
    assert(cleaned(1L) === s"unique prefix one $shared and a unique tail here")
    assert(cleaned(2L) === "zxcompletely different remainder text")
    assert(cleaned(3L) === "totally unrelated content with no repeats at all xyz")
    assert(cleaned(4L) === "tiny")
  }

  test("keep-first excision: transitive groups keep exactly the earliest member") {
    val chunk = "A-REPEATED-CHUNK-HERE!" // 22 chars
    // every occurrence flanked by DISTINCT chars so no match extends
    // past the chunk itself
    val df = Seq((1L, s"0${chunk}A1${chunk}B2${chunk}C"))
      .toDF("doc_id", "text")
    val cleaned = Spans.removeMaximalDuplicates(df, k = 20, minLen = 22)
      .select($"clean_text").as[String].collect().head
    // occurrences at 1, 25, 49 -> pairs (1,25), (1,49), (25,49);
    // occurrences 2 and 3 are doc_b sides and excise, the first stays
    assert(cleaned === s"0${chunk}A1B2C", s"got: $cleaned")
  }

  test("maximal substrings: a capped INTERIOR window bridges — the match stays whole") {
    // a rare 60-char duplicate whose middle 20 chars are a
    // corpus-hot block (present in 10 other docs): the hot window's
    // hash is df-capped out of pairing, leaving a 1-position gap in
    // the diagonal run. The flanking matches PROVE the gap content
    // equal (their char intervals overlap it), so the run merge
    // bridges gaps <= k-1 and the match must come out whole — not
    // as two understated fragments.
    val r1 = "RARE-LEFT-CTX-20CHAR" // 20
    val r2 = "RARE-RIGHT-CTX-20CHR" // 20
    val hot = "H" * 20
    val shared = r1 + hot + r2 // 60 chars, duplicated exactly twice
    val df = (Seq(
      (1L, s"aaaa$shared"),
      (2L, s"bb $shared")) ++
      (3L to 12L).map(i => (i, s"filler${i - 3} $hot tail${i - 3}")))
      .toDF("doc_id", "text")
    val out = Spans.maximalDuplicateSubstrings(df, k = 20, minLen = 40,
      maxOcc = 5)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Int]("pos_a"),
        r.getAs[Long]("doc_b"), r.getAs[Int]("pos_b"),
        r.getAs[Int]("match_len")))
    assert(out.toSeq === Seq((1L, 4, 2L, 3, 60)),
      s"interior capped window must bridge, not fragment: ${out.toSeq}")
  }

  test("maximal substrings: the df-cap excludes hot hashes and the audit surfaces them") {
    val hot = "Z" * 25 // every doc shares it -> its windows are hot
    val df = (1L to 6L).map(i => (i, s"doc$i pad $hot tail$i"))
      .toDF("doc_id", "text")
    // cap at 5: the 6-occurrence windows are excluded from pairing
    assert(Spans.maximalDuplicateSubstrings(df, k = 20, minLen = 20,
      maxOcc = 5).count() === 0L)
    val audit = Spans.overloadedWindowHashes(df, k = 20, maxOcc = 5)
      .collect().map(_.getAs[Long]("nocc"))
    // shared-boundary windows occur 6× (once per doc); the all-Z
    // interior windows are IDENTICAL at every offset, so one hash
    // carries 6 docs × 6 positions = 36
    assert(audit.nonEmpty && audit.forall(_ > 5L) && audit.contains(36L),
      s"capped hashes must surface in the audit: ${audit.toSeq}")
  }
}
