package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class C4CleanSpec extends SparkSpec {

  import spark.implicits._

  // multi-line punctuated fixture exercising every published rule
  private lazy val pages = Seq(
    // kept: three prose lines, each >= 3 words ending in punctuation
    (1L, "The quick brown fox jumps high.\nIt lands on soft grass!\n" +
      "Was that graceful enough?\nShort one.\nA plain sentence here.\n" +
      "Another proper sentence follows it."),
    // line screens: no terminal punct / too few words / javascript
    (2L, "this line has no terminal punctuation\nToo few.\n" +
      "Please enable javascript to continue browsing.\n" +
      "One good sentence survives here.\nAnd a second one does too!\n" +
      "Third sentence makes the count.\nFourth one keeps it going.\n" +
      "Fifth closes the page nicely."),
    // page ban: lorem ipsum
    (3L, "Lorem ipsum dolor sit amet.\nPerfectly fine sentence here.\n" +
      "Another fine sentence too.\nAnd more of them follow.\n" +
      "Plenty of sentences on this page."),
    // page ban: curly brace (code page)
    (4L, "function f() { return 1; }\nA real sentence lives here.\n" +
      "More sentences pad the page.\nYet another one lands.\n" +
      "Final sentence closes it."),
    // too few sentences after cleaning (< 5)
    (5L, "Only one proper sentence here.\nno punct so dropped\nTiny."),
    // empty page
    (6L, "")).toDF("doc_id", "text")

  test("published C4 rules: line screens, page bans, min sentences") {
    val v = C4Clean.pageVerdicts(pages)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // page 1: all rules pass — "Short one." (2 words) and the
    // unpunctuated/short lines screened; 5 sentences survive
    assert(!v(1L).getAs[Boolean]("page_dropped"))
    assert(v(1L).getAs[Long]("n_kept") === 5L)
    assert(!v(1L).getAs[String]("clean_text").contains("Short one."))

    // page 2: javascript line screened, 5 good sentences keep it
    assert(!v(2L).getAs[Boolean]("page_dropped"))
    assert(!v(2L).getAs[String]("clean_text").toLowerCase
      .contains("javascript"))

    // pages 3/4: banned phrases drop the whole page even though
    // individual lines pass
    assert(v(3L).getAs[Boolean]("page_dropped"))
    assert(v(4L).getAs[Boolean]("page_dropped"))

    // page 5: lines pass but < 5 sentences -> dropped
    assert(v(5L).getAs[Boolean]("page_dropped"))
    assert(v(5L).getAs[Long]("n_sentences") === 1L)

    // page 6: empty -> nothing kept, dropped, clean_text is '' not null
    assert(v(6L).getAs[Boolean]("page_dropped"))
    assert(v(6L).getAs[String]("clean_text") === "")

    val kept = C4Clean.cleanPages(pages)
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("pageVerdicts is row-local: zero exchanges in the physical plan") {
    val plan = C4Clean.pageVerdicts(pages).queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"C4 cleaning must be a pure scan-side map, found: $shuffles")
  }

  test("lineSep and rule parameters compose (the p113 gate config)") {
    val df = Seq((7L, "alpha beta gamma a delta epsilon zeta a xi"))
      .toDF("doc_id", "text")
    val v = C4Clean.pageVerdicts(df,
      C4Clean.Config(lineSep = " a ", terminalPunct = Some("[a-z]$"),
        minWordsPerLine = 3, banLineTokens = Seq("vector"),
        banPagePhrases = Seq("table table"), minSentences = 0,
        minKeptLines = 1, sentencePattern = "row")).head()
    assert(v.getAs[Long]("n_lines") === 3L)
    // "xi" fragment has < 3 words -> screened
    assert(v.getAs[Long]("n_kept") === 2L)
    assert(v.getAs[String]("clean_text") ===
      "alpha beta gamma\ndelta epsilon zeta")
  }
}
