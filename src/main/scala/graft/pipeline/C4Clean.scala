package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-family LINE-RULE cleaning (Raffel et al. 2020, §2.2): the
  * per-page pass that keeps only lines that look like prose and
  * drops pages that fail page-level screens — the other half of the
  * corpus-hygiene story next to [[Repetition]] (which screens on
  * REPEATED content; this screens on line/page SHAPE).
  *
  * Published C4 rules, each exposed as a config parameter (so a
  * deployment tunes them per corpus; the defaults are the paper's):
  *  - keep a line only if it ends in terminal punctuation,
  *  - ... and has at least `minWordsPerLine` words (paper: 3),
  *  - ... and mentions no banned token (paper: "javascript"),
  *  - drop the whole page on any banned phrase (paper: "lorem
  *    ipsum", "{"),
  *  - drop the page if fewer than `minSentences` sentences survive
  *    (paper: 5; sentences estimated by terminal-punct hits — the
  *    standard cheap proxy) or fewer than `minKeptLines` lines.
  *
  * Scale shape: ENTIRELY row-local — line split, predicate filter,
  * and rejoin run inside one projection via higher-order array
  * functions; there is no explode, no exchange, no per-line state.
  * A page is one row in and one row out with its verdict columns.
  * This is the operator family where "filter at the scan" is
  * literal: at 100 TB the whole pass is a map over the corpus scan.
  *
  * Reference framing: no counterpart in the reference platform (it
  * has no text pipeline); part of the SURVEY §2 training-data
  * extension families.
  */
object C4Clean {

  /** All rules parameterized; defaults = the published C4 values.
    * `terminalPunct` is a REGEX the trimmed line must match
    * (None disables the rule — e.g. for corpora with no punctuation);
    * ban lists match as lowercase substrings.
    */
  final case class Config(
      lineSep: String = "\n",
      terminalPunct: Option[String] = Some("[.!?\"”']$"),
      minWordsPerLine: Int = 3,
      banLineTokens: Seq[String] = Seq("javascript"),
      banPagePhrases: Seq[String] = Seq("lorem ipsum", "{"),
      minSentences: Int = 5,
      minKeptLines: Int = 1,
      sentencePattern: String = "[.!?]")

  val Default: Config = Config()

  private def keepLine(cfg: Config)(l: Column): Column = {
    val t = trim(l)
    val conds: Seq[Column] =
      Seq(size(array_remove(split(t, "\\s+"), "")) >= cfg.minWordsPerLine) ++
        cfg.terminalPunct.map(p => t.rlike(p)).toSeq ++
        cfg.banLineTokens.map(b => instr(lower(l), b.toLowerCase) === 0)
    conds.reduce(_ && _)
  }

  /** Per-page verdict frame: (doc_id, n_lines, n_kept, n_sentences,
    * page_dropped, clean_text). `clean_text` is the kept lines
    * rejoined with '\n' (empty string when nothing survives — the
    * filter below drops those pages via `minKeptLines`, but the
    * verdict frame reports them rather than hiding them).
    */
  def pageVerdicts(df: DataFrame, cfg: Config = Default,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), cfg.lineSep, -1)
    val kept = filter(lines, (l: Column) => keepLine(cfg)(l))
    val nSent = size(regexp_extract_all(
      array_join(kept, "\n"), lit(cfg.sentencePattern), lit(0))).cast("long")
    val banned = cfg.banPagePhrases
      .map(p => instr(lower(col(textCol)), p.toLowerCase) > 0)
      .foldLeft(lit(false))(_ || _)
    df.select(
      col(idCol).as("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      nSent.as("n_sentences"),
      (banned || nSent < cfg.minSentences ||
        size(kept) < cfg.minKeptLines).as("page_dropped"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** The cleaning pass itself: surviving pages with `text` replaced
    * by the kept lines. Same row-local plan — the verdict columns
    * compute inline; no join back to the input.
    */
  def cleanPages(df: DataFrame, cfg: Config = Default,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    pageVerdicts(df, cfg, textCol, idCol)
      .where(!col("page_dropped"))
      .select(col("doc_id"), col("clean_text").as(textCol))
}
