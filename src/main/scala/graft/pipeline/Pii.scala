package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for pretraining corpora: replace e-mail addresses,
  * IPv4 addresses, SSN-shaped ids and phone-shaped numbers with
  * typed placeholder tokens, and count what was redacted (the counts
  * feed corpus audits; the placeholders keep the text well-formed for
  * tokenization).
  *
  * Rules apply IN ORDER on the progressively redacted text — order
  * is part of the contract (e.g. SSN before the looser phone shape,
  * so "123-45-6789" is one <SSN>, not a partial <PHONE> match), and
  * each rule's count is measured on the text as the previous rules
  * left it. Placeholder tokens contain no digits, so no rule can
  * re-match an earlier rule's output.
  *
  * Patterns are deliberately lookahead-free and backreference-free so
  * Java regex (Spark) and RE2 (DuckDB/Go) agree exactly.
  *
  * Scale shape: pure narrow column expressions (regexp_replace /
  * regexp_extract_all are codegen'd) — streams at scan speed, no
  * shuffle, composes with any curation stage.
  */
object Pii {

  /** (name, pattern, replacement) — name keys the emitted count
    * column `n_<name>`.
    */
  final case class Rule(name: String, pattern: String, replacement: String)

  val DefaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    Rule("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    Rule("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Adds `n_<rule>` counts and `redacted_text` (original `textCol`
    * kept untouched).
    */
  def redact(df: DataFrame, textCol: String = "text",
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    // fold the running text through the rules, counting each rule's
    // hits on the text as the previous rules left it
    val (out, redacted) = rules.foldLeft((df, col(textCol))) {
      case ((d, cur), Rule(name, pat, repl)) =>
        // materialize the running text so the count and the replace
        // read the SAME projected column (one regex pass each, and no
        // re-evaluation of the upstream replace chain per consumer)
        val step = d.withColumn(s"__pii_$name", cur)
        val c = col(s"__pii_$name")
        (step.withColumn(s"n_$name",
          size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")),
          regexp_replace(c, pat, repl))
    }
    rules.foldLeft(out.withColumn("redacted_text", redacted)) { (d, r) =>
      d.drop(s"__pii_${r.name}")
    }
  }

  /** k-anonymity suppression over quasi-identifier columns: keep only
    * rows whose EXACT combination of `quasiCols` values is shared by
    * at least `k` rows — the release rule that stops a rare attribute
    * combo (one document in a rare language from a tiny source, one
    * user in a small town with an uncommon device) from identifying
    * its subject in a published dataset or report. Survivors carry
    * their combo's `group_n` as the anonymity-set-size provenance.
    *
    * Scale shape: one count aggregation at the combo grain (map-side
    * combinable — the wire moves one long per combo per partition)
    * and one join back keyed by the same combo (co-partitioned with
    * the aggregation's exchange; AQE broadcasts the counts side when
    * the combo space is small). The row data shuffles once; no
    * window, no global sort. Null combo values group as SQL
    * grouping does (null == null for grouping) — a null-ridden combo
    * is itself a quasi-identifier and is suppressed by the same rule.
    */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k=$k must be >= 1")
    val keys = quasiCols.map(col)
    // null-SAFE join back: grouping already treats null == null, and
    // the join must agree — a plain equi-join would silently DROP
    // every null-valued combo instead of counting it (exactly the
    // quasi-identifier leak this operator exists to close)
    val counts = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("group_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("group_n"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(counts, cond)
      .where(col("group_n") >= k)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }
}
