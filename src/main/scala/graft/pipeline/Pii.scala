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
}
