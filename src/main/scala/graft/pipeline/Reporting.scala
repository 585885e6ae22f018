package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus composition reporting — the "data card" a training run
  * ships with: per (source, lang) document/token/byte counts and each
  * stratum's share of the corpus. This is the observability twin of
  * the curation operators ([[Sampling.temperatureMix]] consumes
  * exactly these stratum masses to set mixing weights; the report
  * makes them auditable).
  *
  * Scale shape: ONE full-corpus scan aggregated straight to stratum
  * grain (map-side partial aggregation — the wide `text` column never
  * shuffles; token counts reduce per-partition), then the global
  * totals come from a second aggregation over the ALREADY-AGGREGATED
  * stratum rows (|sources| × |langs| rows — broadcast back, never a
  * global window over the corpus). Shares are each a single division
  * of two exact integers, so the doubles are engine- and
  * partitioning-deterministic.
  */
object Reporting {

  /** One row per (source, lang): `n_docs`, `total_tokens`
    * (whitespace tokens — [[TextAnalysis.tokenCount]], the p16
    * definition), `total_chars` (driver-provided `n_chars`), and the
    * stratum's `doc_share` / `token_share` of the whole corpus.
    */
  def dataCard(docs: DataFrame): DataFrame = {
    val strata = docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
    val totals = strata.agg(
      sum(col("n_docs")).as("corpus_docs"),
      sum(col("total_tokens")).as("corpus_tokens"))
    strata.crossJoin(broadcast(totals))
      .select(col("source"), col("lang"),
        col("n_docs"), col("total_tokens"), col("total_chars"),
        (col("n_docs").cast("double") / col("corpus_docs")).as("doc_share"),
        (col("total_tokens").cast("double") / col("corpus_tokens"))
          .as("token_share"))
  }
}
