package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Streaming edition of the training-data curation pipeline
  * (batch version: `queries/PipelineQueries.scala` p15): documents
  * arrive as a stream, get quality-scored, content-deduped and
  * language-tagged continuously — the ingest-side shape of a corpus
  * that is crawled, not dumped.
  *
  * Scale/state story: the only stateful stage is the dedup, keyed by
  * content fingerprint with state bounded by the watermark horizon
  * (a fingerprint older than the delay can no longer recur-and-win,
  * so the store drops it — state is the fingerprint set within the
  * horizon, never the corpus). Quality scoring and language ID are
  * stateless scan expressions, identical codegen to the batch path.
  */
object StreamingCuration {

  /** quality-filter -> fingerprint-dedup -> language-tag a document
    * stream. `docs` needs `doc_id`, `text`, and an event-time column
    * (default `ingested_at`).
    */
  def curate(docs: DataFrame,
      minQuality: Double = 0.5,
      eventTimeCol: String = "ingested_at",
      watermarkDelay: String = "1 day"): DataFrame = {
    val scored = TextAnalysis.qualityFeatures(docs)
      .where(col("quality_score") >= minQuality)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    TextAnalysis.langId(
      scored
        .withWatermark(eventTimeCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("fp"))
  }

  /** Per-(language, window) corpus stats over the curated stream —
    * the continuously-updated version of p15's corpus summary.
    * Append-mode windowed aggregation: closed windows emit exactly
    * once, integral aggregates only (same determinism discipline as
    * the batch gate).
    */
  def corpusStats(curated: DataFrame,
      eventTimeCol: String = "ingested_at",
      window: String = "1 hour"): DataFrame =
    curated
      .groupBy(
        col("predicted_lang"),
        org.apache.spark.sql.functions.window(col(eventTimeCol), window).as("w"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("predicted_lang"), col("w.start").as("window_start"),
        col("n_docs"), col("total_tokens"))
}
