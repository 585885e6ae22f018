package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

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

  /** Streaming MINHASH near-dup suppression — the batch
    * [[graft.pipeline.Dedup.minHashNearDups]] dedup class on a
    * stream, where [[curate]]'s fingerprint dedup only catches
    * canonical-exact duplicates.
    *
    * Shape: each document's LSH band buckets are computed in-scan
    * ([[Dedup.minHashBandBuckets]] — same hash family as batch, so
    * signatures are identical), the doc explodes into one row per
    * band, `dropDuplicatesWithinWatermark` keeps the FIRST row per
    * (band, bucket), and a doc survives iff ALL its bands were
    * first-seen — any collided band means a prior in-horizon doc was
    * a near-dup candidate. The second stateful stage (windowed count
    * of surviving bands) emits exactly the keepers once their window
    * closes.
    *
    * Semantics vs batch: candidate-level dedup — LSH banding WITHOUT
    * the exact-Jaccard verify join (verification would require
    * retaining every prior doc's shingle set in state; banding
    * parameters tune the FP rate exactly as in batch LSH). State =
    * band buckets within the watermark horizon, never the corpus —
    * the same bound as [[curate]]'s fingerprint store, x numBands.
    *
    * Arrival order decides keepers (first-wins, the streaming analog
    * of batch's min-id keeper).
    */
  def nearDupKeepers(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4,
      eventTimeCol: String = "ingested_at",
      watermarkDelay: String = "1 day",
      emitWindow: String = "1 hour"): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val exploded = docs
      .select(col("doc_id"), col("text"), col(eventTimeCol),
        explode(Dedup.minHashBandBuckets(
          col("doc_id"), col("text"), n, numHashes, rowsPerBand)).as("__bb"))
      .select(col("doc_id"), col("text"), col(eventTimeCol),
        col("__bb.band").as("__band"), col("__bb.bucket").as("__bucket"))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__band", "__bucket")
    exploded
      .groupBy(window(col(eventTimeCol), emitWindow), col("doc_id"))
      .agg(count(lit(1)).as("__kept_bands"), first(col("text")).as("text"))
      .where(col("__kept_bands") === numBands)
      .select(col("doc_id"), col("text"), col("window.start").as("window_start"))
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
