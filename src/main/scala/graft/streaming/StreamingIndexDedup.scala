package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.pipeline.Dedup

/** ONLINE ingest dedup against the materialized LSH index — the
  * streaming face of the p19/p53 incremental-dedup loop: documents
  * arrive as a stream, each micro-batch candidate-joins the STATIC
  * band/shingle tables ([[Dedup.writeLshIndex]]'s layout) and
  * exact-verifies, so per-arrival cost scales with the batch while
  * the corpus is shingled exactly once (offline).
  *
  * Semantics are INDEX-WINS and BATCH-BLIND, the p19 ingestion
  * contract: a new doc is judged only against the index, never
  * against its micro-batch peers — so every verdict is a pure
  * per-row function of (doc, index), and the union of all batches'
  * outputs equals the one-shot batch [[Dedup.nearDupsAgainstIndex]]
  * over the same rows REGARDLESS of how arrival chopped them into
  * batches (the property the st17 gate hash-checks and the spec
  * proves batch-by-batch). Intra-batch duplicate pairs are the
  * ingestion loop's next index append's problem, exactly as in the
  * batch pipeline.
  *
  * Shape: `foreachBatch` — the per-batch chain needs multi-stage
  * aggregation (signatures, candidate dedup, verification counts)
  * that no single streaming output mode expresses; each micro-batch
  * runs the BATCH operator and commits verdicts to the sink.
  *
  * Failure semantics: the sink commit is REPLAY-IDEMPOTENT, which
  * with Structured Streaming's deterministic batch replay gives
  * effectively-once output. foreachBatch alone is at-least-once — a
  * crash between the parquet write and the checkpoint commit replays
  * the micro-batch — so each batch `mode("overwrite")`s its OWN
  * `batch=<id>` partition directory (the [[Dedup.writeLshIndex]]
  * `batch=` layout) instead of blind-appending to a shared one: the
  * replay rewrites the same partition with the same rows (verdicts
  * are a pure function of (doc, index) and the index is static for
  * the writer's lifetime), never duplicating. Readers take the sink
  * root as one partitioned table.
  */
object StreamingIndexDedup {

  /** One micro-batch, replay-idempotent: judge `batch` against the
    * static index and overwrite this batch's sink partition. Public
    * (not an inline lambda) so the replay property is directly
    * spec-testable — calling it twice with the same (batch, batchId)
    * must leave the sink row set unchanged.
    */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, threshold: Double, n: Int, numHashes: Int,
      rowsPerBand: Int): Unit = {
    // tiny batches: skip the persist (its unpersist-on-GC churn
    // outweighs the re-scan of an in-memory micro-batch)
    Dedup.nearDupsAgainstIndex(batch, indexPath, threshold,
      n, numHashes, rowsPerBand, persistShingles = false)
      .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
  }

  /** Writer committing (doc_new, doc_old, jaccard) verdict rows to
    * `outPath/batch=<id>` per micro-batch. Caller sets the checkpoint
    * location and starts it; AvailableNow + maxFilesPerTrigger
    * replays a bounded backlog in several genuine batches.
    */
  def verdictWriter(docs: DataFrame, indexPath: String, outPath: String,
      threshold: Double, n: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, outPath,
          threshold, n, numHashes, rowsPerBand)
      }
      .trigger(Trigger.AvailableNow())
}
