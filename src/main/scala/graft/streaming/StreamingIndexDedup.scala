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
  * runs the BATCH operator and appends verdicts to the sink. That is
  * also the production deployment: checkpointed micro-batch ingest
  * with exactly-once parquet appends per epoch.
  */
object StreamingIndexDedup {

  /** Writer that appends (doc_new, doc_old, jaccard) verdict rows to
    * `outPath` per micro-batch. Caller sets the checkpoint location
    * and starts it; AvailableNow + maxFilesPerTrigger replays a
    * bounded backlog in several genuine batches.
    */
  def verdictWriter(docs: DataFrame, indexPath: String, outPath: String,
      threshold: Double, n: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // tiny batches: skip the persist (its unpersist-on-GC churn
        // outweighs the re-scan of an in-memory micro-batch)
        Dedup.nearDupsAgainstIndex(batch, indexPath, threshold,
          n, numHashes, rowsPerBand, persistShingles = false)
          .write.mode("append").parquet(outPath)
        ()
      }
      .trigger(Trigger.AvailableNow())
}
