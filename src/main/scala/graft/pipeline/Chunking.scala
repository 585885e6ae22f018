package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * windows with overlap — the step between tokenization and sequence
  * packing ([[Packing]]) in a training-data pipeline, and the unit of
  * retrieval indexing (each chunk gets its own embedding downstream).
  *
  * Contract (pinned by the p43 gate + ChunkingSpec):
  *  - tokens = [[TextAnalysis.tokens]] (whitespace split, empties
  *    dropped) — the same tokenizer as p16 token counts, so
  *    `sum(n_tokens per doc) >= p16 count` with equality iff
  *    overlap = 0.
  *  - chunk starts at token offsets 0, step, 2*step, ... with
  *    step = chunkTokens - overlap, while start < n_tokens; the last
  *    chunk is allowed to be short (no padding — that is [[Packing]]'s
  *    job). Every token lands in ceil(n/step) chunks' union; docs with
  *    zero tokens yield zero chunks.
  *  - chunk_id = start / step (dense 0-based ordinal within doc).
  *
  * Scale shape: one `posexplode`-free projection per row — the chunk
  * fan-out is a lateral `explode(sequence(...))` over start offsets,
  * so the only data growth is the output itself (x ~1/(1-overlap
  * ratio) of the corpus text), there is NO shuffle at all (narrow,
  * embarrassingly parallel, stays in whole-stage codegen), and a
  * 100 TB corpus chunks at scan speed. Skew-free by construction:
  * cost is per-document text length, never cross-document.
  */
object Chunking {

  def tokenChunks(docs: DataFrame, chunkTokens: Int, overlap: Int,
      docCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens=$chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap=$overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(docCol), toks.as("__w"))
      .where(size(col("__w")) > 0)
      .select(col(docCol),
        explode(sequence(lit(0), size(col("__w")) - 1, lit(step)))
          .as("__start"),
        col("__w"))
      .select(
        col(docCol),
        (col("__start") / step).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__w"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("__w")) - col("__start"))
          .cast("long").as("n_tokens"))
  }
}
