package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign every document a
  * deterministic coordinate — (shard, chunk, offset) — in the
  * concatenated token stream a training loader reads, the GPT-style
  * "concatenate the corpus, slice it into fixed-length sequences"
  * scheme. The engine does the distributed part (stable order,
  * running token offsets, chunk arithmetic); the loader then knows
  * exactly which docs contribute to training sequence k of shard s
  * without ever materializing the concatenation.
  *
  * Shape and scale: documents are hashed into `nShards` independent
  * streams (md5-derived — partition/retry/engine-stable, the
  * [[Sampling]] discipline), and ALL per-doc math is a running sum
  * within the shard: ONE shuffle by shard, a per-shard sort, then
  * narrow arithmetic. At 100 TB pick nShards so a shard's token
  * stream fits a task comfortably (the window is linear per shard;
  * shard sizes concentrate tightly because assignment is hash-
  * uniform over docs). A GLOBAL document order would serialize the
  * corpus through one window partition — that formulation is wrong
  * at any scale, which is why shards are the unit here and chunk ids
  * are per-shard, not global.
  *
  * Docs STRADDLE chunk boundaries by design (`chunk_id` is where a
  * doc's FIRST token lands; `chunk_offset` its position inside that
  * chunk) — the loader slices exact `seqLen` windows downstream.
  * Zero-token docs occupy zero width: they inherit the running
  * offset and contribute nothing to it.
  */
object Packing {

  /** Deterministic shard for an id: 32 md5 bits of `id || "/pack"`
    * mod nShards — the same cross-engine variate family as
    * [[Sampling]] (`('0x'||substr(md5(id||'/pack'),1,8))::BIGINT %
    * nShards` in the oracle dialect).
    */
  def shardOf(id: Column, nShards: Int): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit("/pack"))), 1, 8),
      16, 10).cast("long"), lit(nShards.toLong))

  /** Pack a document table: one row per doc with its packing
    * coordinates.
    *
    * Output columns: `doc_id`, `shard`, `n_tokens` (whitespace
    * tokens — [[TextAnalysis.tokenCount]], the same count the p16
    * gate pins), `chunk_id` (which seqLen-sized training sequence of
    * the shard the doc starts in), `chunk_offset` (token position
    * inside that chunk). Within a shard, docs are ordered by id —
    * ids are unique (corpus invariant, see
    * [[Dedup.dropExactDuplicates]]), so the order, and therefore
    * every coordinate, is fully deterministic across partitionings,
    * retries and engines.
    */
  def packSequences(docs: DataFrame, seqLen: Int, nShards: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        shardOf(col(idCol), nShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        // integral floor division (tokens_before >= 0): stays exact at
        // any stream length, where a double `/` + cast would silently
        // round past 2^53 tokens — the determinism discipline is
        // integer arithmetic only (oracle: `tb // seqLen`)
        expr(s"tokens_before div CAST($seqLen AS BIGINT)").as("chunk_id"),
        (col("tokens_before") % seqLen).as("chunk_offset"))
  }

  /** Per-(shard, chunk) manifest of the packing: how many docs START
    * in each chunk and how many of its tokens they supply —
    * the loader's index, and the packing-quality observability
    * surface (a trailing partial chunk per shard is expected; many
    * under-full chunks mean seqLen or nShards is mis-sized relative
    * to doc lengths).
    */
  def chunkManifest(packed: DataFrame, idCol: String = "doc_id"): DataFrame =
    packed.groupBy(col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_started"),
        min(col(idCol)).as("first_doc_id"))
}
