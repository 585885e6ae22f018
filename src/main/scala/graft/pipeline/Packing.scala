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

  /** Length-bucketed batch assembly — dynamic batching for padded
    * training/inference: documents bucket by token-length range
    * (`bucket = n_tokens div bucketWidth`, so per-batch padding waste
    * is bounded by the bucket width), each bucket's members are
    * deterministically shuffled by the md5 variate (batch composition
    * must not correlate with corpus order), and cut into
    * `batchSize`-sized batches. Output coordinates per doc:
    * `bucket`, `batch_id` (within its bucket), `slot` (position in
    * its batch) — the loader materializes batches by
    * (bucket, batch_id) and pads to the bucket ceiling.
    *
    * Scale shape: within-bucket ranks come from ONE range-partitioned
    * global sort over (bucket, variate, id)
    * ([[graft.operators.GlobalOrder.withGlobalRank]]) plus a
    * bucket-grain min-rank broadcast back — buckets are FEW and HUGE
    * by construction (a handful of length ranges over the whole
    * corpus), which is exactly the hot-partition shape a per-bucket
    * window sort dies on at 100 TB; the range sort spreads every
    * bucket across tasks. Ranks are a pure function of the total
    * (bucket, u, id) order — deterministic across runs,
    * partitionings and engines.
    */
  def bucketedBatches(docs: DataFrame, bucketWidth: Int, batchSize: Int,
      idCol: String = "doc_id", textCol: String = "text",
      salt: String = "batch"): DataFrame =
    bucketedBatchesFromCounts(
      docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens")),
      bucketWidth, batchSize, idCol, "n_tokens", salt)

  /** [[bucketedBatches]] over a PRECOMPUTED token-count column — the
    * composed-pipeline entry point (an upstream stage already paid
    * for the token counts; re-reading text to recount would violate
    * the read-the-corpus-once discipline). All OTHER input columns
    * pass through to the output (so a composed pipeline's provenance
    * — source, n_repeats — rides the batch coordinates without a
    * second probe of the upstream chain). A NULL token count buckets
    * as the NULL bucket and still receives coordinates (the offsets
    * join-back is null-SAFE; a plain equi-join would silently drop
    * exactly the rows a malformed-text audit needs to see).
    */
  def bucketedBatchesFromCounts(docs: DataFrame, bucketWidth: Int,
      batchSize: Int, idCol: String, tokensCol: String,
      salt: String = "batch"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")
    require(tokensCol == "n_tokens" || !docs.columns.contains("n_tokens"),
      "docs already has an n_tokens column distinct from tokensCol — " +
        "rename one (the output's count column is named n_tokens)")
    // The output claims bucket/batch_id/slot; an input column of the
    // same name would be silently overwritten, breaking the
    // "all other input columns pass through" contract — reject loudly.
    Seq("bucket", "batch_id", "slot").foreach { c =>
      require(!docs.columns.contains(c),
        s"docs already has a '$c' column — the batch coordinates are " +
          "emitted under that name; rename the input column")
    }
    require(!docs.columns.exists(_.startsWith("__bb_")),
      "docs columns may not use the reserved __bb_ prefix")
    val passthrough =
      docs.columns.filter(c => c != idCol && c != tokensCol && c != "n_tokens")
    val base = docs
      .withColumn("n_tokens", col(tokensCol).cast("long"))
      .withColumn("bucket",
        expr(s"n_tokens div CAST($bucketWidth AS BIGINT)"))
      .withColumn("__bb_u", Sampling.uniform(col(idCol), salt))
    val ranked = graft.operators.GlobalOrder.withGlobalRank(
      base, "__bb_g", Seq(col("bucket").asc, col("__bb_u").asc, col(idCol).asc))
    val offsets = ranked.groupBy(col("bucket"))
      .agg(min(col("__bb_g")).as("__bb_first"))
      .select(col("bucket").as("__bb_ob"), col("__bb_first"))
    ranked.join(broadcast(offsets), col("bucket") <=> col("__bb_ob"))
      .withColumn("__bb_r", col("__bb_g") - col("__bb_first")) // 0-based in bucket
      .select(col(idCol) +: col("n_tokens") +:
        passthrough.map(col) :+ col("bucket") :+
        expr(s"__bb_r div CAST($batchSize AS BIGINT)").as("batch_id") :+
        (col("__bb_r") % batchSize).as("slot"): _*)
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

  /** Training-export writer: materialize the corpus as `nShards`
    * hash-sharded parquet directories (`shard=<s>/...`) and return a
    * per-shard manifest computed by reading BACK the files just
    * written — the manifest certifies the round trip (what a training
    * loader will actually see), not the writer's intent.
    *
    * Shape and scale: shard assignment is the same md5 variate as
    * [[packSequences]] (deterministic across engines/retries; docs
    * hash-uniform over shards), the write is ONE shuffle to shard
    * grain (`repartition($"shard")` → `partitionBy("shard")`, so each
    * task owns whole shard directories and writes one file per shard
    * instead of `tasks × shards` small files — the small-files
    * failure mode at 100 TB), and the manifest is a read-back scan of
    * only the columns it aggregates (parquet column pruning: text
    * never leaves the files). `xor_h60` is a bitwise-XOR fold of each
    * doc's 60-bit md5 content hash — order-independent and
    * overflow-free where a SUM of 2^60-scale values would wrap, so
    * identical corpora produce identical checksums under any
    * partitioning; any dropped/duplicated/corrupted row flips it.
    */
  /** JSONL training export — the format most training loaders
    * actually consume: one `{"doc_id":…,"text":…}` object per line,
    * hash-sharded into `shard=<s>/` directories (same md5 variate and
    * one-shuffle write shape as [[writeShards]]). The manifest is
    * computed ENTIRELY from the read-back files — token counts and
    * the per-shard XOR content checksum derive from the text as a
    * JSONL reader will see it, so the gate certifies the full encode
    * → escape → decode round trip (a JSON-escaping bug on any quote,
    * backslash, control char or non-ASCII code point flips xor_h60),
    * not just the writer's accounting.
    */
  def writeJsonlShards(docs: DataFrame, nShards: Int, path: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    docs
      .select(col(idCol), shardOf(col(idCol), nShards).as("shard"),
        col(textCol))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(path)
    docs.sparkSession.read
      // explicit schema (inference would re-scan every shard), taken
      // from the INPUT's actual field types — a hardcoded LONG would
      // silently null out a string id column under PERMISSIVE parsing
      .schema(org.apache.spark.sql.types.StructType(Seq(
        docs.schema(idCol), docs.schema(textCol))))
      .json(path)
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("total_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"),
        bit_xor(graft.functions.Md5Hash.h60(col(textCol))).as("xor_h60"))
  }

  def writeShards(docs: DataFrame, nShards: Int, path: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    docs
      .select(col(idCol),
        shardOf(col(idCol), nShards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"),
        graft.functions.Md5Hash.h60(col(textCol)).as("h60"),
        // the training content itself — the export is the corpus, not
        // just its accounting; the manifest read-back below still never
        // pays for this column (parquet pruning, PlanSpec-guarded)
        col(textCol))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    docs.sparkSession.read.parquet(path)
      // partition-directory column comes back as the inferred INT type;
      // pin the contract type
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"),
        bit_xor(col("h60")).as("xor_h60"))
  }
}
