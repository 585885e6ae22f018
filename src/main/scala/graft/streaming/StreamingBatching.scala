package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online length-bucketed batch formation — the streaming face of
  * [[graft.pipeline.Packing.bucketedBatches]]: as documents arrive,
  * each is assigned its padded-batch coordinates (bucket, batch_id,
  * slot) for the loader that consumes the stream, with per-batch
  * padding waste bounded by the bucket width exactly as in the batch
  * operator.
  *
  * The one semantic the online form CANNOT offer is the batch form's
  * decorrelating md5 shuffle: a stream must batch in arrival order
  * (shuffling would require buffering the corpus). Slots are
  * therefore dealt in arrival order per bucket — the loader-side
  * online contract; run the offline operator for the shuffled
  * composition a training epoch wants. State = ONE long per bucket
  * (its dealt-slot count); buckets number ~(max doc length /
  * bucketWidth) — a handful — so total state is O(buckets), the
  * smallest in the streaming family.
  *
  * Determinism (st27 gate): within a micro-batch documents fold in
  * doc_id order, so a staged replay whose batch boundaries respect
  * doc_id order deals slots exactly as `row_number() OVER (PARTITION
  * BY bucket ORDER BY doc_id)` — the SQL-window oracle — while the
  * per-bucket counters genuinely persist across the batch boundary.
  */
object StreamingBatching {

  case class SlotDoc(doc_id: Long, n_tokens: Long)

  case class SlotState(dealt: Long)

  case class SlotAssigned(
      bucket: Long, doc_id: Long, n_tokens: Long, batch_id: Long, slot: Long)

  def assignSlots(docs: Dataset[SlotDoc], bucketWidth: Int,
      batchSize: Int): Dataset[SlotAssigned] = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    require(batchSize >= 1, s"batchSize=$batchSize must be >= 1")
    docs
      .groupByKey(d => d.n_tokens / bucketWidth)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (bucket: Long, batch: Iterator[SlotDoc],
         state: GroupState[SlotState]) =>
          MicroBatchFold(batch, state, SlotState(0L), (_: SlotDoc).doc_id) {
            (st, d) =>
              require(d.n_tokens >= 0,
                s"doc ${d.doc_id}: negative token count ${d.n_tokens}")
              (SlotState(st.dealt + 1),
                Some(SlotAssigned(bucket, d.doc_id, d.n_tokens,
                  st.dealt / batchSize, st.dealt % batchSize)))
          })(Encoders.product[SlotState], Encoders.product[SlotAssigned])
  }
}
