package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The deterministic micro-batch fold discipline shared by the
  * quota/batching operators ([[StreamingAdmission]],
  * [[StreamingBatching]]): documents fold in `sortKey` order within
  * the batch, state reads get-or-init once, updates once after the
  * fold. Centralized because the staged-replay oracles (st24, st26,
  * st27) assume EXACTLY this in-batch order contract — three
  * divergent copies of it would let one operator silently break the
  * shared assumption.
  */
private[streaming] object MicroBatchFold {
  def apply[D, K: Ordering, S, O](batch: Iterator[D],
      state: GroupState[S], init: => S, sortKey: D => K)(
      step: (S, D) => (S, Option[O])): Iterator[O] = {
    val ordered = batch.toSeq.sortBy(sortKey)
    var st = state.getOption.getOrElse(init)
    val out = Seq.newBuilder[O]
    ordered.foreach { d =>
      val (next, o) = step(st, d)
      st = next
      o.foreach(out += _)
    }
    state.update(st)
    out.result().iterator
  }
}

/** Streaming per-source admission cap — ingestion-time quota control:
  * each source (domain, crawl feed, data vendor) may contribute at
  * most `k` documents to the corpus, enforced ONLINE as documents
  * arrive, so an erupting source (a crawler loop, a spam domain) is
  * throttled at the door instead of ballooning the lake and being
  * cut later by the batch cap ([[graft.pipeline.Sampling.topKByStratum]]
  * is the batch face: best-k by quality over the landed corpus; this
  * is the streaming face: first-k by arrival under a hard quota).
  *
  * State = ONE long per ever-seen source (its admitted count) — O(1)
  * per key, the smallest possible streaming state; no timers, no
  * watermark dependence (admission is decidable the moment a document
  * arrives). Output is append-only: admitted documents with their
  * 1-based `admit_seq` provenance (the quota slot they consumed);
  * rejected documents emit nothing (the quota answer a router needs).
  *
  * Determinism contract (StreamingAdmissionSpec + the st24 gate):
  * within a micro-batch, documents fold in `doc_id` order (the crawl
  * sequence number — documents carry no event time), so a staged
  * replay whose batch boundaries respect doc_id order admits exactly
  * the window form's `row_number() OVER (PARTITION BY source ORDER BY
  * doc_id) <= k` set. Across batches the counter persists: a source
  * that exhausts its quota in batch N rejects everything after,
  * which is precisely the online semantics.
  */
object StreamingAdmission {

  case class AdmitDoc(doc_id: Long, source: String)

  case class AdmitState(admitted: Long)

  case class Admitted(source: String, doc_id: Long, admit_seq: Long)

  def admit(docs: Dataset[AdmitDoc], k: Long): Dataset[Admitted] = {
    require(k > 0, s"k=$k must be positive")
    docs
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, batch: Iterator[AdmitDoc],
         state: GroupState[AdmitState]) =>
          MicroBatchFold(batch, state, AdmitState(0L), (_: AdmitDoc).doc_id) {
            (st, d) =>
              if (st.admitted < k)
                (AdmitState(st.admitted + 1),
                  Some(Admitted(source, d.doc_id, st.admitted + 1)))
              else (st, None)
          })(Encoders.product[AdmitState], Encoders.product[Admitted])
  }

  case class TokenDoc(doc_id: Long, source: String, n_tokens: Long)

  /** `closed` latches at the first overflow — see [[admitTokens]]. */
  case class TokenState(tokens: Long, closed: Boolean)

  case class TokenAdmitted(
      source: String, doc_id: Long, n_tokens: Long, tokens_before: Long)

  /** [[admit]]'s TOKEN-grain sibling: each source may contribute at
    * most `budget` TOKENS (the unit training budgets are written in),
    * admitted in arrival order. The quota CLOSES at the first
    * overflow — a later, smaller document never slips in past a
    * rejected one, so the admitted set is always a PREFIX of the
    * source's arrival order (exactly the docs whose running token
    * total fits the budget — an auditable, engine-checkable
    * invariant; first-fit packing would make the admitted set depend
    * on arrival interleaving beyond the boundary and be expressible
    * only as an order-dependent fold). State = one (long, bool) per
    * source. Admitted rows carry `tokens_before` — the quota already
    * consumed when they arrived — as provenance.
    */
  def admitTokens(docs: Dataset[TokenDoc],
      budget: Long): Dataset[TokenAdmitted] = {
    require(budget > 0, s"budget=$budget must be positive")
    docs
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, batch: Iterator[TokenDoc],
         state: GroupState[TokenState]) =>
          MicroBatchFold(batch, state, TokenState(0L, closed = false),
            (_: TokenDoc).doc_id) { (st, d) =>
            // a negative count would silently reopen spent headroom and
            // break the prefix == cumsum audit invariant — fail loudly
            require(d.n_tokens >= 0,
              s"doc ${d.doc_id}: negative token count ${d.n_tokens}")
            if (st.closed) (st, None)
            else if (st.tokens + d.n_tokens <= budget)
              (st.copy(tokens = st.tokens + d.n_tokens),
                Some(TokenAdmitted(source, d.doc_id, d.n_tokens, st.tokens)))
            else (st.copy(closed = true), None)
          })(Encoders.product[TokenState], Encoders.product[TokenAdmitted])
  }
}
