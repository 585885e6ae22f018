package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.pipeline.Sequences.nextEventExamples]]:
  * autoregressive (context, label) training examples emitted ONLINE
  * as each key's events arrive — the continuous-training shape where
  * a sequence model's dataset grows with the stream instead of being
  * re-windowed from scratch every batch sweep.
  *
  * State = ONE row per key holding exactly the operator's look-back:
  * the last `window` event types (a ring of <= window strings) plus
  * the key's running position counter — O(window) per ever-seen key,
  * independent of stream length; the `flatMapGroupsWithState` shape
  * SURVEY §2.6 prescribes. No timers: an example is emittable the
  * moment its event arrives (the context is PAST-only), so output is
  * immediate and append-mode, no watermark-driven flush needed.
  *
  * Parity contract (StreamingSequencesSpec + the st23 gate): within a
  * micro-batch events fold in (ts, event_id) order — the batch
  * operator's exact window sort key — so replaying a bounded fixture
  * yields byte-identical rows to the batch window form. Events
  * arriving ACROSS micro-batches out of event-time order extend the
  * sequence in arrival order (the context a model would have ACTUALLY
  * seen online); full event-time resequencing is the batch operator's
  * job — the same stance as every streaming twin here.
  */
object StreamingSequences {

  case class SeqEvent(
      event_id: Long, user_id: Long, ts: Timestamp, event_type: String)

  /** recent = the last <= window event types, OLDEST FIRST; pos = the
    * key's 1-based event count so far.
    */
  case class SeqState(pos: Long, recent: Seq[String])

  case class SeqExample(
      user_id: Long, event_id: Long, pos: Long, context: String,
      label: String)

  /** `events` must already carry a watermark on `ts` (the harness
    * contract for bounded replays; the operator itself sets no
    * timers).
    */
  def examples(events: Dataset[SeqEvent], window: Int): Dataset[SeqExample] = {
    require(window > 0, s"window=$window must be positive")
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, batch: Iterator[SeqEvent],
         state: GroupState[SeqState]) => {
          val ordered = batch.toSeq
            .sortBy(e => (EventTime.micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SeqState(0L, Vector.empty))
          val out = Seq.newBuilder[SeqExample]
          ordered.foreach { e =>
            val pos = st.pos + 1
            if (pos > window)
              out += SeqExample(user, e.event_id, pos,
                st.recent.mkString(" "), e.event_type)
            st = SeqState(pos, (st.recent :+ e.event_type).takeRight(window))
          }
          state.update(st)
          out.result().iterator
        })(Encoders.product[SeqState], Encoders.product[SeqExample])
  }
}
