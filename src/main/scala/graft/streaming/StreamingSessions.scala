package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize]]: gap-based
  * sessions over a live event stream, emitted as each session CLOSES
  * (either a later event opens the next session, or event time passes
  * `end + gap` via the watermark-driven timeout).
  *
  * State = ONE open-session aggregate per key (7 numeric fields) —
  * bounded by the live-key count, never the stream length; exactly
  * the `flatMapGroupsWithState` shape SURVEY §2.6 prescribes for
  * custom state.
  *
  * Parity contract (StreamingSessionsSpec): replaying a bounded,
  * watermark-ordered fixture yields byte-identical session rows to
  * `Sessionize.sessionStats` on the same data. Within a micro-batch
  * events are folded in (ts, tie) order — `flatMapGroupsWithState`
  * guarantees no intra-batch order, so the fold sorts first, exactly
  * the batch operator's sort key. Events arriving ACROSS micro-batches
  * out of event-time order but inside the watermark extend the open
  * session like the batch resequencer would IF they fall after its
  * current end; an event EARLIER than the open session's start only
  * widens the span (batch parity holds for in-order replay, the
  * documented contract — same stance as the near-dup stream, which
  * trades full out-of-order resequencing for O(live keys) state).
  */
object StreamingSessions {

  case class SessionEvent(
      event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, value: Double)

  case class OpenSession(
      session_seq: Long, start_us: Long, end_us: Long,
      n_events: Long, n_purchases: Long, value_cents: Long)

  case class ClosedSession(
      user_id: Long, session_seq: Long, start_us: Long, end_us: Long,
      n_events: Long, n_purchases: Long, value_cents: Long)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** `events` must already carry a watermark on `ts`. */
  def sessions(events: Dataset[SessionEvent],
      gapMicros: Long): Dataset[ClosedSession] = {
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[SessionEvent],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.session_seq, s.start_us,
              s.end_us, s.n_events, s.n_purchases, s.value_cents))
          } else {
            // fold in the batch operator's exact sort order
            val ordered = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            ordered.foreach { e =>
              val us = micros(e.ts)
              val cents = math.round(e.value * 100)
              val purchase = if (e.event_type == "purchase") 1L else 0L
              open match {
                case Some(s) if us - s.end_us > gapMicros =>
                  closed += ClosedSession(user, s.session_seq, s.start_us,
                    s.end_us, s.n_events, s.n_purchases, s.value_cents)
                  open = Some(OpenSession(s.session_seq + 1, us, us,
                    1L, purchase, cents))
                case Some(s) =>
                  open = Some(s.copy(
                    start_us = math.min(s.start_us, us),
                    end_us = math.max(s.end_us, us),
                    n_events = s.n_events + 1,
                    n_purchases = s.n_purchases + purchase,
                    value_cents = s.value_cents + cents))
                case None =>
                  open = Some(OpenSession(0L, us, us, 1L, purchase, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when event time passes end + gap (strictly after —
              // an event AT end+gap still joins the session, matching the
              // batch operator's inclusive threshold)
              state.setTimeoutTimestamp(s.end_us / 1000L + gapMicros / 1000L + 1L)
            }
            closed.result().iterator
          })(Encoders.product[OpenSession], Encoders.product[ClosedSession])
  }
}
