package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize]]: gap-based
  * sessions over a live event stream, emitted as each session CLOSES
  * (either a later event opens the next session, or event time passes
  * `end + gap` via the watermark-driven timeout).
  *
  * State = ONE row per key: the open-session aggregate while a
  * session is live, then a seq-carrying tombstone after it closes
  * (so a returning key continues the batch operator's for-life
  * numbering instead of colliding at 0) — bounded by the ever-seen
  * key count, never the stream length; exactly the
  * `flatMapGroupsWithState` shape SURVEY §2.6 prescribes for custom
  * state.
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
            // keep a TOMBSTONE (n_events == 0) carrying the next
            // session_seq: removing state entirely would restart the
            // key's numbering at 0 and collide (user, session_seq)
            // keys downstream — the batch operator numbers for life.
            // No timeout on the tombstone; it is one tiny row per
            // ever-seen key, the same "irreducible state" stance as
            // StreamingAsof's current-state row.
            state.update(OpenSession(s.session_seq + 1, 0L, 0L, 0L, 0L, 0L))
            Iterator.single(ClosedSession(user, s.session_seq, s.start_us,
              s.end_us, s.n_events, s.n_purchases, s.value_cents))
          } else {
            // fold in the batch operator's exact sort order
            val ordered = batch.toSeq.sortBy(e => (EventTime.micros(e.ts), e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            // a tombstone (n_events == 0) is "no open session, next
            // seq = session_seq"
            var open = state.getOption.filter(_.n_events > 0)
            val nextSeq = state.getOption match {
              case Some(s) if s.n_events == 0 => s.session_seq
              case _ => 0L
            }
            ordered.foreach { e =>
              val us = EventTime.micros(e.ts)
              // HALF_UP (away from zero) like the batch twin's Spark
              // round(): math.round is half-toward-+inf, which diverges
              // on negative half-cents (-12.5 -> -12 vs batch -13)
              val cents = BigDecimal(e.value * 100)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
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
                  open = Some(OpenSession(nextSeq, us, us, 1L, purchase, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when event time passes end + gap (strictly after —
              // an event AT end+gap still joins the session, matching the
              // batch operator's inclusive threshold). Sum in MICROS
              // first, then truncate ONCE to ms: dividing each term
              // separately can land up to ~1 ms early.
              state.setTimeoutTimestamp((s.end_us + gapMicros) / 1000L + 1L)
            }
            closed.result().iterator
          })(Encoders.product[OpenSession], Encoders.product[ClosedSession])
  }
}
