package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Funnel.analyze]]: track each
  * key's progress through an ordered step sequence online, emitting
  * ONE row per funnel ATTEMPT — immediately on conversion (last step
  * reached), or when event time passes the attempt's conversion
  * window (`t1 + windowMicros`, via the event-time timeout) with
  * however far it got.
  *
  * Two lifecycle modes:
  *  - `oncePerKey = false` (default): after an attempt closes, the
  *    key's state is REMOVED — a returning key starts a fresh
  *    attempt and emits again. State is fully self-cleaning (tracks
  *    keys inside an open window, not ever-seen keys, not the
  *    stream) — the mode that runs forever over a 100 TB/day
  *    clickstream. Batch parity holds per attempt; a key re-entering
  *    after expiry diverges from single-shot batch `Funnel.analyze`,
  *    which anchors once at the key's earliest step-1.
  *  - `oncePerKey = true`: a closed attempt leaves a done-tombstone
  *    and the key never emits again — STRICT batch parity for every
  *    replay, at the cost of one tombstone row per ever-seen key
  *    (the [[StreamingSessions]] stance).
  *
  * Parity contract (StreamingFunnelSpec): on in-order replay with
  * the watermark advanced past every window, emitted rows equal
  * batch `Funnel.analyze` (same strictness: step i counts only
  * strictly after step i-1; same step-1-anchored inclusive window) —
  * unconditionally under `oncePerKey = true`, and whenever keys
  * don't re-enter after expiry under the default. Within a
  * micro-batch the fold sorts by (ts, event_id) — the batch
  * operator's earliest-qualifying semantics. Cross-batch
  * out-of-order events inside the watermark advance the funnel only
  * forward (no retro-reordering) — the documented stance shared by
  * every streaming twin here.
  */
object StreamingFunnel {

  case class FunnelEvent(
      event_id: Long, key: Long, ts: Timestamp, event_type: String)

  case class FunnelState(step_times: Seq[Long], done: Boolean)

  case class FunnelResult(
      key: Long, furthest_step: Long, converted: Boolean,
      step_times_us: Seq[Long])

  /** `events` must already carry a watermark on `ts`. */
  def analyze(events: Dataset[FunnelEvent], steps: Seq[String],
      windowMicros: Long,
      oncePerKey: Boolean = false): Dataset[FunnelResult] = {
    require(steps.length >= 2, "a funnel needs at least two steps")
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // window expired: emit how far the attempt got, then free
            // the state (default) or leave a done-tombstone (oncePerKey)
            val times = state.get.step_times
            if (oncePerKey) state.update(FunnelState(Seq.empty, done = true))
            else state.remove()
            Iterator.single(FunnelResult(
              key, times.length.toLong, converted = false, times))
          } else if (state.getOption.exists(_.done)) {
            Iterator.empty // closed attempt, oncePerKey: ignore forever
          } else {
            val ordered = batch.toSeq
              .sortBy(e => (EventTime.micros(e.ts), e.event_id))
            var times = state.getOption.map(_.step_times).getOrElse(Seq.empty)
            var emitted: Option[FunnelResult] = None
            ordered.foreach { e =>
              if (emitted.isEmpty && times.length < steps.length &&
                e.event_type == steps(times.length)) {
                val us = EventTime.micros(e.ts)
                val qualifies =
                  if (times.isEmpty) true
                  else us > times.last && us - times.head <= windowMicros
                if (qualifies) {
                  times = times :+ us
                  if (times.length == steps.length) {
                    emitted = Some(FunnelResult(
                      key, steps.length.toLong, converted = true, times))
                  }
                }
              }
            }
            if (emitted.isDefined) {
              if (oncePerKey) state.update(FunnelState(Seq.empty, done = true))
              else state.remove()
              emitted.iterator
            } else if (times.nonEmpty) {
              state.update(FunnelState(times, done = false))
              // expire at t1 + window (inclusive bound: an event AT
              // the bound still qualifies — sum micros, truncate once)
              state.setTimeoutTimestamp((times.head + windowMicros) / 1000L + 1L)
              Iterator.empty
            } else Iterator.empty
          })(Encoders.product[FunnelState], Encoders.product[FunnelResult])
  }
}
