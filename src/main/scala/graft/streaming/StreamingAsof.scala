package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Asof.joinAsOf]]: enrich a
  * probe stream with the latest state row at-or-before each probe's
  * event time, per key — the "attach the current quote to every
  * trade" shape, online.
  *
  * Both sides arrive as ONE interleaved stream of [[AsofInput]] rows
  * (`is_state` flags the side) — the same union the batch operator
  * builds internally, here so a single `flatMapGroupsWithState`
  * sees each key's full timeline. State kept per key is a bounded
  * RING of recent state rows (event-time sorted), NOT the stream
  * history: probes bind to the latest state <= their time, so a
  * state row older than the newest pre-watermark row can never be
  * referenced again and is pruned each batch; `keepStates` is the
  * hard cap on top. Idle keys converge to ONE retained row (the
  * current state), the irreducible minimum for this semantics.
  *
  * Parity contract (StreamingAsofSpec): on in-order replay, emitted
  * enrichments equal batch `joinAsOf(allowExactMatches = true)` rows
  * (no tolerance). Within a micro-batch the fold sorts by
  * (ts, is_state DESC, id) — states first at equal time, the batch
  * operator's exact tie order. A probe arriving BEFORE any
  * state <= its time emits an unenriched row immediately (null
  * state fields), exactly like the batch left join; a state arriving
  * later cannot retro-upgrade it (append-mode streams don't retract
  * — the documented gap vs batch for out-of-order cross-batch
  * arrivals, same stance as the other streaming twins).
  */
object StreamingAsof {

  case class AsofInput(
      id: Long, key: Long, ts: Timestamp, is_state: Boolean, value: Double)

  case class StateRing(rows: Seq[(Long, Long, Double)]) // (ts_us, id, value)

  case class Enriched(
      id: Long, key: Long, ts_us: Long,
      state_id: Option[Long], state_ts_us: Option[Long],
      state_value: Option[Double])

  /** `inputs` must already carry a watermark on `ts`. */
  def enrich(inputs: Dataset[AsofInput],
      keepStates: Int = 8): Dataset[Enriched] = {
    inputs
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, batch: Iterator[AsofInput], state: GroupState[StateRing]) => {
          // batch operator's sort: time asc, state side first, id asc
          val ordered = batch.toSeq.sortBy(e => (EventTime.micros(e.ts), !e.is_state, e.id))
          var ring = state.getOption.map(_.rows).getOrElse(Seq.empty)
          val out = Seq.newBuilder[Enriched]
          ordered.foreach { e =>
            val us = EventTime.micros(e.ts)
            if (e.is_state) {
              // insert in event-time order, keep the newest keepStates
              ring = (ring :+ ((us, e.id, e.value)))
                .sortBy(r => (r._1, r._2)).takeRight(keepStates)
            } else {
              val m = ring.filter(_._1 <= us).lastOption
              out += Enriched(e.id, key, us,
                m.map(_._2), m.map(_._1), m.map(_._3))
            }
          }
          // semantic prune: rows strictly older than the newest row at
          // or before the watermark can never again be "latest <= probe
          // time" for any admissible probe — drop them; the newest
          // pre-watermark state persists indefinitely (a quote binds
          // trades forever until superseded), so idle keys keep ONE row
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val newestCovered = ring.lastIndexWhere(_._1 <= wmUs)
          if (newestCovered > 0) ring = ring.drop(newestCovered)
          state.update(StateRing(ring))
          out.result().iterator
        })(Encoders.product[StateRing], Encoders.product[Enriched])
  }
}
