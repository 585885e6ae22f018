package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful listing-lifetime tracking — the STREAMING edition of the
  * G4 demand semantics (SURVEY §2.4): a listing id that stops
  * appearing in snapshots was sold or expired. Batch G4 detects this
  * with day-pair anti-joins; here `flatMapGroupsWithState` keeps one
  * small state record per LIVE listing and emits a
  * [[Disappearance]] when the id has not been observed for
  * `gapHours` of EVENT time (event-time timeout — driven by the
  * watermark, so late re-observations inside the watermark still
  * extend a listing's life, and state size is bounded by the live-
  * listing count, never the stream length).
  *
  * Downstream, `disappearances.groupBy(item_id, date(last_seen))`
  * with `sum(quantity)` is the streaming gold_item_demand feed.
  */
object ListingLifetimes {

  case class ListingEvent(
      id: Long, item_id: Long, quantity: Long, created_at: Timestamp)

  case class ListingState(
      item_id: Long, quantity: Long, first_seen: Timestamp, last_seen: Timestamp)

  case class Disappearance(
      id: Long, item_id: Long, quantity: Long,
      first_seen: Timestamp, last_seen: Timestamp)

  /** `listings` must already carry a watermark on `created_at`
    * (e.g. `.withWatermark("created_at", "1 day")`).
    */
  def disappearances(listings: Dataset[ListingEvent],
      gapHours: Int = 36): Dataset[Disappearance] = {
    val gapMs = gapHours.toLong * 3600 * 1000
    listings
      .groupByKey(_.id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (id: Long, events: Iterator[ListingEvent], state: GroupState[ListingState]) =>
          if (state.hasTimedOut) {
            // unseen past the gap: the listing left the book
            val s = state.get
            state.remove()
            Iterator.single(Disappearance(
              id, s.item_id, s.quantity, s.first_seen, s.last_seen))
          } else {
            val obs = events.toSeq
            val merged = obs.foldLeft(state.getOption) { (acc, e) =>
              acc match {
                case None => Some(ListingState(
                  e.item_id, e.quantity, e.created_at, e.created_at))
                case Some(s) => Some(s.copy(
                  // latest snapshot's quantity wins — BY EVENT TIME, not
                  // iterator order (flatMapGroupsWithState gives no
                  // intra-batch ordering guarantee; on backfill several
                  // snapshots of one listing share a micro-batch).
                  // EQUAL timestamps break to the LARGER quantity —
                  // "before means keep old" would let iterator order
                  // decide ties (duplicate same-day rows / re-delivery)
                  quantity =
                    if (e.created_at.before(s.last_seen)) s.quantity
                    else if (e.created_at.after(s.last_seen)) e.quantity
                    else math.max(e.quantity, s.quantity),
                  first_seen = if (e.created_at.before(s.first_seen)) e.created_at else s.first_seen,
                  last_seen = if (e.created_at.after(s.last_seen)) e.created_at else s.last_seen))
              }
            }
            merged.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_seen.getTime + gapMs)
            }
            Iterator.empty
          })(Encoders.product[ListingState], Encoders.product[Disappearance])
  }
}
