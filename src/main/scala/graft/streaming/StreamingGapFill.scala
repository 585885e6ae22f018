package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming gap-fill — the stateful edition of the batch
  * [[graft.operators.Resample]] trio: per-key daily observations
  * arrive on a stream, and each arrival EMITS the gap days since the
  * key's previous observation plus the observation day itself, under
  * one of three fill modes:
  *
  *  - `locf` — gap days carry the PREVIOUS value forward
  *    ([[Resample.gapFillDaily]]'s twin; st42);
  *  - `interp` — gap days interpolate linearly between the previous
  *    and the arriving observation ([[gapFillInterpolate]]'s twin;
  *    st43). Interpolation is exactly what retroactive emission
  *    buys: the forward anchor a batch window must SEARCH for is the
  *    arriving row itself, so the streaming form needs no extra
  *    state. The arithmetic mirrors the batch column expression
  *    (prev + (next − prev) × (elapsed / gap), division first) so
  *    replays are bit-equal to the batch gate's oracle.
  *  - `bfill` — gap days take the ARRIVING value ([[
  *    gapFillDailyBackward]]'s twin; st44): same event, opposite
  *    anchor.
  *
  * The accumulated emissions equal the batch operator's output
  * exactly — the batch grid spans [min, max] per key, which is
  * precisely the union of the (prev, next] intervals this operator
  * closes as observations land — so the replay gates reuse the batch
  * gates' oracles verbatim.
  *
  * State is ONE (date, value) pair per key — O(live keys), never the
  * stream length; a feature-store forward-fill can run forever.
  * Emitting retroactively at the NEXT observation (rather than on a
  * wall-clock tick) keeps the operator deterministic and
  * replay-idempotent: no emission depends on processing time.
  *
  * Ordering contract: per-key arrival must be date-ordered ACROSS
  * micro-batches (the natural shape for daily feeds); within a batch
  * the handler sorts, so backfilled batches are safe. A row at or
  * before the key's last observed day is a late duplicate and drops.
  * Because already-emitted days cannot be retracted in append mode,
  * a contract violation is unrecoverable data loss — so it must be
  * DURABLY visible, not an executor log line: pass `dropCounter` (a
  * driver-registered [[LongAccumulator]] — accumulators flow from
  * executors back to the driver per batch, so an operator dashboard
  * or the foreachBatch hook can alert on it), or set `strict = true`
  * to fail the micro-batch instead of dropping (the replay then
  * surfaces the violation as a query error the orchestrator retries
  * or pages on).
  */
object StreamingGapFill extends org.apache.spark.internal.Logging {

  case class SeriesObs(key: Long, day: Date, value: Double)
  case class FillState(lastDay: Date, lastValue: Double)
  case class FilledDay(key: Long, day: Date, value: Double)

  /** Timestamp-grain observations for [[locfFilledAtGrain]]: hourly
    * (or any fixed-step) buckets instead of days — the reference's
    * own price-history cadence (`backend_api/app/models.py:50`).
    */
  case class SeriesObsTs(key: Long, ts: java.sql.Timestamp, value: Double)
  case class FillStateTs(lastEpoch: Long, lastValue: Double)
  case class FilledTs(key: Long, ts: java.sql.Timestamp, value: Double)

  /** [[locfFilled]] at a FIXED-STEP timestamp grain (`stepSeconds`,
    * default hourly): each arrival emits the gap buckets since the
    * key's previous observation carried forward, plus itself. Same
    * contract as the daily form — one (epoch, value) pair of state
    * per key, per-key time-ordered arrival across micro-batches,
    * in-batch reorder handled, at-or-before duplicates drop (durably
    * counted / strict). Input timestamps must sit AT grain
    * boundaries (pre-bucket with date_trunc — the
    * [[graft.operators.Resample.timeBucket]] contract). Calendar
    * grains (month) have no fixed step and stay batch-only.
    */
  def locfFilledAtGrain(obs: Dataset[SeriesObsTs],
      stepSeconds: Long = 3600L,
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledTs] = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    obs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[SeriesObsTs], state: GroupState[FillStateTs]) => {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[FilledTs]
          var st = state.getOption
          var dropped = 0
          val stepMs = stepSeconds * 1000L
          sorted.foreach { e =>
            st match {
              case None =>
                out += FilledTs(key, e.ts, e.value)
                st = Some(FillStateTs(e.ts.getTime, e.value))
              case Some(s) =>
                val t1 = e.ts.getTime
                if (t1 > s.lastEpoch) {
                  var t = s.lastEpoch + stepMs
                  while (t < t1) {
                    out += FilledTs(key, new java.sql.Timestamp(t),
                      s.lastValue)
                    t += stepMs
                  }
                  out += FilledTs(key, e.ts, e.value)
                  st = Some(FillStateTs(t1, e.value))
                } else dropped += 1
            }
          }
          if (dropped > 0) {
            val msg =
              s"StreamingGapFill: dropped $dropped observation(s) for " +
                s"key $key at-or-before its last filled bucket — per-key " +
                "arrival must be time-ordered across micro-batches"
            if (strict) throw new IllegalStateException(msg)
            dropCounter.foreach(_.add(dropped.toLong))
            logWarning(msg)
          }
          st.foreach(state.update)
          out.result().iterator
        })(Encoders.product[FillStateTs], Encoders.product[FilledTs])
  }

  /** Forward fill (locf): gap days carry the previous value. */
  def locfFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filled(obs, dropCounter, strict)((prev, _, _, _) => prev.lastValue)

  /** Linear interpolation: gap day d in (d0, d1) gets
    * v0 + (v1 − v0) × ((d − d0) / (d1 − d0)) — the batch
    * [[graft.operators.Resample.gapFillInterpolate]] formula with the
    * identical operation order (ratio first), for bit-equal replays.
    */
  def interpFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filled(obs, dropCounter, strict) { (prev, next, day, prevDay) =>
      prev.lastValue + (next.value - prev.lastValue) *
        ((day - prevDay).toDouble /
          (next.day.toLocalDate.toEpochDay - prevDay).toDouble)
    }

  /** Backward fill: gap days take the arriving observation's value. */
  def bfillFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filled(obs, dropCounter, strict)((_, next, _, _) => next.value)

  /** Shared skeleton: sort the batch, close each (prev, next) gap
    * with `gapValue(prevState, arriving, gapEpochDay, prevEpochDay)`,
    * emit the arriving day with its own value, advance the state.
    */
  private def filled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator], strict: Boolean)(
      gapValue: (FillState, SeriesObs, Long, Long) => Double): Dataset[FilledDay] =
    obs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[SeriesObs], state: GroupState[FillState]) => {
          // no intra-batch ordering guarantee: sort by day
          val sorted = it.toSeq.sortBy(_.day.toLocalDate.toEpochDay)
          val out = Seq.newBuilder[FilledDay]
          var st = state.getOption
          var dropped = 0
          sorted.foreach { e =>
            st match {
              case None =>
                out += FilledDay(key, e.day, e.value)
                st = Some(FillState(e.day, e.value))
              case Some(s) =>
                val d0 = s.lastDay.toLocalDate.toEpochDay
                val d1 = e.day.toLocalDate.toEpochDay
                if (d1 > d0) {
                  var d = d0 + 1
                  while (d < d1) {
                    out += FilledDay(key,
                      Date.valueOf(java.time.LocalDate.ofEpochDay(d)),
                      gapValue(s, e, d, d0))
                    d += 1
                  }
                  out += FilledDay(key, e.day, e.value)
                  st = Some(FillState(e.day, e.value))
                } else dropped += 1 // at-or-before lastDay
            }
          }
          // a violated ordering contract must be DETECTABLE, not
          // silent data loss: already-emitted days cannot be
          // retracted in append mode
          if (dropped > 0) {
            val msg =
              s"StreamingGapFill: dropped $dropped observation(s) for " +
                s"key $key at-or-before its last filled day " +
                s"${st.map(_.lastDay).orNull} — per-key arrival must be " +
                "date-ordered across micro-batches (in-batch reorder is " +
                "handled); an equal-day row is a duplicate"
            if (strict) throw new IllegalStateException(msg)
            dropCounter.foreach(_.add(dropped.toLong))
            logWarning(msg)
          }
          st.foreach(state.update)
          out.result().iterator
        })(Encoders.product[FillState], Encoders.product[FilledDay])
}
