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
    * [[graft.operators.Resample.timeBucket]] contract). The month
    * calendar grain has no fixed step — see [[locfFilledAtMonth]] /
    * [[interpFilledAtMonth]] for the epoch-month-index form.
    *
    * Per-arrival gap bound (the batch operator's grid-size note,
    * streaming edition): ONE arrival emits the WHOLE gap since the
    * key's previous observation, built in executor memory before
    * emission — a key reappearing after 10 years at hour grain is
    * ~87 600 rows in one handler call. `maxGapBuckets` fails the
    * micro-batch LOUDLY past the bound (default 200 000 ≈ 22 years
    * hourly) instead of buffering toward an executor OOM; raise it
    * deliberately, or bound key lifetimes upstream exactly as the
    * batch scaladoc prescribes.
    */
  def locfFilledAtGrain(obs: Dataset[SeriesObsTs],
      stepSeconds: Long = 3600L,
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledTs] = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(maxGapBuckets > 0, "maxGapBuckets must be positive")
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
                  val gapBuckets = (t1 - s.lastEpoch) / stepMs - 1
                  if (gapBuckets > maxGapBuckets)
                    throw new IllegalStateException(
                      s"StreamingGapFill: key $key reappeared after " +
                        s"$gapBuckets buckets (> maxGapBuckets " +
                        s"$maxGapBuckets) — one arrival would buffer the " +
                        "whole gap in executor memory; bound key lifetimes " +
                        "upstream or raise maxGapBuckets deliberately")
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

  /** CALENDAR month grain — the batch [[graft.operators.Resample]]
    * `grain = "month"` twin (p150), which [[locfFilledAtGrain]]'s
    * fixed-step contract cannot express (months are unequal). The
    * state step is month ARITHMETIC, not epoch millis: observations
    * are month-start DATEs (pre-bucket with `trunc(col, "month")` —
    * the batch input contract), and the gap walk advances
    * `LocalDate.plusMonths(1)` from the previous observation, which
    * is exact on month starts (day-of-month 1 is preserved), so the
    * emitted grid equals `sequence(lo, hi, interval 1 month)`.
    * Interpolation stays linear in REAL days (the batch `datediff`
    * semantics — a Jan→Apr slope hits Feb 1 at 31/90, not 1/3).
    * Everything else is the daily contract verbatim: one
    * (month, value) state pair per key, time-ordered arrival across
    * micro-batches, in-batch reorder handled, at-or-before
    * duplicates drop durably, `maxGapBuckets` bounds the per-arrival
    * emission.
    */
  def locfFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledAtMonth(obs, dropCounter, strict, maxGapBuckets)(
      (prev, _, _) => prev.lastValue)

  /** [[locfFilledAtMonth]]'s linear sibling — gap months interpolate
    * between the surrounding observations in real-day proportion
    * (the p150 `v_interp` column's formula, operation order
    * preserved for bit-equal replays).
    */
  def interpFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledAtMonth(obs, dropCounter, strict, maxGapBuckets) {
      (prev, next, gapMonth) =>
        val d0 = prev.lastDay.toLocalDate
        val d1 = next.day.toLocalDate
        prev.lastValue + (next.value - prev.lastValue) *
          (java.time.temporal.ChronoUnit.DAYS.between(d0, gapMonth).toDouble /
            java.time.temporal.ChronoUnit.DAYS.between(d0, d1).toDouble)
    }

  /** Backward fill at month grain: gap months take the arriving
    * observation's value.
    */
  def bfillFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledAtMonth(obs, dropCounter, strict, maxGapBuckets)(
      (_, next, _) => next.value)

  /** Shared month-grain skeleton: identical control flow to the
    * daily [[filled]], with the gap walk in month steps and
    * `gapValue(prevState, arriving, gapMonthStart)` choosing the
    * fill.
    */
  private def filledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator], strict: Boolean,
      maxGapBuckets: Long)(
      gapValue: (FillState, SeriesObs, java.time.LocalDate) => Double)
      : Dataset[FilledDay] = {
    require(maxGapBuckets > 0, "maxGapBuckets must be positive")
    obs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[SeriesObs], state: GroupState[FillState]) => {
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
                val d0 = s.lastDay.toLocalDate
                val d1 = e.day.toLocalDate
                if (d1.isAfter(d0)) {
                  val gapMonths =
                    java.time.temporal.ChronoUnit.MONTHS.between(d0, d1) - 1
                  if (gapMonths > maxGapBuckets)
                    throw new IllegalStateException(
                      s"StreamingGapFill: key $key reappeared after " +
                        s"$gapMonths months (> maxGapBuckets " +
                        s"$maxGapBuckets) — bound key lifetimes upstream " +
                        "or raise maxGapBuckets deliberately")
                  var m = d0.plusMonths(1)
                  while (m.isBefore(d1)) {
                    out += FilledDay(key, Date.valueOf(m),
                      gapValue(s, e, m))
                    m = m.plusMonths(1)
                  }
                  out += FilledDay(key, e.day, e.value)
                  st = Some(FillState(e.day, e.value))
                } else dropped += 1
            }
          }
          if (dropped > 0) {
            val msg =
              s"StreamingGapFill: dropped $dropped observation(s) for " +
                s"key $key at-or-before its last filled month — per-key " +
                "arrival must be date-ordered across micro-batches"
            if (strict) throw new IllegalStateException(msg)
            dropCounter.foreach(_.add(dropped.toLong))
            logWarning(msg)
          }
          st.foreach(state.update)
          out.result().iterator
        })(Encoders.product[FillState], Encoders.product[FilledDay])
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
    * The same per-arrival gap bound as [[locfFilledAtGrain]] applies
    * (200 000 days ≈ 547 years — effectively a data-corruption trip
    * wire at day grain, the loud alternative to buffering a bogus
    * far-future date's whole gap in one handler call).
    */
  private def filled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator], strict: Boolean,
      maxGapBuckets: Long = 200000L)(
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
                  if (d1 - d0 - 1 > maxGapBuckets)
                    throw new IllegalStateException(
                      s"StreamingGapFill: key $key reappeared after " +
                        s"${d1 - d0 - 1} days (> maxGapBuckets " +
                        s"$maxGapBuckets) — bound key lifetimes upstream " +
                        "or raise maxGapBuckets deliberately")
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
