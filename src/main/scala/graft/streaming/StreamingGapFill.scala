package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/** Streaming gap-fill — the stateful edition of the batch
  * [[graft.operators.Resample]] trio: per-key observations arrive on a
  * stream, and each arrival EMITS the gap buckets since the key's
  * previous observation plus the observation bucket itself, under one
  * of three fill modes (`locf` carries the previous value forward,
  * `interp` interpolates linearly between the surrounding
  * observations, `bfill` takes the arriving value — st42/st43/st44's
  * daily trio, st45's hourly locf, st46's monthly pair).
  *
  * ONE stateful skeleton serves every grain (round-17, verdict ask
  * #6 — previously three parallel near-identical handlers): a grain
  * is a BIJECTION between observation times and dense Long bucket
  * indices, so the state walk, ordering contract, duplicate
  * accounting and gap bound live in a single
  * `flatMapGroupsWithState` over (key, index, value) rows, exactly
  * the batch operator's grain-string parameterization
  * ([[graft.operators.Resample.gapFill]]) transplanted to streaming.
  *  - `day`   — index = epoch day;
  *  - `month` — index = year×12 + month (calendar arithmetic: months
  *    are unequal, so the fixed-step form cannot express them; the
  *    grid equals `sequence(lo, hi, interval 1 month)` on the
  *    month-start contract). Interpolation stays linear in REAL days
  *    (the batch `datediff` semantics — a Jan→Apr slope hits Feb 1 at
  *    31/90, not 1/3), derived from the index bijection;
  *  - fixed-step seconds (default hourly) — index = epoch ms /
  *    step ms; inputs must sit AT grain boundaries (pre-bucket with
  *    date_trunc — the [[graft.operators.Resample.timeBucket]]
  *    contract), so index→timestamp reproduces the input instants
  *    bit-exactly.
  * Every mode's arithmetic mirrors the batch column expression
  * (prev + (next − prev) × (elapsed / gap), division first) so
  * replays are bit-equal to the batch gates' oracles. Interpolation
  * is exactly what retroactive emission buys: the forward anchor a
  * batch window must SEARCH for is the arriving row itself, so the
  * streaming form needs no extra state.
  *
  * The accumulated emissions equal the batch operator's output
  * exactly — the batch grid spans [min, max] per key, which is
  * precisely the union of the (prev, next] intervals this operator
  * closes as observations land — so the replay gates reuse the batch
  * gates' oracles verbatim.
  *
  * State is ONE (index, value) pair per key — O(live keys), never the
  * stream length; a feature-store forward-fill can run forever.
  * Emitting retroactively at the NEXT observation (rather than on a
  * wall-clock tick) keeps the operator deterministic and
  * replay-idempotent: no emission depends on processing time.
  *
  * Ordering contract: per-key arrival must be time-ordered ACROSS
  * micro-batches (the natural shape for periodic feeds); within a
  * batch the handler sorts, so backfilled batches are safe. A row at
  * or before the key's last observed bucket is a late duplicate and
  * drops. Because already-emitted buckets cannot be retracted in
  * append mode, a contract violation is unrecoverable data loss — so
  * it must be DURABLY visible, not an executor log line: pass
  * `dropCounter` (a driver-registered [[LongAccumulator]] —
  * accumulators flow from executors back to the driver per batch, so
  * an operator dashboard or the foreachBatch hook can alert on it),
  * or set `strict = true` to fail the micro-batch instead of dropping
  * (the replay then surfaces the violation as a query error the
  * orchestrator retries or pages on).
  *
  * Per-arrival gap bound (the batch operator's grid-size note,
  * streaming edition): ONE arrival emits the WHOLE gap since the
  * key's previous observation, built in executor memory before
  * emission — a key reappearing after 10 years at hour grain is
  * ~87 600 rows in one handler call. `maxGapBuckets` fails the
  * micro-batch LOUDLY past the bound (default 200 000 ≈ 22 years
  * hourly, 547 years daily — a data-corruption trip wire at the
  * coarser grains) instead of buffering toward an executor OOM;
  * raise it deliberately, or bound key lifetimes upstream exactly as
  * the batch scaladoc prescribes.
  */
object StreamingGapFill extends org.apache.spark.internal.Logging {

  case class SeriesObs(key: Long, day: Date, value: Double)
  case class FilledDay(key: Long, day: Date, value: Double)

  /** Timestamp-grain observations for [[locfFilledAtGrain]]: hourly
    * (or any fixed-step) buckets instead of days — the reference's
    * own price-history cadence (`backend_api/app/models.py:50`).
    */
  case class SeriesObsTs(key: Long, ts: java.sql.Timestamp, value: Double)
  case class FilledTs(key: Long, ts: java.sql.Timestamp, value: Double)

  /** The skeleton's internal grain: (key, bucket index, value).
    * `private[streaming]`, not `private`: a file-private case class
    * compiles to a private constructor, which Janino-generated
    * deserializers cannot invoke (codegen "no applicable
    * constructor" at runtime); package-private is public bytecode.
    */
  private[streaming] case class IdxObs(key: Long, idx: Long, value: Double)
  private[streaming] case class IdxState(lastIdx: Long, lastValue: Double)
  private[streaming] case class IdxFilled(key: Long, idx: Long, value: Double)

  private def monthIndex(d: java.time.LocalDate): Long =
    d.getYear * 12L + d.getMonthValue - 1
  private def monthStart(idx: Long): java.time.LocalDate =
    java.time.LocalDate.of(Math.floorDiv(idx, 12L).toInt,
      Math.floorMod(idx, 12L).toInt + 1, 1)

  /** Gap value for (grain, mode): called per gap bucket with the
    * surrounding observations' indices/values. The day grain's index
    * deltas ARE real-day deltas; the month grain converts indices
    * back to month-start dates for the real-day proportion; the
    * fixed-step grain's index deltas are proportional to elapsed
    * time, so the ratio is identical either way.
    */
  private def gapFn(grain: String, mode: String)
      : (Long, Double, Long, Double, Long) => Double = mode match {
    case "locf" => (_, pv, _, _, _) => pv
    case "bfill" => (_, _, _, nv, _) => nv
    case "interp" => grain match {
      case "month" => (pi, pv, ni, nv, gi) => {
        val d0 = monthStart(pi); val d1 = monthStart(ni)
        pv + (nv - pv) *
          (java.time.temporal.ChronoUnit.DAYS.between(d0, monthStart(gi)).toDouble /
            java.time.temporal.ChronoUnit.DAYS.between(d0, d1).toDouble)
      }
      case _ => (pi, pv, ni, nv, gi) =>
        pv + (nv - pv) * ((gi - pi).toDouble / (ni - pi).toDouble)
    }
    case other => throw new IllegalArgumentException(
      s"unknown fill mode '$other' (locf | interp | bfill)")
  }

  /** Date-grain entry point — grain `"day"` (st42–st44) or `"month"`
    * (st46), mode `locf | interp | bfill`: the batch
    * [[graft.operators.Resample.gapFill]] signature shape, streaming
    * edition.
    */
  def filledDates(obs: Dataset[SeriesObs], grain: String = "day",
      mode: String = "locf",
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] = {
    val toIdx: Date => Long = grain match {
      case "day" => d => d.toLocalDate.toEpochDay
      case "month" => d => monthIndex(d.toLocalDate)
      case other => throw new IllegalArgumentException(
        s"unknown date grain '$other' (day | month)")
    }
    val fromIdx: Long => Date = grain match {
      case "day" => i => Date.valueOf(java.time.LocalDate.ofEpochDay(i))
      case _ => i => Date.valueOf(monthStart(i))
    }
    filledIdx(
      obs.map(o => IdxObs(o.key, toIdx(o.day), o.value))(
        Encoders.product[IdxObs]),
      grain, dropCounter, strict, maxGapBuckets)(gapFn(grain, mode))
      .map(f => FilledDay(f.key, fromIdx(f.idx), f.value))(
        Encoders.product[FilledDay])
  }

  /** Fixed-step timestamp-grain entry point (`stepSeconds`, default
    * hourly — st45): each arrival emits the gap buckets since the
    * key's previous observation, plus itself, under `mode`. Input
    * timestamps must sit AT grain boundaries.
    */
  def filledTimestamps(obs: Dataset[SeriesObsTs],
      stepSeconds: Long = 3600L, mode: String = "locf",
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledTs] = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val stepMs = stepSeconds * 1000L
    filledIdx(
      obs.map(o => IdxObs(o.key, Math.floorDiv(o.ts.getTime, stepMs),
        o.value))(Encoders.product[IdxObs]),
      s"${stepSeconds}s", dropCounter, strict, maxGapBuckets)(
      gapFn("fixed", mode))
      .map(f => FilledTs(f.key, new java.sql.Timestamp(f.idx * stepMs),
        f.value))(Encoders.product[FilledTs])
  }

  // ---- the five gates' named instantiations (st42–st46), kept as
  // one-line delegations so call sites read as the operator they are.

  /** Forward fill (locf) at day grain: gap days carry the previous
    * value ([[graft.operators.Resample.gapFillDaily]]'s twin; st42).
    */
  def locfFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filledDates(obs, "day", "locf", dropCounter, strict)

  /** Linear interpolation at day grain: gap day d in (d0, d1) gets
    * v0 + (v1 − v0) × ((d − d0) / (d1 − d0)) — the batch
    * [[graft.operators.Resample.gapFillInterpolate]] formula with the
    * identical operation order (ratio first), for bit-equal replays
    * (st43).
    */
  def interpFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filledDates(obs, "day", "interp", dropCounter, strict)

  /** Backward fill at day grain: gap days take the arriving
    * observation's value (st44).
    */
  def bfillFilled(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false): Dataset[FilledDay] =
    filledDates(obs, "day", "bfill", dropCounter, strict)

  /** Locf at a fixed-step timestamp grain (st45). */
  def locfFilledAtGrain(obs: Dataset[SeriesObsTs],
      stepSeconds: Long = 3600L,
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledTs] =
    filledTimestamps(obs, stepSeconds, "locf", dropCounter, strict,
      maxGapBuckets)

  /** Locf at calendar month grain (st46; p150's `v_locf` twin). */
  def locfFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledDates(obs, "month", "locf", dropCounter, strict, maxGapBuckets)

  /** Month-grain linear interpolation in real-day proportion (the
    * p150 `v_interp` column's formula, operation order preserved for
    * bit-equal replays; st46).
    */
  def interpFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledDates(obs, "month", "interp", dropCounter, strict, maxGapBuckets)

  /** Backward fill at month grain. */
  def bfillFilledAtMonth(obs: Dataset[SeriesObs],
      dropCounter: Option[LongAccumulator] = None,
      strict: Boolean = false,
      maxGapBuckets: Long = 200000L): Dataset[FilledDay] =
    filledDates(obs, "month", "bfill", dropCounter, strict, maxGapBuckets)

  /** The ONE stateful skeleton: sort the batch by index, close each
    * (prev, next) gap with `gapValue(prevIdx, prevVal, nextIdx,
    * nextVal, gapIdx)`, emit the arriving bucket with its own value,
    * advance the state.
    */
  private def filledIdx(obs: Dataset[IdxObs], grainName: String,
      dropCounter: Option[LongAccumulator], strict: Boolean,
      maxGapBuckets: Long)(
      gapValue: (Long, Double, Long, Double, Long) => Double)
      : Dataset[IdxFilled] = {
    require(maxGapBuckets > 0, "maxGapBuckets must be positive")
    obs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, it: Iterator[IdxObs], state: GroupState[IdxState]) => {
          // no intra-batch ordering guarantee: sort by bucket index
          val sorted = it.toSeq.sortBy(_.idx)
          val out = Seq.newBuilder[IdxFilled]
          var st = state.getOption
          var dropped = 0
          sorted.foreach { e =>
            st match {
              case None =>
                out += IdxFilled(key, e.idx, e.value)
                st = Some(IdxState(e.idx, e.value))
              case Some(s) =>
                if (e.idx > s.lastIdx) {
                  if (e.idx - s.lastIdx - 1 > maxGapBuckets)
                    throw new IllegalStateException(
                      s"StreamingGapFill: key $key reappeared after " +
                        s"${e.idx - s.lastIdx - 1} buckets at grain " +
                        s"$grainName (> maxGapBuckets $maxGapBuckets) — " +
                        "one arrival would buffer the whole gap in " +
                        "executor memory; bound key lifetimes upstream " +
                        "or raise maxGapBuckets deliberately")
                  var i = s.lastIdx + 1
                  while (i < e.idx) {
                    out += IdxFilled(key, i,
                      gapValue(s.lastIdx, s.lastValue, e.idx, e.value, i))
                    i += 1
                  }
                  out += IdxFilled(key, e.idx, e.value)
                  st = Some(IdxState(e.idx, e.value))
                } else dropped += 1 // at-or-before the last bucket
            }
          }
          // a violated ordering contract must be DETECTABLE, not
          // silent data loss: already-emitted buckets cannot be
          // retracted in append mode
          if (dropped > 0) {
            val msg =
              s"StreamingGapFill: dropped $dropped observation(s) for " +
                s"key $key at-or-before its last filled bucket (grain " +
                s"$grainName) — per-key arrival must be time-ordered " +
                "across micro-batches (in-batch reorder is handled); " +
                "an equal-bucket row is a duplicate"
            if (strict) throw new IllegalStateException(msg)
            dropCounter.foreach(_.add(dropped.toLong))
            logWarning(msg)
          }
          st.foreach(state.update)
          out.result().iterator
        })(Encoders.product[IdxState], Encoders.product[IdxFilled])
  }
}
