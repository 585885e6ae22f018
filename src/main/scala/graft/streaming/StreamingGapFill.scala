package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-fill — the stateful edition of
  * [[graft.operators.Resample.gapFillDaily]]: per-key daily
  * observations arrive on a stream, and each arrival EMITS the gap
  * days since the key's previous observation (carried forward, locf)
  * plus the observation day itself. The accumulated emissions equal
  * the batch operator's output exactly — the batch grid spans
  * [min, max] per key, which is precisely the union of the
  * (prev, next] intervals this operator closes as observations land —
  * so the replay gate reuses the batch gate's oracle verbatim.
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
  * before the key's last observed day is a late duplicate and drops
  * (the batch twin's pre-aggregated-input contract).
  */
object StreamingGapFill extends org.apache.spark.internal.Logging {

  case class SeriesObs(key: Long, day: Date, value: Double)
  case class FillState(lastDay: Date, lastValue: Double)
  case class FilledDay(key: Long, day: Date, value: Double)

  def locfFilled(obs: Dataset[SeriesObs]): Dataset[FilledDay] =
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
                      s.lastValue)
                    d += 1
                  }
                  out += FilledDay(key, e.day, e.value)
                  st = Some(FillState(e.day, e.value))
                } else dropped += 1 // at-or-before lastDay
            }
          }
          // a violated ordering contract must be DETECTABLE, not
          // silent data loss: already-emitted days cannot be
          // retracted in append mode, so drop — but say so
          if (dropped > 0) logWarning(
            s"StreamingGapFill: dropped $dropped observation(s) for " +
              s"key $key at-or-before its last filled day " +
              s"${st.map(_.lastDay).orNull} — per-key arrival must be " +
              "date-ordered across micro-batches (in-batch reorder is " +
              "handled); an equal-day row is a duplicate")
          st.foreach(state.update)
          out.result().iterator
        })(Encoders.product[FillState], Encoders.product[FilledDay])
}
