package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream INTERVAL join — Spark's native
  * stream-stream join operator, the one streaming shape the other
  * twins don't exercise (they are stateful maps / windowed aggs):
  * each left row matches right rows of the same key whose event time
  * falls in (left_ts, left_ts + maxGap] — "purchases within two
  * hours of a view", online.
  *
  * Scale/state story (why this is THE join for unbounded streams):
  * both sides carry a watermark and the join condition bounds the
  * match window in EVENT TIME, so Spark's symmetric hash join keeps
  * only rows inside [watermark - maxGap, now] per side — state is
  * horizon-bounded, never the stream history, and eviction is exact
  * (a right row older than watermark - maxGap can never match a
  * future left row, and vice versa). Without the time bound the
  * state store grows without limit; without BOTH watermarks Spark
  * rejects the query outright. Inner-join semantics: a match emits
  * in the micro-batch that completes the pair — no claimant, no
  * ordering sensitivity, so the output is batch-deterministic (the
  * st11 gate hash-matches it against the batch SQL join).
  *
  * Columns must be pre-renamed disjoint by the caller (the two sides
  * of a stream self-join otherwise collide); `leftTs`/`rightTs` name
  * the event-time columns the watermarks attach to.
  */
object StreamingIntervalJoin {

  def within(left: DataFrame, right: DataFrame,
      joinKeys: (String, String), tsCols: (String, String),
      watermarkDelay: String, maxGap: String,
      strictlyAfter: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer")(joinType),
      s"joinType=$joinType: watermarked interval joins support inner/left_outer")
    val (lk, rk) = joinKeys
    val (lt, rt) = tsCols
    val l = left.withWatermark(lt, watermarkDelay)
    val r = right.withWatermark(rt, watermarkDelay)
    val lower: Column =
      if (strictlyAfter) col(rt) > col(lt) else col(rt) >= col(lt)
    l.join(r,
      col(lk) === col(rk) && lower &&
        col(rt) <= col(lt) + expr(s"INTERVAL $maxGap"),
      joinType)
  }

  /** LEFT OUTER variant: every left row emits exactly once — matched
    * pairs in the micro-batch that completes them (same as inner),
    * unmatched left rows with NULL right columns once the watermark
    * passes `leftTs + maxGap` and Spark can PROVE no future right row
    * can match (eviction time, not arrival time — so the null rows
    * are just as deterministic as the matches, and the whole output
    * hash-checks against the batch LEFT JOIN). The "did this view
    * convert, including the no's" shape — an online funnel-drop feed.
    * State bound is the inner join's; a bounded replay needs the
    * watermark pushed past the last left row's horizon (flush
    * sentinel) or its unmatched rows stay un-emitted.
    */
  def withinLeftOuter(left: DataFrame, right: DataFrame,
      joinKeys: (String, String), tsCols: (String, String),
      watermarkDelay: String, maxGap: String,
      strictlyAfter: Boolean = true): DataFrame =
    within(left, right, joinKeys, tsCols, watermarkDelay, maxGap,
      strictlyAfter, joinType = "left_outer")
}
