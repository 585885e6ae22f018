package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into
  * sessions wherever the time gap to the previous event exceeds
  * `gapMicros` (the standard web-analytics / clickstream operator).
  *
  * Shape: ONE hash exchange on the key + one in-partition sort feed
  * both windows — `lag` (previous timestamp) and the running
  * `sum(is_break)` that numbers sessions. The two frames differ
  * (preceding-row vs running), so Spark plans two Window nodes, but
  * both consume the SAME (partition, order) — one shuffle, one sort,
  * then two streaming passes with O(1) state per key
  * (SessionizeSpec proves the 1-exchange/1-sort plan).
  *
  * Determinism: events tied on (key, ts) are ordered by `tieCol`
  * (unique per row) so the lag — and therefore every session number —
  * is independent of partitioning and task replay. Same-timestamp
  * events always share a session either way (gap 0 <= gapMicros), but
  * the tie order fixes WHICH row is "first" for downstream
  * first-in-session logic.
  *
  * Scale: per-key state inside the sort is one row (the previous
  * timestamp) — a hot key costs a bigger sort partition, not memory.
  * AQE cannot split a single key's window; a key so hot its events
  * overflow one task's sort spill budget wants date-bucketed
  * pre-splitting (sessionize within (key, day) then stitch day-
  * boundary sessions — cheap because only first/last session per day
  * can merge).
  *
  * The streaming twin ([[graft.streaming.StreamingSessions]]) keeps
  * (key -> open-session aggregate) state with an event-time timeout at
  * the same gap; its emitted sessions match this batch operator on
  * replayed input (StreamingSessionsSpec).
  */
object Sessionize {

  /** Events + `session_seq` (0-based per key, in time order). */
  def assignSessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros >= 0, "gapMicros must be non-negative")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    // first-event detection is positional (row_number == 1), NOT
    // prev.isNull: a NULL event timestamp sorts first and would make
    // its successor misread itself as a session start (same fix as
    // Scd2.history; round-6 advice 5). A row following a NULL-ts row
    // gets a NULL gap comparison -> no break (non-null timestamps are
    // the operator's contract; NULL-ts rows are upstream garbage).
    val isBreak = when(
      row_number().over(w) === 1 ||
        unix_micros(col(tsCol)) - prev > gapMicros, 1L)
      .otherwise(0L)
    events.withColumn("session_seq",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1L)
  }

  /** Per-session summary rows: start/end (epoch micros), event count,
    * plus caller aggregates evaluated per (key, session). Aggregates
    * follow the engine's determinism rule — pass integer aggregates
    * (counts, integer sums), not order-dependent double sums, when the
    * output feeds a hash gate.
    */
  def sessionStats(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMicros: Long,
      aggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(unix_micros(col(tsCol))).as("start_us"),
      max(unix_micros(col(tsCol))).as("end_us"),
      count(lit(1)).as("n_events"))
    assignSessions(events, keyCol, tsCol, tieCol, gapMicros)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(base.head, (base.tail ++ aggs): _*)
  }
}
