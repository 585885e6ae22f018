package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Autoregressive training-example assembly: turn per-key ordered
  * event streams into (context, label) next-step-prediction rows —
  * the supervised shape behind sequence-model training on behavioral
  * logs (session recommendation, churn, fraud), and the same
  * window-over-ordered-stream dataflow that builds next-token
  * examples from any tokenized sequence column.
  *
  * Scale shape: ONE exchange keyed by the sequence key (user), then a
  * key-partitioned sort — windows are parallel across keys, never a
  * global sort, and the frame is ROWS-bounded (`window` preceding) so
  * per-row state during evaluation is O(window), independent of how
  * long a key's history is. At 100 TB the key space (users) is the
  * parallelism; a single key's events always fit one partition's sort
  * spill budget (bounded by per-user history, not corpus size).
  *
  * Determinism: the sequence order is (ts, event_id) — a total order
  * (event_id unique), so every context window is reproducible across
  * runs, partitionings and engines; `collect_list` over an ordered
  * ROWS frame preserves frame order (SequencesSpec pins it against a
  * hand-built fold, and the streaming twin
  * [[graft.streaming.StreamingSequences]] reproduces the same rows
  * from a stateful per-key fold).
  */
object Sequences {

  /** `(user_id, event_id, pos, context, label)` — one training
    * example per event whose 1-based position `pos` in its user's
    * (ts, event_id)-ordered stream exceeds `window`: `context` = the
    * space-joined previous `window` event types, `label` = the
    * event's own type (the next-step target). Early events (pos <=
    * window) are skipped — fixed-length contexts only, the padded
    * variant being a trivial relaxation of the filter.
    */
  def nextEventExamples(events: DataFrame, window: Int,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(window > 0, s"window=$window must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("context",
        concat_ws(" ",
          collect_list(col(typeCol)).over(w.rowsBetween(-window, -1))))
      .where(col("pos") > window)
      .select(col(keyCol), col(idCol), col("pos"), col("context"),
        col(typeCol).as("label"))
  }
}
