package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: for each key, the earliest time it
  * completed step 1, then step 2 strictly after step 1, ... within a
  * conversion window anchored at step 1 — the classic
  * view -> click -> purchase product-analytics operator.
  *
  * Shape: NO sequential per-key scan and no event-pair join. Step i
  * is one (filtered) aggregation joined to the step-(i-1) frame on
  * the key: `min(t) where t > t_{i-1} and t - t1 <= window`. Each
  * step's frame is KEY-grained (one row per key that reached it) —
  * frames shrink monotonically, the event table is scanned once per
  * step with the step filter pushed into the scan, and every join is
  * keyed (broadcast-able once the funnel narrows). 2(k-1) shuffles
  * of key-grained rows beats one full per-key sort wherever a key's
  * event history is large — the usual clickstream shape.
  *
  * Determinism: step times are `min` aggregates of the qualifying
  * event times — no tie-break needed (ties collapse to the same
  * minimum).
  */
object Funnel {

  /** @param steps event-type sequence, length >= 2
    * @param windowMicros max `t_k - t_1` for a conversion (None =
    *                     unbounded)
    * @return one row per key that completed step 1:
    *         (key, t1_us..tk_us nullable, furthest_step 1-based,
    *         converted)
    */
  def analyze(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      windowMicros: Option[Long] = None): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least two steps")
    val base = events.select(
      col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__t"),
      col(typeCol).as("__et"))

    var out = base.where(col("__et") === steps.head)
      .groupBy(col("__k")).agg(min(col("__t")).as("t1_us"))
    for (i <- 2 to steps.length) {
      val prev = s"t${i - 1}_us"
      val cur = s"t${i}_us"
      val within: Column = windowMicros match {
        case Some(w) => col("__t") - col("t1_us") <= w
        case None => lit(true)
      }
      val reached = out
        .join(base.where(col("__et") === steps(i - 1)), Seq("__k"))
        .where(col("__t") > col(prev) && within)
        .groupBy(col("__k")).agg(min(col("__t")).as(cur))
      out = out.join(reached, Seq("__k"), "left")
    }
    val stepCols = (1 to steps.length).map(i => col(s"t${i}_us"))
    val furthest = stepCols.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (c, ix)) => when(c.isNotNull, lit(ix + 1)).otherwise(acc)
    }
    out.select(
      Seq(col("__k").as(keyCol)) ++ stepCols ++ Seq(
        furthest.cast("long").as("furthest_step"),
        stepCols.last.isNotNull.as("converted")): _*)
  }
}
