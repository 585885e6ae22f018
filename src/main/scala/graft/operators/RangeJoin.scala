package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join: match point rows to interval rows on an
  * equality key + containment (`start <= t <= end`) WITHOUT the
  * nested-loop plan Spark picks for inequality join conditions.
  *
  * A raw `points JOIN intervals ON key AND t BETWEEN start AND end`
  * has no equi-condition on the time axis, so Spark falls back to
  * BroadcastNestedLoopJoin (or a per-key cartesian) — every point
  * compared against every interval of its key. Binning restores a
  * pure equi-join: each interval is replicated into every
  * `bucketMicros`-wide bucket it overlaps, points hash to their one
  * bucket, the join runs on (key..., bucket), and an exact
  * containment filter discards the bucket-grain near-misses.
  *
  * Cost model: interval replication = span/bucket + 1 rows. Pick the
  * bucket near the TYPICAL interval span: replication stays O(1) per
  * interval while each point's bucket holds only intervals that
  * could plausibly contain it. The shuffle is (key, bucket)-grained
  * — a hot key's intervals spread over its time range instead of one
  * reducer, which is exactly what the unbinned join cannot do.
  *
  * Time columns are non-negative epoch micros (BIGINT): `div`
  * truncation == floor there; negative domains need recentering
  * first (same contract as [[ZOrder]]).
  */
object RangeJoin {

  /** Inner-join points to the intervals containing them. Output =
    * point columns + interval columns (minus duplicated keys).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      pointTime: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    // exact integer bucket ids (Column `/` is double division —
    // inexact past 2^53 and a determinism hazard; see ZOrder.intDiv)
    val expanded = intervals.withColumn("__b",
      explode(sequence(
        ZOrder.intDiv(col(startCol).cast("long"), lit(bucketMicros)),
        ZOrder.intDiv(col(endCol).cast("long"), lit(bucketMicros)))))
    val binned = points.withColumn("__b",
      ZOrder.intDiv(col(pointTime).cast("long"), lit(bucketMicros)))
    binned
      .join(expanded, keyCols :+ "__b")
      .where(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("__b")
  }
}
