package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global 1-based ranking under a TOTAL order, at scale — the
  * operation behind deterministic training-data export orders
  * (curriculum schedules, reproducible shuffles) that naive
  * formulations get wrong: `row_number() OVER (ORDER BY ...)` with no
  * partition key collapses the whole corpus into ONE window partition
  * (the single-task sort that dies at 100 TB).
  *
  * Shape here: range-repartition by the sort key (Spark's parallel
  * distributed sort — each partition owns a contiguous key range),
  * sort within partitions, then zip each partition with its running
  * row offset (`zipWithIndex`: one lightweight count job over
  * partition SIZES — a driver array of numPartitions longs, never
  * data — then a narrow per-partition zip). Rank is a function of the
  * total order alone, so partition boundaries (range sampling) cannot
  * change any row's rank — only ties could, which is why the caller
  * MUST break ties to totality (e.g. by a unique id).
  */
object GlobalOrder {

  /** `df` plus a `rankCol` long column: the row's 1-based position
    * under `order` (which must be a TOTAL order — include a unique
    * tiebreak column). No persist: the zip's count job and data job
    * re-evaluate a deterministic lineage, but the range exchange's
    * map outputs are REUSED across the two jobs (Spark shuffle
    * reuse — the sampling and scan run once), so the repeated work
    * is only the reduce-side per-partition sort; at scale that is
    * cheaper than caching the corpus. The fixed map outputs are also
    * why the two jobs cannot disagree about partition boundaries.
    * Callers looping over the result should cache it themselves.
    */
  def withGlobalRank(df: DataFrame, rankCol: String,
      order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "withGlobalRank needs at least one sort column")
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val zipped = sorted.rdd.zipWithIndex()
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(zipped,
      sorted.schema.add(rankCol, LongType, nullable = false))
  }
}
