package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply: collapse a change log (upserts + deletes) into the
  * current table state — the MERGE counterpart of [[Scd2]] (which
  * keeps every version; this keeps the latest-wins survivor set).
  *
  * Shape: one (key)-keyed window ranks changes by (ts, tie)
  * descending; rank 1 is the deciding change, delete-deciders drop
  * the key. One exchange, no join — at 100 TB the change log
  * shuffles once at key grain and the survivor set streams out of
  * the rank filter. (A join-against-base formulation re-shuffles the
  * BASE every apply; here the base enters as just more change rows —
  * see [[merge]] — so the daily cost is the log's, not the table's,
  * when the base is already key-partitioned/bucketed.)
  *
  * Determinism: ties on (key, ts) resolve by `tieCol` (unique,
  * greatest wins) — replay/partitioning safe, the same contract as
  * every ordered operator here.
  */
object Cdc {

  /** `opCol` values: `deleteOp` rows tombstone the key; anything else
    * upserts. Output: the deciding row's key + `attrs` (+ ts/tie as
    * `applied_ts`/`applied_tie` for audit).
    */
  def apply(changelog: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, opCol: String, attrs: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      // null-safe compare: a NULL/missing op is an UPSERT, not a
      // silent delete (plain =!= is three-valued — NULL op would
      // filter the row out and vanish the key)
      .where(col("__rn") === 1 && !(col(opCol) <=> deleteOp))
      .select(Seq(col(keyCol)) ++ attrs.map(col) ++ Seq(
        col(tsCol).as("applied_ts"), col(tieCol).as("applied_tie")): _*)
  }

  /** Merge a base snapshot with a change log: base rows participate
    * as changes that lose every tie (tie = -infinity analog via a
    * lower `__src` ordinal), so a log entry at the SAME (ts) as the
    * snapshot still wins. Columns of `base`: key + attrs (+ the ts
    * column); no op column — base rows are upserts by definition.
    */
  def merge(base: DataFrame, changelog: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, opCol: String, attrs: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    val baseAsLog = base.select(
      Seq(col(keyCol), col(tsCol), lit(-1L).cast("long").as(tieCol),
        lit("U").as(opCol)) ++ attrs.map(col): _*)
    val logPart = changelog.select(
      Seq(col(keyCol), col(tsCol), col(tieCol).cast("long").as(tieCol),
        col(opCol)) ++ attrs.map(col): _*)
    apply(baseAsLog.unionByName(logPart), keyCol, tsCol, tieCol, opCol,
      attrs, deleteOp)
  }
}
