package graft.silver

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: collapse a per-key snapshot
  * stream into versioned validity ranges — the history-keeping
  * counterpart of [[Dimensions.upsert]] (which keeps only the latest
  * row; SCD2 keeps every attribute CHANGE with [valid_from,
  * valid_to) ranges and an `is_current` flag).
  *
  * Shape: one exchange on the key feeds the change-detection window
  * (`lag` over (ts, tie) with null-safe attribute compare) and the
  * running version counter; a map-side-combinable aggregate collapses
  * each version's snapshots; a final key-window `lead` closes the
  * ranges. No self-join, no per-version state beyond the lag row.
  *
  * Determinism: snapshot ties on (key, ts) order by `tieCol`
  * (unique), so version boundaries never depend on partitioning or
  * replay. Attribute comparison is null-safe (`<=>`): NULL -> NULL is
  * "no change", NULL -> value is a change — the SQL
  * `IS DISTINCT FROM` contract, mirrored by the oracle.
  *
  * Scale: a key's whole history flows through one task (the window),
  * but state is one lag row; the version-grain aggregate shrinks
  * data before the second window. Hot keys = bigger sort partitions,
  * not memory; same stance as [[graft.operators.Sessionize]].
  */
object Scd2 {

  /** @param attrs tracked attribute columns: a change in ANY opens a
    *              new version; untracked columns are dropped (they'd
    *              be nondeterministic per-version picks otherwise)
    * @return (key, version_seq, attrs..., valid_from, valid_to,
    *         n_snapshots, is_current); valid_to NULL on the open
    *         version
    */
  def history(snapshots: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "Scd2.history needs tracked attributes")
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // any tracked attribute differing from the previous snapshot
    // (null-safe) opens a new version; the first snapshot always does.
    // First-row detection is positional (row_number == 1), NOT
    // lag(ts).isNull: a NULL snapshot timestamp sorts first, and the
    // row AFTER it would see lag(ts) = NULL and misread itself as a
    // version break even with unchanged attributes (round-6 advice 5).
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(byKey)))
      .reduce(_ || _)
    val isBreak =
      when(row_number().over(byKey) === 1 || changed, 1L).otherwise(0L)
    val versioned = snapshots
      .withColumn("version_seq",
        sum(isBreak).over(byKey.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) - 1L)
    // first() per attr is value-deterministic here: every snapshot in
    // a version carries null-safe-EQUAL attrs by construction
    val aggCols = attrs.map(a => first(col(a)).as(a)) ++ Seq(
      min(col(tsCol)).as("valid_from"),
      count(lit(1)).as("n_snapshots"))
    val collapsed = versioned
      .groupBy(col(keyCol), col("version_seq"))
      .agg(aggCols.head, aggCols.tail: _*)
    val byKeyVersion = Window.partitionBy(col(keyCol))
      .orderBy(col("version_seq").asc)
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKeyVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select(Seq(col(keyCol), col("version_seq")) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("n_snapshots"),
          col("is_current")): _*)
  }
}
