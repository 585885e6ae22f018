package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Z-order (Morton) clustering — the multi-column data-layout
  * operator behind "file skipping on BOTH filter columns"
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed with plain
  * Spark primitives).
  *
  * Sorting a table by (a, b) clusters a perfectly but scatters b;
  * point/range filters on b then touch every file. Interleaving the
  * bits of a and b into one z-value and range-partitioning + sorting
  * by it gives every file a tight bounding BOX in (a, b) space, so
  * parquet row-group min/max stats and file-level pruning cut reads
  * for predicates on EITHER column — at 100 TB the difference
  * between scanning a shard and scanning the table.
  *
  * Everything is built-in integer expressions (shift/and/or chains —
  * whole-stage codegen'd, no UDF): `zValue2` normalizes each column
  * to `bits` bits with exact integer arithmetic (overflow-guarded),
  * then spreads and interleaves with the standard magic-mask ladder.
  * Deterministic end-to-end, so z-values themselves are
  * hash-gateable in SQL (p36 re-derives the ladder in DuckDB).
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to even bit positions (classic
    * Morton magic masks), as codegen'd column arithmetic.
    */
  private[operators] def spread16(x: Column): Column = {
    val m1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Integer division (Catalyst `IntegralDivide` — SQL `DIV`).
    * Column `/` is double division, which stops being exact past
    * 2^53: span * 65535 reaches 2^63, where float rounding would
    * corrupt low bits AND diverge from the oracle's `//`.
    */
  private[operators] def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ColumnBridge.expression(a), ColumnBridge.expression(b),
        evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /** Normalize a long column into [0, 2^bits) given its (min, max)
    * bounds: exact integer scaling `(x - min) * (2^bits - 1) DIV
    * range` (non-negative operands — floor == truncate in both
    * engines). Bounds may be Columns (e.g. from a broadcast 1-row
    * stats frame) so the plan stays fully lazy. Degenerate range
    * (min == max) maps everything to 0.
    */
  private[operators] def normalize(
      x: Column, lo: Column, hi: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    val range = hi.cast("long") - lo.cast("long")
    when(range <= 0, lit(0L))
      .otherwise(intDiv((x.cast("long") - lo.cast("long")) * levels, range))
      .cast("long")
  }

  /** Interleaved z-value of two long columns normalized to 16 bits
    * each: bits of `a` on even positions, `b` on odd. Range
    * precondition: (max - min) * 65535 must not overflow a long —
    * i.e. each column's span below ~2^47 (recenter wider domains
    * first).
    */
  def zValue2(a: Column, aLo: Column, aHi: Column,
      b: Column, bLo: Column, bHi: Column): Column =
    spread16(normalize(a, aLo, aHi, 16))
      .bitwiseOR(shiftleft(spread16(normalize(b, bLo, bHi, 16)), 1))

  /** `df` + a `__z` column: the z-value of (aCol, bCol) under the
    * frame's own min/max bounds, derived via a broadcast 1-row
    * aggregate (no driver collect; the same shape as the retention
    * mart's max-date broadcast). Single-sourced for [[clusterByZ]]
    * and the p36 gate so the bounds convention can't drift.
    */
  def withZValue(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val stats = df.agg(
      min(col(aCol)).as("__alo"), max(col(aCol)).as("__ahi"),
      min(col(bCol)).as("__blo"), max(col(bCol)).as("__bhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue2(
        col(aCol), col("__alo"), col("__ahi"),
        col(bCol), col("__blo"), col("__bhi")))
      .drop("__alo", "__ahi", "__blo", "__bhi")
  }

  /** Cluster `df` for (aCol, bCol) locality: range-partition by the
    * z-value into `numPartitions` shards and sort within each — every
    * output partition (and the parquet files written from it) covers
    * a tight (a, b) box.
    */
  def clusterByZ(df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int): DataFrame =
    withZValue(df, aCol, bCol)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
}
