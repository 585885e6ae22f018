package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, DoubleType}

/** Time-series gap-fill — the warehouse `time_bucket_gapfill`
  * operator (TimescaleDB's surface, the Postgres generate_series +
  * LATERAL pattern): a sparse per-key series resampled onto its
  * dense grid at a caller-chosen grain (hour / day / week / month),
  * missing buckets filled by one of three modes — locf (carry the
  * last observation forward), bfill (take the next observation), or
  * linear interpolation. The medallion's marts tolerate gaps (G4
  * models disappearance explicitly); this operator serves the
  * consumers that can't — position/valuation snapshots, ML feature
  * frames joined on (key, bucket), window features over regular
  * grids, and the dashboard's dense hourly price bars (the reference
  * dashboard fetches 48 HOURLY bars and assumes density —
  * `backend_api/app/main.py:45-49`, `models.py:50`).
  *
  * Scale shape: ONE data shuffle. The observed rows and the
  * generated grid rows interleave through a single per-key window —
  * at equal buckets the observed row sorts FIRST, so `last(value,
  * ignoreNulls)` running over the interleave fills each grid row
  * from the newest observation at-or-before it, riding the exact
  * sort the window needs anyway. No (key, bucket) equi-join of two
  * corpus-scale sides, no second shuffle. The span aggregation that
  * builds the grid is a keyed partial-agg (map-side combined); the
  * grid itself is |keys| × span-buckets rows — the OUTPUT size,
  * nothing bigger is ever materialized.
  *
  * Grid-size bound (document before running at scale): the output is
  * Σ_key (span_key / grain) rows, where span_key = max(time) −
  * min(time) FOR THAT KEY. A key observed twice ten years apart
  * inflates its grid 3 650× at day grain (87 600× at hour grain) —
  * bound the span upstream (filter to the serving window, or split
  * long-lived keys by epoch) when key lifetimes are unbounded.
  * Measured (BASELINE.md round-15 decade table, `ScaleEvidence`):
  * 2 001 keys × ~2 300-day spans = 4 674 607 grid rows from 59 633
  * observations at sf0.1 — a 78× output amplification — and the
  * sf0.1 → sf1 facts decade (10× observations, same key population)
  * holds wall-clock FLAT because the grid, not the input, dominates:
  * cost ≈ O(input scan + |keys| × span).
  *
  * Input contract: ONE row per (keys, bucket), time values already
  * AT grain boundaries — pre-aggregate with
  * [[Resample.timeBucket]] (`date_trunc`) first, exactly like
  * TimescaleDB's `time_bucket_gapfill(bucket, ts)` buckets before it
  * fills.
  */
object Resample {

  /** Supported grains → the grid step. `day` over a DateType column
    * uses the native two-argument date `sequence` (step 1 day);
    * everything else steps by interval.
    */
  private val Grains = Set("hour", "day", "week", "month")

  /** The bucketing helper for the input contract: truncate a
    * timestamp to the grain (`date_trunc`). Week truncates to Monday
    * (ISO), matching DuckDB/Postgres `date_trunc('week', …)`.
    */
  def timeBucket(grain: String, c: Column): Column = {
    require(Grains(grain), s"unsupported grain: $grain")
    date_trunc(grain, c)
  }

  private def gridExpr(grain: String, timeType: DataType,
      lo: Column, hi: Column): Column = {
    require(Grains(grain), s"unsupported grain: $grain")
    (grain, timeType) match {
      case ("day", DateType) => sequence(lo, hi)
      case ("hour", DateType) =>
        throw new IllegalArgumentException(
          "hour grain needs a TimestampType time column")
      case ("hour", _) => sequence(lo, hi, expr("interval 1 hour"))
      case ("day", _) => sequence(lo, hi, expr("interval 1 day"))
      case ("week", _) => sequence(lo, hi, expr("interval 7 days"))
      case ("month", _) => sequence(lo, hi, expr("interval 1 month"))
    }
  }

  /** Shared scaffolding: the per-key dense grid (NULL-valued,
    * `__obs = 0`) unioned with the observed rows (`__obs = 1`), ready
    * for the per-key interleave window (observed sorts before its
    * grid twin at equal buckets via `__obs desc`). `valueCast`
    * decides the grid columns' type — the observed side casts to
    * match.
    */
  private def gridUnion(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCols: Seq[String], grain: String,
      valueCast: String => DataType): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val k = keyCols.map(col)
    val timeType = df.schema(timeCol).dataType
    val grid = df.groupBy(k: _*)
      .agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
      .select(k :+ explode(gridExpr(grain, timeType, col("__lo"),
        col("__hi"))).as(timeCol): _*)
      .select((k :+ col(timeCol) :+ lit(0).as("__obs")) ++
        valueCols.map(c => lit(null).cast(valueCast(c)).as(c)): _*)
    val data = df.select(
      (k :+ col(timeCol) :+ lit(1).as("__obs")) ++
        valueCols.map(c => col(c).cast(valueCast(c)).as(c)): _*)
    data.unionByName(grid)
  }

  /** locf / bfill share one body — the only difference is the window
    * sort direction (ascending buckets fill forward from the
    * previous observation; descending fill backward from the next).
    * Both keep `__obs desc` as the tie-break so an observed bucket
    * sees its own value from either side.
    */
  private def fillLast(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], grain: String, forward: Boolean): DataFrame = {
    val k = keyCols.map(col)
    val valueTypes = valueCols.map(c => c -> df.schema(c).dataType).toMap
    val order = if (forward) col(timeCol).asc else col(timeCol).desc
    val w = Window.partitionBy(k: _*)
      .orderBy(order, col("__obs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridUnion(df, keyCols, timeCol, valueCols, grain, valueTypes)
      .select((k :+ col(timeCol) :+ col("__obs")) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .where(col("__obs") === 0).drop("__obs")
  }

  /** Grain-parameterized gap-fill — `mode` ∈ locf | bfill | interp,
    * `grain` ∈ hour | day | week | month. The daily wrappers below
    * are this at `grain = "day"`.
    */
  def gapFill(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], mode: String = "locf",
      grain: String = "day"): DataFrame = mode match {
    case "locf" => fillLast(df, keyCols, timeCol, valueCols, grain,
      forward = true)
    case "bfill" => fillLast(df, keyCols, timeCol, valueCols, grain,
      forward = false)
    case "interp" => interpolate(df, keyCols, timeCol, valueCols, grain)
    case other => throw new IllegalArgumentException(
      s"unsupported fill mode: $other (locf | bfill | interp)")
  }

  /** Resample `df` (ONE row per (keys, date) — pre-aggregate first)
    * onto each key's dense [min(date), max(date)] daily grid;
    * `valueCols` forward-fill across the generated days. Output:
    * keyCols ++ (dateCol) ++ valueCols, one row per key × grid day;
    * days before a key's first observation never exist (the grid
    * starts at the key's own min), so every output value is defined.
    */
  def gapFillDaily(df: DataFrame, keyCols: Seq[String], dateCol: String,
      valueCols: Seq[String]): DataFrame =
    fillLast(df, keyCols, dateCol, valueCols, "day", forward = true)

  /** [[gapFillDaily]]'s mirror — BACKWARD fill (pandas `bfill`): each
    * grid day takes the NEXT observation at-or-after it. The grid
    * ends at each key's last observation, so every output value is
    * defined (no head/tail asymmetry to document away). Same linear
    * reversed-running-frame discipline as the interpolation anchors —
    * never an unboundedFollowing frame.
    */
  def gapFillDailyBackward(df: DataFrame, keyCols: Seq[String],
      dateCol: String, valueCols: Seq[String]): DataFrame =
    fillLast(df, keyCols, dateCol, valueCols, "day", forward = false)

  /** [[gapFillDaily]]'s linear sibling: gap buckets interpolate
    * between the surrounding observations (value = prev + (next −
    * prev) × elapsed/gap); buckets at-or-after the last observation
    * HOLD it (locf tail — interpolation has nothing to aim at).
    * Output values are DOUBLE. Same one-data-shuffle interleave: the
    * backward (`last` ignoreNulls) and forward (`first` ignoreNulls)
    * anchor scans ride the same per-key sort; at an observed bucket
    * the grid row's elapsed is 0, so the formula degenerates to the
    * observation exactly (no branch needed for bit-equality with the
    * LEFT-JOIN oracle formulation). Elapsed/gap is measured in days
    * (`datediff`) for DateType columns and in seconds
    * (`unix_timestamp`) for timestamps — both are linear in real
    * time, so unequal month lengths interpolate correctly.
    */
  def gapFillInterpolate(df: DataFrame, keyCols: Seq[String], dateCol: String,
      valueCols: Seq[String]): DataFrame =
    interpolate(df, keyCols, dateCol, valueCols, "day")

  private def interpolate(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCols: Seq[String], grain: String): DataFrame = {
    val k = keyCols.map(col)
    val isDate = df.schema(timeCol).dataType == DateType
    def elapsed(a: Column, b: Column): Column =
      if (isDate) datediff(a, b).cast("double")
      else (unix_timestamp(a) - unix_timestamp(b)).cast("double")
    // BOTH anchor scans are running (unboundedPreceding → current)
    // frames: the forward anchor uses a REVERSED sort instead of an
    // unboundedFollowing frame, because Spark's following-frame
    // implementation re-scans current→end per row — O(partition²),
    // measured 18× slower on the p143 gate. Two O(n log n) sorts
    // beat one quadratic frame.
    val wPrev = Window.partitionBy(k: _*)
      .orderBy(col(timeCol).asc, col("__obs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(k: _*)
      .orderBy(col(timeCol).desc, col("__obs").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def fill(c: String) = {
      val prevV = last(col(c), ignoreNulls = true).over(wPrev)
      val prevD = last(when(col(c).isNotNull, col(timeCol)),
        ignoreNulls = true).over(wPrev)
      val nextV = last(col(c), ignoreNulls = true).over(wNext)
      val nextD = last(when(col(c).isNotNull, col(timeCol)),
        ignoreNulls = true).over(wNext)
      when(nextD.isNull || nextD === prevD, prevV)
        .otherwise(prevV + (nextV - prevV) *
          (elapsed(col(timeCol), prevD) / elapsed(nextD, prevD)))
        .as(c)
    }
    gridUnion(df, keyCols, timeCol, valueCols, grain, _ => DoubleType)
      .select((k :+ col(timeCol) :+ col("__obs")) ++ valueCols.map(fill): _*)
      .where(col("__obs") === 0).drop("__obs")
  }
}
