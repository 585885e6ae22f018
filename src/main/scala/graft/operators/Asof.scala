package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — the classic trades/quotes operator
  * Spark's DataFrame API lacks (pandas `merge_asof`, DuckDB/QuestDB
  * `ASOF JOIN`).
  *
  * For every left row, attach the single right row with the greatest
  * event time at or before the left row's time (strictly before with
  * `allowExactMatches = false`), matching on equality keys, optionally
  * rejecting matches older than `toleranceMicros`.
  *
  * Shape — union + carry-forward, NOT a range join:
  * both sides are unioned into one stream keyed by the equality
  * columns, sorted by (time, side, tie) inside each key, and the last
  * non-null right payload is carried forward with a running
  * `last(ignoreNulls)` window. That is ONE hash exchange + one
  * in-partition sort, independent of how many right rows precede each
  * left row. The naive alternative — a `left.ts >= right.ts`
  * range-condition join — materializes every (left, prior-right) pair
  * before keeping the max: quadratic per key, a non-starter when a
  * 100 TB key has millions of quotes. (The DuckDB oracle for the p32
  * gate deliberately runs that join+rank shape at sf0.01 — a
  * structurally different algorithm agreeing on the result.)
  *
  * Determinism: right rows tied on the SAME timestamp are resolved by
  * `rightTie` ascending (last wins) — callers pass a unique column
  * (an event id), making output independent of partitioning and task
  * replay. Left rows never race: each left row is its own window
  * frame endpoint.
  *
  * Skew: one hot equality key serializes into one sort task, like any
  * keyed window. At that shape, use [[joinAsOfBinned]] — the time
  * axis joins into the shuffle key, spreading a hot key over its
  * range, at the cost of tolerance/bucket right-row replication.
  * Not the default because the replication factor is real money when
  * keys are well-distributed.
  */
object Asof {

  /** @param on        equality key columns (must exist on both sides)
    * @param leftTime  left event-time column (orderable; micros
    *                  timestamp or numeric)
    * @param rightTime right event-time column, same type as leftTime
    * @param rightTie  unique NUMERIC right column breaking equal-time
    *                  ties (greatest wins; cast to long internally)
    * @param rightCols right columns to carry (default: all but keys),
    *                  emitted as `rightPrefix + name`, NULL when no
    *                  right row qualifies
    * @param toleranceMicros max left-right time distance (micros when
    *                  the time columns are timestamps); matches farther
    *                  back are nulled out
    * @param allowExactMatches right.time == left.time counts (true,
    *                  the pandas default) or only strictly-before
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightCols: Seq[String] = Nil,
      rightPrefix: String = "right_",
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    joinAsOfDir(left, right, on, leftTime, rightTime, rightTie, rightCols,
      rightPrefix, toleranceMicros, allowExactMatches, forward = false)

  /** FORWARD as-of: for every left row, the single right row with the
    * SMALLEST event time at or after the left row's time (strictly
    * after with `allowExactMatches = false`) — "next reading binds",
    * the mirror of [[joinAsOf]]'s "latest quote binds". Same union +
    * carry shape (ONE exchange + one sort; here the FIRST non-null
    * right payload over the following frame), same NULL-key/NULL-time
    * semantics, same tolerance contract with the distance measured
    * forward. Equal-time right ties resolve by `rightTie` ascending
    * (FIRST wins — the earliest-following convention), again making
    * output independent of partitioning and replay.
    */
  def joinAsOfForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightCols: Seq[String] = Nil,
      rightPrefix: String = "right_",
      toleranceMicros: Option[Long] = None,
      allowExactMatches: Boolean = true): DataFrame =
    joinAsOfDir(left, right, on, leftTime, rightTime, rightTie, rightCols,
      rightPrefix, toleranceMicros, allowExactMatches, forward = true)

  private def joinAsOfDir(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTie: String,
      rightCols: Seq[String],
      rightPrefix: String,
      toleranceMicros: Option[Long],
      allowExactMatches: Boolean,
      forward: Boolean): DataFrame = {
    require(on.nonEmpty, "joinAsOf needs at least one equality key")
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(on.contains)
    // Mismatched time types would fail later at analysis inside the
    // carried struct (a confusing unix_micros error) or silently
    // corrupt the union sort order — reject them up front, and require
    // BOTH sides to be timestamps whenever the tolerance (expressed in
    // micros) is set, not just the left.
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt,
      s"joinAsOf time columns must share one type; got $leftTime: ${lt.simpleString}, $rightTime: ${rt.simpleString}")
    require(toleranceMicros.isEmpty || lt.typeName == "timestamp",
      "toleranceMicros requires timestamp time columns on both sides")

    val leftCols = left.columns.toSeq
    // side ordinal places right rows on the FRAME side of the left row
    // at EQUAL time when exact matches count, outside it when they
    // don't — the carry window then includes/excludes them by sort
    // position alone. Backward frame looks left (exact right rows sort
    // BEFORE), forward frame looks right (exact right rows sort AFTER).
    val rightSide =
      if (allowExactMatches == !forward) lit(0) else lit(2)

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select((rightTime +: carry.filterNot(_ == rightTime))
            .map(col): _*).schema.fields)))
      .select(on.map(col) ++ Seq(col("__t"), col("__side"), col("__tie"),
        col("__r")) ++ leftCols.filterNot(on.contains).map(col): _*)

    // SQL equi-join semantics: a NULL key matches nothing, and a row
    // with NULL event time can never be "at or before" anything —
    // without this filter, NULL-keyed rows of both sides share a
    // window partition and a NULL-time right row sorts FIRST (nulls
    // first) and gets carried forward as a bogus universal match.
    // Left rows always survive (left-join shape): a NULL-keyed or
    // NULL-time left row simply finds no prior state.
    val r = right
      .where(on.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", rightSide)
      .withColumn("__tie", col(rightTie).cast("long"))
      .withColumn("__r", struct((rightTime +: carry.filterNot(_ == rightTime))
        .map(col): _*))
      .select(on.map(col) ++ Seq(col("__t"), col("__side"), col("__tie"),
        col("__r")) ++ leftCols.filterNot(on.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val wBase = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
    // the forward carry runs over the EXACT REVERSE of wBase's order
    // (desc with nulls last mirrors asc-nulls-first) as a RUNNING
    // frame: Spark's unboundedFollowing frame re-scans current→end
    // per row — O(partition²) on a hot key — while the reversed
    // running `last` is the same row for every input, linearly
    // (same finding as Resample.gapFillInterpolate, 12× there)
    val wBaseRev = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").desc_nulls_last, col("__side").desc,
        col("__tie").desc_nulls_last)
    val carried =
      if (forward)
        last(col("__r"), ignoreNulls = true).over(
          wBaseRev.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        last(col("__r"), ignoreNulls = true).over(
          wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    val matchedRaw = l.unionByName(r)
      .withColumn("__m", carried)
      .where(col("__side") === 1)

    // tolerance: a carried match farther than the horizon (back for
    // backward, ahead for forward) is no match
    val matched = toleranceMicros match {
      case Some(tol) =>
        val dist =
          if (forward)
            unix_micros(col("__m")(rightTime)) - unix_micros(col("__t"))
          else
            unix_micros(col("__t")) - unix_micros(col("__m")(rightTime))
        matchedRaw.withColumn("__m",
          when(col("__m").isNotNull && dist <= tol, col("__m")))
      case None => matchedRaw
    }

    val outRight = (rightTime +: carry.filterNot(_ == rightTime))
      .map(c => col("__m")(c).as(rightPrefix + c))
    matched.select(leftCols.map(col) ++ outRight: _*)
  }

  /** The hot-key escape hatch, implemented: as-of join as a BINNED
    * range join. Each right row's validity interval [t, t + tolerance]
    * is replicated into the `bucketMicros` buckets it covers
    * ([[RangeJoin.pointInInterval]]), candidates resolve per left row
    * with one `max_by((t, tie))` aggregation, and unmatched left rows
    * come back via a left anti-free join on the left's own columns.
    *
    * Trade vs [[joinAsOf]]: the shuffle key is (key, bucket), so ONE
    * hot key spreads over its time range instead of serializing into
    * a single sort task — at the cost of tolerance/bucket-factor
    * right-row replication and a second aggregation. Use when a key's
    * history exceeds a task's sort budget; otherwise the carry-forward
    * plan is cheaper. Requires a finite tolerance (it bounds the
    * replication factor) and timestamp time columns; exact-time
    * matches always count (the pandas default).
    *
    * AsofSpec proves result-equivalence to `joinAsOf` on shared
    * fixtures and randomized streams.
    */
  def joinAsOfBinned(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      rightTie: String,
      toleranceMicros: Long,
      bucketMicros: Long,
      rightCols: Seq[String] = Nil,
      rightPrefix: String = "right_"): DataFrame = {
    require(on.nonEmpty, "joinAsOfBinned needs at least one equality key")
    require(toleranceMicros >= 0 && bucketMicros > 0,
      "tolerance must be >= 0 and bucket > 0")
    require(left.schema(leftTime).dataType.typeName == "timestamp" &&
      right.schema(rightTime).dataType.typeName == "timestamp",
      "joinAsOfBinned requires timestamp time columns on both sides")
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(on.contains)
    val orderedCarry = rightTime +: carry.filterNot(_ == rightTime)
    val leftCols = left.columns.toSeq

    val points = left.withColumn("__pt", unix_micros(col(leftTime)))
    val intervals = right
      .where(on.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(on.map(col) ++ Seq(
        unix_micros(col(rightTime)).as("__rt"),
        col(rightTie).cast("long").as("__tie"),
        struct(orderedCarry.map(col): _*).as("__r")): _*)
      .withColumn("__lo", col("__rt"))
      .withColumn("__hi", col("__rt") + toleranceMicros)

    // distinct probe grain: left rows sharing (key, time) resolve once
    val best = RangeJoin.pointInInterval(
      points.select(on.map(col) :+ col("__pt"): _*).distinct(),
      intervals, on, "__pt", "__lo", "__hi", bucketMicros)
      .groupBy((on.map(col) :+ col("__pt")): _*)
      .agg(max_by(col("__r"), struct(col("__rt"), col("__tie"))).as("__m"))

    val joined = points.join(best, on :+ "__pt", "left")
    val outRight = orderedCarry.map(c => col("__m")(c).as(rightPrefix + c))
    joined.select(leftCols.map(col) ++ outRight: _*)
  }
}
