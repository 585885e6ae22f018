package graft.gold

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit layer for the gold marts: G3 with <7 days of history, G4
  * last-day semantics, G5 buckets, G2 deterministic open/close.
  */
class MartsSpec extends SparkSpec {

  import spark.implicits._

  private def silver(rows: (Long, String, Int, Long)*): DataFrame =
    rows.toDF("item_id", "d", "quantity", "unit_price")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")

  test("G3: single-day history -> null stddev -> null z -> HOLD") {
    val daily = Seq((1L, "2026-01-01", 100.0))
      .toDF("item_id", "d", "median_buyout")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val g3 = Marts.marketOpportunities(daily).collect()
    assert(g3.length === 1)
    val r = g3.head
    assert(r.getAs[Any]("std_dev_7d") === null)
    assert(r.getAs[Any]("z_score") === null)
    assert(r.getAs[String]("recommendation") === "HOLD")
  }

  test("G3: constant prices -> stddev 0 -> null z (not infinity)") {
    val daily = (1 to 5).map(i => (1L, f"2026-01-0$i", 100.0))
      .toDF("item_id", "d", "median_buyout")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val last = Marts.marketOpportunities(daily)
      .where("snapshot_date = DATE'2026-01-05'").head()
    assert(last.getAs[Any]("z_score") === null)
    assert(last.getAs[String]("recommendation") === "HOLD")
  }

  test("G3: 7-day window is trailing (range, not rows)") {
    // 10 days of prices 1..10 for one item; on day 10 the window covers
    // days 4-10 -> avg = 7
    val daily = (1 to 10).map(i => (1L, f"2026-01-$i%02d", i.toDouble))
      .toDF("item_id", "d", "median_buyout")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val r = Marts.marketOpportunities(daily)
      .where("snapshot_date = DATE'2026-01-10'").head()
    assert(math.abs(r.getAs[Double]("avg_price_7d") - 7.0) < 1e-12)
  }

  test("G4: disappearance demand + last-day-unknowable semantics") {
    // listings: (id, item, qty, day). id 10 disappears after day1,
    // id 11 survives to day2, id 12 appears day2 (day2 has no successor).
    val bronze = Seq(
      (10L, 1L, 5L, "2026-01-01"),
      (11L, 1L, 3L, "2026-01-01"),
      (11L, 1L, 3L, "2026-01-02"),
      (12L, 1L, 7L, "2026-01-02"))
      .toDF("id", "item_id", "quantity", "d")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val g4 = Marts.itemDemand(bronze).collect()
    // only day1 emits (day2 lacks a successor snapshot)
    assert(g4.map(_.getAs[Date]("snapshot_date").toString).toSeq === Seq("2026-01-01"))
    val r = g4.head
    assert(r.getAs[Long]("estimated_daily_sales") === 5L) // id 10's qty
    assert(math.abs(r.getAs[Double]("turnover_percentage") - 5.0 / 8.0 * 100.0) < 1e-9)
  }

  test("G4: nothing disappears -> zero sales row, not missing row") {
    val bronze = Seq(
      (10L, 1L, 5L, "2026-01-01"),
      (10L, 1L, 5L, "2026-01-02"))
      .toDF("id", "item_id", "quantity", "d")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val g4 = Marts.itemDemand(bronze).collect()
    assert(g4.length === 1)
    assert(g4.head.getAs[Long]("estimated_daily_sales") === 0L)
  }

  test("G5: floor concentration buckets") {
    val s = silver(
      (1L, "2026-01-01", 90, 100L), // at floor
      (1L, "2026-01-01", 10, 200L),
      (2L, "2026-01-01", 1, 50L),
      (2L, "2026-01-01", 9, 60L))
    val g5 = Marts.marketConcentration(s).collect()
      .map(r => r.getAs[Long]("item_id") ->
        (r.getAs[Double]("floor_concentration_pct"), r.getAs[String]("market_status"))).toMap
    assert(g5(1L)._1 === 90.0)
    assert(g5(1L)._2 === "MONOPOLIZED")
    assert(g5(2L)._1 === 10.0)
    assert(g5(2L)._2 === "HEALTHY")
  }

  test("G5: null prices don't float the floor; all-null group floors at 0") {
    // item 1: floor is the min NON-null price (50); the null-price
    // row's quantity counts in the total but never at the floor.
    // item 2: all prices null -> quantity_at_floor 0 (not null).
    val rows = Seq(
      (1L, "2026-01-01", 3, Some(50L)),
      (1L, "2026-01-01", 5, Some(60L)),
      (1L, "2026-01-01", 2, None: Option[Long]),
      (2L, "2026-01-01", 4, None: Option[Long]))
      .toDF("item_id", "d", "quantity", "unit_price")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val g5 = Marts.marketConcentration(rows).collect()
      .map(r => r.getAs[Long]("item_id") ->
        (r.getAs[Long]("total_market_quantity"), r.getAs[Long]("quantity_at_floor"))).toMap
    assert(g5(1L) === ((10L, 3L)))
    assert(g5(2L) === ((4L, 0L)))
  }

  test("G2: open/close deterministic under timestamp ties") {
    val ticks = Seq(
      (1L, "2026-01-01 10:00:00", 100L, 1L),
      (1L, "2026-01-01 10:00:00", 90L, 1L), // same ts: open breaks tie by price asc
      (1L, "2026-01-01 10:59:00", 200L, 1L),
      (1L, "2026-01-01 10:59:00", 210L, 1L)) // same ts: close tie by price desc
      .toDF("item_id", "t", "unit_price", "quantity")
      .withColumn("created_at", col("t").cast("timestamp")).drop("t")
    val g2 = Marts.priceHistory(ticks).head()
    assert(g2.getAs[Double]("open_price") === 90.0)
    assert(g2.getAs[Double]("close_price") === 210.0)
    assert(g2.getAs[Long]("high_price") === 210L)
    assert(g2.getAs[Long]("low_price") === 90L)
    assert(g2.getAs[Long]("volume") === 4L)
  }

  test("G6: inflation is day-over-day pct change of the index") {
    val daily = Seq(
      (1L, "2026-01-01", 100.0), (2L, "2026-01-01", 300.0),
      (1L, "2026-01-02", 110.0), (2L, "2026-01-02", 330.0))
      .toDF("item_id", "d", "median_buyout")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val g6 = Marts.marketIndex(daily).orderBy("snapshot_date").collect()
    assert(g6.head.getAs[Any]("inflation_pct_daily") === null)
    assert(math.abs(g6(1).getAs[Double]("inflation_pct_daily") - 10.0) < 1e-9)
    assert(g6(1).getAs[Long]("items_in_index") === 2L)
  }

  test("G10: momentum lags the previous OBSERVED day; first day NULL; exact deltas") {
    val silver = Seq(
      // item 1: days 1, 2, 4 (gap at day 3 — lag must carry day 2)
      (1L, 5, 100L, "2026-01-01"), (1L, 5, 90L, "2026-01-01"),
      (1L, 5, 120L, "2026-01-02"),
      (1L, 5, 60L, "2026-01-04"),
      // item 2: single day -> NULL prev only
      (2L, 1, 10L, "2026-01-02"))
      .toDF("item_id", "quantity", "unit_price", "d")
      .withColumn("snapshot_date", col("d").cast("date")).drop("d")
    val rows = Marts.priceMomentum(silver)
      .orderBy("item_id", "snapshot_date").collect()
    assert(rows.length === 4)
    val (d1, d2, d4, i2) = (rows(0), rows(1), rows(2), rows(3))
    assert(d1.getAs[Long]("min_price") === 90L && d1.getAs[Any]("prev_min_price") === null)
    assert(d2.getAs[Long]("prev_min_price") === 90L &&
      d2.getAs[Long]("price_delta") === 30L)
    assert(math.abs(d2.getAs[Double]("pct_change") - 30.0 / 90.0) < 1e-12)
    // the day-3 gap: day 4 lags day 2's floor, not a calendar NULL
    assert(d4.getAs[Long]("prev_min_price") === 120L &&
      d4.getAs[Long]("price_delta") === -60L)
    assert(i2.getAs[Any]("prev_min_price") === null &&
      i2.getAs[Any]("pct_change") === null)
  }
}
