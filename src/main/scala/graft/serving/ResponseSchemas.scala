package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The reference API's RESPONSE projections (round-17, verdict ask
  * #4): each FastAPI route serializes its ORM rows through a pydantic
  * `response_model` (`backend_api/app/schemas.py:5-82`), which is a
  * real projection layer on top of the gold tables — fields the model
  * does not declare are DROPPED from the response (e.g.
  * `MarketOpportunityResponse` omits the table's `std_dev_7d`,
  * `ItemDemandResponse` omits `icon_url`/`avg_daily_stock`,
  * `MarketConcentrationResponse` omits the quantity columns,
  * `ItemResponse` omits `last_updated`), and declared fields the
  * mart's producer never populates serialize as `null` (the ORM
  * column exists on every gold model, so pydantic's
  * `from_attributes` reads the attribute and finds the table's
  * never-written NULL — `item_name` outside the daily summary,
  * `icon_url` outside summary/opportunities).
  *
  * Each `Seq` below pins one response model's declared fields IN
  * DECLARATION ORDER (pydantic serializes in declaration order);
  * [[project]] applies the projection to a serving query's output.
  * ServingSchemaSpec asserts names AND order per endpoint; the
  * `serve_*_schema` gates hash-pin the projected values (the driver
  * compare is column-order-insensitive, so order lives in the spec).
  *
  * `schemas.py` declares one further model, `AuctionResponse`
  * (`schemas.py:14-22`): no route in `main.py` binds it — dead code
  * like the `MarketHistory` draft (`utils/database.py:46-48`) and
  * the recursive `insert_item_dimensions` copy — so it is
  * deliberately NOT reproduced here; the seven models above are the
  * complete live response surface.
  */
object ResponseSchemas {

  /** GET /items/ → ItemResponse (`schemas.py:5-12`): drops the
    * dim table's `last_updated`.
    */
  val items: Seq[String] = Seq(
    "item_id", "name", "quality", "item_class", "item_subclass", "icon_url")

  /** GET /analytics/daily-summary → DailyMarketSummaryResponse
    * (`schemas.py:24-36`): every gold column, but pydantic's
    * declaration order leads with the enrichment pair
    * (item_name, icon_url) before the measures — a pure reorder of
    * the mart.
    */
  val dailySummary: Seq[String] = Seq(
    "item_id", "snapshot_date", "item_name", "icon_url", "min_buyout",
    "max_buyout", "median_buyout", "quantity_available", "market_cap",
    "price_volatility", "auction_count")

  /** GET /analytics/price-history → PriceHistoryResponse
    * (`schemas.py:38-48`): declares `item_name` (the gold table has
    * the column, `models.py:53`, but no producer fills it → null) and
    * preserves the reference's `avarage_price` misspelling.
    */
  val priceHistory: Seq[String] = Seq(
    "item_id", "snapshot_hour", "item_name", "open_price", "high_price",
    "low_price", "close_price", "avarage_price", "volume")

  /** GET /analytics/opportunities → MarketOpportunityResponse
    * (`schemas.py:50-59`): drops the table's `std_dev_7d`
    * (`models.py:70`) — the z-score's own input is not served — and
    * declares never-populated `item_name`/`icon_url`.
    */
  val opportunities: Seq[String] = Seq(
    "snapshot_date", "item_id", "item_name", "icon_url", "current_price",
    "avg_price_7d", "z_score", "recommendation")

  /** GET /analytics/demand → ItemDemandResponse (`schemas.py:61-67`):
    * drops `icon_url` and `avg_daily_stock` (`models.py:81,83`),
    * declares never-populated `item_name`.
    */
  val demand: Seq[String] = Seq(
    "snapshot_date", "item_id", "item_name", "estimated_daily_sales",
    "turnover_percentage")

  /** GET /analytics/concentration → MarketConcentrationResponse
    * (`schemas.py:69-75`): drops `icon_url`, `total_market_quantity`
    * and `quantity_at_floor` (`models.py:93-95`) — only the derived
    * percentage and status are served — and declares never-populated
    * `item_name`.
    */
  val concentration: Seq[String] = Seq(
    "snapshot_date", "item_id", "item_name", "floor_concentration_pct",
    "market_status")

  /** GET /analytics/market-index → MarketIndexResponse
    * (`schemas.py:77-82`): exactly the gold table.
    */
  val marketIndex: Seq[String] = Seq(
    "snapshot_date", "items_in_index", "index_value", "inflation_pct_daily")

  /** Declared-but-never-populated columns and the SQL type their
    * NULLs carry (both are String columns on every gold model).
    */
  private val nullableFills = Map(
    "item_name" -> "string",
    "icon_url" -> "string")

  /** Apply a response model's projection to a serving query's output:
    * declared fields in declaration order; a declared field absent
    * from the frame materializes as a typed NULL (the ORM column
    * exists but no producer writes it — pydantic serves the table's
    * NULL); any OTHER missing field is a contract violation and
    * fails loudly rather than papering over a renamed mart column.
    */
  def project(df: DataFrame, fields: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    df.select(fields.map { f =>
      if (have(f)) col(f)
      else nullableFills.get(f) match {
        case Some(t) => lit(null).cast(t).as(f)
        case None => throw new IllegalArgumentException(
          s"response field '$f' missing from serving output " +
            s"(${df.columns.mkString(", ")}) and not a known " +
            "never-populated column")
      }
    }: _*)
  }
}
