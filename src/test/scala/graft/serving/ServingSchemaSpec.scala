package graft.serving

import graft.SparkSpec

/** Pins every endpoint's response projection — names AND declaration
  * order — against the reference's pydantic response models
  * (`backend_api/app/schemas.py:5-82`). The `serve_*_schema` driver
  * gates hash-pin the projected VALUES; the driver's compare sorts
  * columns by name, so this spec is where the serialization ORDER
  * contract lives.
  */
class ServingSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // .columns resolves the analyzed schema only — no job runs
  private def cols(name: String): Seq[String] =
    graft.SparkEntry.queries(name)(spark, dir).columns.toSeq

  // building the serve queries registers their marts in the shared
  // session's mart cache; left behind, a LATER suite's plan-shape
  // assertions would see InMemoryTableScan where they pin exchanges
  // (PlanSpec's G1 test — caught by the round-17 suite run)
  override def afterAll(): Unit = {
    graft.queries.TestdataAdapter.clearCache(spark, dir)
    super.afterAll()
  }

  test("response projections match schemas.py field declaration order") {
    assert(cols("serve_items_schema") === ResponseSchemas.items)
    assert(cols("serve_daily_summary_schema") === ResponseSchemas.dailySummary)
    assert(cols("serve_price_history_schema") === ResponseSchemas.priceHistory)
    assert(cols("serve_opportunities_schema") === ResponseSchemas.opportunities)
    assert(cols("serve_demand_schema") === ResponseSchemas.demand)
    assert(cols("serve_concentration_schema") === ResponseSchemas.concentration)
    assert(cols("serve_market_index_schema") === ResponseSchemas.marketIndex)
  }

  test("pinned field lists restate schemas.py verbatim") {
    // the declaration-order lists themselves (so a drive-by edit to
    // ResponseSchemas can't silently re-order a model and have the
    // first test pass vacuously against the same wrong list)
    assert(ResponseSchemas.items === Seq("item_id", "name", "quality",
      "item_class", "item_subclass", "icon_url")) // schemas.py:5-12
    assert(ResponseSchemas.dailySummary === Seq("item_id", "snapshot_date",
      "item_name", "icon_url", "min_buyout", "max_buyout", "median_buyout",
      "quantity_available", "market_cap", "price_volatility",
      "auction_count")) // schemas.py:24-36
    assert(ResponseSchemas.priceHistory === Seq("item_id", "snapshot_hour",
      "item_name", "open_price", "high_price", "low_price", "close_price",
      "avarage_price", "volume")) // schemas.py:38-48, avarage sic
    assert(ResponseSchemas.opportunities === Seq("snapshot_date", "item_id",
      "item_name", "icon_url", "current_price", "avg_price_7d", "z_score",
      "recommendation")) // schemas.py:50-59 — std_dev_7d NOT served
    assert(ResponseSchemas.demand === Seq("snapshot_date", "item_id",
      "item_name", "estimated_daily_sales",
      "turnover_percentage")) // schemas.py:61-67 — no avg_daily_stock
    assert(ResponseSchemas.concentration === Seq("snapshot_date", "item_id",
      "item_name", "floor_concentration_pct",
      "market_status")) // schemas.py:69-75 — no quantity columns
    assert(ResponseSchemas.marketIndex === Seq("snapshot_date",
      "items_in_index", "index_value",
      "inflation_pct_daily")) // schemas.py:77-82
  }

  test("never-populated columns null-fill as string; any other gap fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, to_date}
    val df = Seq((1L, "x")).toDF("item_id", "market_status")
    // item_name is a known ORM column no producer writes → typed NULL
    val filled = ResponseSchemas.project(
      df.withColumn("snapshot_date", to_date(lit("2026-01-01")))
        .withColumn("floor_concentration_pct", col("item_id").cast("double")),
      ResponseSchemas.concentration)
    assert(filled.schema("item_name").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(filled.collect().forall(_.isNullAt(2)))
    // a missing DECLARED-AND-POPULATED field is a contract violation,
    // not a silent null — a renamed mart column must not ship as null
    val e = intercept[IllegalArgumentException] {
      ResponseSchemas.project(df, ResponseSchemas.concentration)
    }
    assert(e.getMessage.contains("snapshot_date"))
  }
}
