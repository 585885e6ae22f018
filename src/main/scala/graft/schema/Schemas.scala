package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the auction medallion pipeline.
  *
  * Shapes derived from the reference's writer models
  * (reference `data_pipeline/utils/database.py:10-38`) and the raw
  * Blizzard payload consumed at
  * `data_pipeline/assets/silver/transformation.py:21-55`.
  * Schema-on-read is always explicit — never inferred — so absent
  * fields surface as NULL columns (T4) instead of schema drift.
  */
object Schemas {

  /** One element of the bronze `auctions` array.
    * `unit_price` appears on commodity auctions, `buyout`/`bid` on
    * item auctions; all prices in copper.
    */
  val rawAuction: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("item", StructType(Seq(
      StructField("id", LongType),
      StructField("modifiers", ArrayType(StructType(Seq(
        StructField("type", IntegerType),
        StructField("value", IntegerType)))))
    ))),
    StructField("quantity", LongType),
    StructField("unit_price", LongType),
    StructField("buyout", LongType),
    StructField("bid", LongType),
    StructField("time_left", StringType)
  ))

  /** Top-level bronze snapshot document
    * (reference `data_pipeline/assets/bronze/ingestion.py:35-40`).
    */
  val rawSnapshot: StructType = StructType(Seq(
    StructField("connected_realm", StructType(Seq(StructField("id", LongType)))),
    StructField("auctions", ArrayType(rawAuction))
  ))

  /** silver_auctions fact (reference `data_pipeline/utils/database.py:10-22`). */
  val silverAuction: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("item_id", LongType),
    StructField("quantity", IntegerType),
    StructField("unit_price", LongType),
    StructField("buyout", LongType),
    StructField("time_left", StringType),
    StructField("modifiers", ArrayType(StructType(Seq(
      StructField("type", IntegerType),
      StructField("value", IntegerType))))),
    StructField("snapshot_date", DateType),
    StructField("created_at", TimestampType)
  ))

  /** dim_items (reference `data_pipeline/utils/database.py:29-38`). */
  val itemDim: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("quality", StringType),
    StructField("item_class", StringType),
    StructField("item_subclass", StringType),
    StructField("icon_url", StringType),
    StructField("last_updated", TimestampType)
  ))

  /** Raw item-API payload consumed by the dim enrichment transform
    * (reference `data_pipeline/assets/silver/dimensions.py:43-52`).
    */
  val rawItemPayload: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("quality", StructType(Seq(StructField("name", StringType)))),
    StructField("item_class", StructType(Seq(StructField("name", StringType)))),
    StructField("item_subclass", StructType(Seq(StructField("name", StringType))))
  ))
}

/** Typed row models (Dataset[T] views over the same schemas). */
case class SilverAuction(
    id: Long,
    item_id: Option[Long],
    quantity: Option[Int],
    unit_price: Option[Long],
    buyout: Option[Long],
    time_left: Option[String],
    snapshot_date: java.sql.Date,
    created_at: java.sql.Timestamp)

case class ItemDim(
    item_id: Long,
    name: Option[String],
    quality: String,
    item_class: String,
    item_subclass: String,
    icon_url: Option[String],
    last_updated: Option[java.sql.Timestamp])
