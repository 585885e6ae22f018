package graft.silver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** Incremental dimension enrichment (SURVEY §2 R2/T11/S6/S9).
  *
  * The reference finds item ids present in facts but missing from
  * dim_items — or present with a NULL name (retry semantics) — via SQL
  * executed in Postgres (reference
  * `data_pipeline/utils/postgres_client.py:68-81`), fetches metadata
  * per id over REST (`data_pipeline/assets/silver/dimensions.py:29-66`)
  * and upserts (`postgres_client.py:92-121`).
  */
object Dimensions {

  /** The metadata fetch is a driver-side network edge, not a Spark
    * operator — abstracted so tests inject fixtures. Returning None
    * models a 404 (skip) per reference `dimensions.py:55-58`.
    */
  trait ItemMetadataSource {
    def fetch(itemId: Long): Option[ItemPayload]
  }
  case class ItemPayload(
      name: Option[String],
      quality: Option[String],
      itemClass: Option[String],
      itemSubclass: Option[String])

  /** R2: ids needing enrichment. NOT a pure anti-join — dims rows that
    * exist but have a NULL name are re-picked for retry
    * (`postgres_client.py:73-81`): facts LEFT JOIN dims, keep
    * `d.item_id IS NULL OR d.name IS NULL`.
    *
    * `limit` caps the per-run fetch volume (API rate-limit guard,
    * default 100, `postgres_client.py:70`). Sorted before limiting so
    * the batch is deterministic.
    */
  def missingItemIds(facts: DataFrame, dims: DataFrame, limit: Int = 100): DataFrame = {
    val d = broadcast(dims.select(col("item_id"), col("name")))
    facts
      .select("item_id").where(col("item_id").isNotNull).distinct() // R1
      .join(d, Seq("item_id"), "left")
      .where(d("item_id").isNull || d("name").isNull)
      .select("item_id")
      .orderBy("item_id")
      .limit(limit) // R3
  }

  /** T11: payload -> dim row with the reference's defaults
    * (`dimensions.py:43-52`): quality "Unknown", item_class "Misc",
    * item_subclass "Junk", icon_url forced NULL.
    */
  def enrich(
      spark: SparkSession,
      ids: Seq[Long],
      source: ItemMetadataSource): DataFrame = {
    import spark.implicits._
    // Driver-side REST loop (<=100 ids/run by contract) — the fetch is
    // the bottleneck, not the data volume; parallelizing it over
    // executors would just move a rate-limited client around.
    val rows = ids.flatMap { id =>
      source.fetch(id).map(p => (id, p.name, p.quality, p.itemClass, p.itemSubclass))
    }
    rows
      .toDF("item_id", "name", "quality_raw", "class_raw", "subclass_raw")
      .select(
        col("item_id"),
        col("name"),
        coalesce(col("quality_raw"), lit("Unknown")).as("quality"),
        coalesce(col("class_raw"), lit("Misc")).as("item_class"),
        coalesce(col("subclass_raw"), lit("Junk")).as("item_subclass"),
        lit(null).cast("string").as("icon_url"),
        current_timestamp().as("last_updated"))
  }

  /** S6: upsert semantics — new rows replace matching dims rows
    * (`INSERT ... ON CONFLICT (item_id) DO UPDATE`). Without Delta in
    * the image, expressed as anti-join + union: dims keyed uniquely by
    * item_id in, uniquely out.
    */
  def upsert(dims: DataFrame, updates: DataFrame): DataFrame = {
    val cols = Schemas.itemDim.fieldNames.map(col).toSeq
    dims
      .join(broadcast(updates.select("item_id")), Seq("item_id"), "left_anti")
      .select(cols: _*)
      .unionByName(updates.select(cols: _*))
  }
}
