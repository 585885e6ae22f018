package graft.silver

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DimensionsSpec extends SparkSpec {

  import spark.implicits._

  private def dims = Seq(
    (1L, "Sword", "Epic", "Weapon", "Sword", null: String),
    (2L, null: String, "Unknown", "Misc", "Junk", null: String))
    .toDF("item_id", "name", "quality", "item_class", "item_subclass", "icon_url")
    .withColumn("last_updated", lit(null).cast("timestamp"))

  test("R2 extended: missing ids AND null-name retry ids are picked") {
    val facts = Seq(1L, 2L, 3L).toDF("item_id")
    val got = Dimensions.missingItemIds(facts, dims)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L)) // 2 = null-name retry, 3 = missing
  }

  test("S6 upsert: keyed uniquely by item_id, updates win") {
    val updates = Seq(
      (2L, "Linen Cloth", "Common", "Trade Goods", "Cloth", null: String),
      (3L, "Ore", "Common", "Trade Goods", "Metal", null: String))
      .toDF("item_id", "name", "quality", "item_class", "item_subclass", "icon_url")
      .withColumn("last_updated", lit(null).cast("timestamp"))
    val out = Dimensions.upsert(dims, updates)
    assert(out.count() === 3)
    assert(out.groupBy("item_id").count().where("count > 1").count() === 0)
    assert(out.where("item_id = 2").select("name").head().getString(0) === "Linen Cloth")
    assert(out.where("item_id = 1").select("name").head().getString(0) === "Sword")
  }

  test("T11 enrich: defaults for partial payloads, 404 skipped") {
    val source = new Dimensions.ItemMetadataSource {
      override def fetch(itemId: Long): Option[Dimensions.ItemPayload] = itemId match {
        case 1L => Some(Dimensions.ItemPayload(Some("X"), None, None, None))
        case _ => None
      }
    }
    val out = Dimensions.enrich(spark, Seq(1L, 2L), source).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("quality") === "Unknown")
    assert(r.getAs[String]("item_class") === "Misc")
    assert(r.getAs[String]("item_subclass") === "Junk")
    assert(r.getAs[String]("icon_url") === null)
  }
}
