package graft.serving

import graft.SparkSpec

class ServingLayerSpec extends SparkSpec {

  import spark.implicits._

  test("T14: recommendation filter upper-cases the parameter") {
    val out = ServingLayer.opportunities(
      Seq((1L, -2.5, "BUY"), (2L, 2.5, "SELL"))
        .toDF("item_id", "z_score", "recommendation")
        .withColumn("snapshot_date", org.apache.spark.sql.functions.lit("2026-01-01").cast("date")),
      recommendation = Some("buy"))
    assert(out.collect().map(_.getAs[Long]("item_id")).toSeq === Seq(1L))
  }

  test("R5: absent optional filter keeps all rows") {
    val df = Seq((1L, -2.5, "BUY"), (2L, 2.5, "SELL"))
      .toDF("item_id", "z_score", "recommendation")
      .withColumn("snapshot_date", org.apache.spark.sql.functions.lit("2026-01-01").cast("date"))
    assert(ServingLayer.opportunities(df, recommendation = None).count() === 2)
  }

  test("T12: copper formats with dot separators, null -> 0g") {
    val df = Seq(
      (1L, Some(12500000L)), // 1250 gold
      (2L, Some(9999L)), // < 1g
      (3L, None: Option[Long]))
      .toDF("id", "copper")
    val got = df.select(org.apache.spark.sql.functions.col("id"),
      ServingLayer.copperToGold(org.apache.spark.sql.functions.col("copper")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "1.250g")
    assert(got(2L) === "0g")
    assert(got(3L) === "0g")
  }

  test("R4: pagination pages are disjoint and ordered") {
    val dims = (1L to 30L).map(i => (i, s"item $i"))
      .toDF("item_id", "name")
    val p1 = ServingLayer.items(dims, skip = 0, limit = 10)
      .collect().map(_.getLong(0)).toSeq
    val p2 = ServingLayer.items(dims, skip = 10, limit = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 === (1L to 10L))
    assert(p2 === (11L to 20L))
  }
}
