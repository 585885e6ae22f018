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

  test("opportunities: no limit, NULL-z rows included and sorted last") {
    // reference main.py:57 — .order_by(z_score.asc()).all(): no LIMIT,
    // and Postgres ASC sorts NULLs last.
    val rows = (1L to 150L).map(i => (i, Option(-3.0 + i * 0.01), "BUY")) :+
      ((151L, None: Option[Double], "BUY"))
    val df = rows.toDF("item_id", "z_score", "recommendation")
      .withColumn("snapshot_date", org.apache.spark.sql.functions.lit("2026-01-01").cast("date"))
    val got = ServingLayer.opportunities(df, recommendation = Some("buy")).collect()
    assert(got.length === 151) // > the old default limit of 100
    assert(got.last.isNullAt(got.last.fieldIndex("z_score"))) // NULLS LAST
    assert(got.head.getAs[Long]("item_id") === 1L) // min z first
  }

  test("bestOpportunity: NULLS-LAST head skips NULL z like pandas idxmin") {
    val df = Seq((1L, None: Option[Double], "HOLD"), (2L, Option(1.5), "SELL"))
      .toDF("item_id", "z_score", "recommendation")
      .withColumn("snapshot_date", org.apache.spark.sql.functions.lit("2026-01-01").cast("date"))
    val best = ServingLayer.bestOpportunity(df).collect()
    assert(best.map(_.getAs[Long]("item_id")).toSeq === Seq(2L))
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
