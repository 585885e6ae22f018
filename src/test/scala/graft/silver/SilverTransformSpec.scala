package graft.silver

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.queries.Fixtures

/** Unit layer for the bronze→silver port (SURVEY §5 item 1): T5
  * coerce-to-null, T7 division guard, first-seen idempotence, input
  * validation — the edge semantics the reference encodes via pandas
  * `errors='coerce'` / fillna / ON CONFLICT DO NOTHING.
  */
class SilverTransformSpec extends SparkSpec {

  private def day1 = SilverTransform.fromJson(
    spark, Fixtures.materialize("t_day1.json", Fixtures.day1Json), Fixtures.day1Date)

  test("T1/T9: one silver row per auction, exact projection") {
    val df = day1
    assert(df.count() === 6)
    assert(df.columns.toSeq === Seq("id", "item_id", "quantity", "unit_price",
      "buyout", "time_left", "modifiers", "snapshot_date", "created_at"))
  }

  test("T3: missing item struct -> null item_id, not a crash") {
    val r = day1.where("id = 1004").select("item_id").head()
    assert(r.isNullAt(0))
  }

  test("T6: null quantity defaults to 1") {
    assert(day1.where("id = 1004").select("quantity").head().getInt(0) === 1)
  }

  test("T7: unit_price = buyout/quantity floored; quantity 0 -> null (no div error)") {
    val rows = day1.where("id in (1001, 1005, 1006)")
      .select("id", "unit_price").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1001L) === Some(1250000L))
    assert(rows(1005L) === None) // 5000 / 0 -> null, reference coerce semantics
    assert(rows(1006L) === Some(249L)) // floor(999/4), truncating like BigInteger sink
  }

  test("T7: explicit unit_price wins over derived") {
    assert(day1.where("id = 1002").select("unit_price").head().getLong(0) === 350L)
  }

  test("T5: lenient cast — string-typed numerics coerce, garbage -> null") {
    import spark.implicits._
    val raw = Seq(
      """{"auctions":[{"id": 1, "item": {"id": 5}, "quantity": 2, "unit_price": 10},
        |{"id": 2, "item": {"id": 5}, "quantity": 3}]}""".stripMargin.replace("\n", " "))
    // schemaless variant: read with a STRING-typed quantity to force the cast path
    val ds = spark.createDataset(raw)
    val parsed = spark.read
      .schema("auctions ARRAY<STRUCT<id: BIGINT, item: STRUCT<id: BIGINT>, quantity: STRING, unit_price: STRING>>")
      .json(ds)
    val silver = SilverTransform.normalize(
      SilverTransform.explodeAuctions(parsed)
        .withColumn("buyout", org.apache.spark.sql.functions.lit(null).cast("long"))
        .withColumn("time_left", org.apache.spark.sql.functions.lit(null).cast("string"))
        .withColumn("item", org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("item.id").as("id"),
          org.apache.spark.sql.functions.lit(null)
            .cast("array<struct<type:int,value:int>>").as("modifiers"))),
      Fixtures.day1Date)
    val got = silver.select("id", "quantity", "unit_price").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(got(1L) === ((2, 10L)))
    assert(got(2L) === ((3, -1L))) // unit_price absent -> null (no buyout either)
  }

  test("T2: document without auctions key is rejected") {
    val bad = Fixtures.materialize("t_bad.json", """{"connected_realm": {"id": 1}}""")
    val e = intercept[IllegalArgumentException] {
      SilverTransform.fromJson(spark, bad, Fixtures.day1Date)
    }
    assert(e.getMessage.contains("auctions"))
  }

  test("T2: empty auctions array short-circuits to zero rows") {
    val empty = Fixtures.materialize("t_empty.json",
      """{"connected_realm": {"id": 1}, "auctions": []}""")
    assert(SilverTransform.fromJson(spark, empty, Fixtures.day1Date).count() === 0)
  }

  test("§1.4 first-seen-wins: surviving ids not re-inserted; idempotent") {
    val d1 = day1
    val d2 = SilverTransform.fromJson(
      spark, Fixtures.materialize("t_day2.json", Fixtures.day2Json), Fixtures.day2Date)
    val newRows = SilverTransform.firstSeenOnly(d2, d1)
    assert(newRows.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(2001L, 2002L))
    // idempotence: re-running the same day against (day1 + day2-new) adds nothing
    val all = d1.unionByName(newRows)
    assert(SilverTransform.firstSeenOnly(d2, all).count() === 0)
  }

  test("S7: retention keeps only rows within the window") {
    val d1 = day1
    val kept = SilverTransform.retain(d1, java.sql.Date.valueOf("2026-03-20"), 30)
    assert(kept.count() === 0) // 2026-02-13 is 35 days before asOf
    val kept2 = SilverTransform.retain(d1, java.sql.Date.valueOf("2026-03-10"), 30)
    assert(kept2.count() === 6)
  }
}
