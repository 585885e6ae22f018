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

  private def g2Fixture(rows: Seq[(String, String, Double, Long)]) =
    rows.map { case (item, ts, p, v) => (item, ts, p, p, p, p, p, v) }
      .toDF("item_id", "ts", "open_price", "high_price", "low_price",
        "close_price", "avarage_price", "volume")
      .withColumn("snapshot_hour",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .drop("ts")

  test("priceHistoryDense: the grid is bounded to the serving window, carry-in included") {
    // an item whose FIRST bar is ~11 years before its last: the old
    // full-span grid was ~100k rows to serve 48; the bounded window
    // must return exactly `limit` bars ending at the last bar, with
    // the window head carrying the decade-old close
    val g2 = g2Fixture(Seq(
      ("it", "2015-01-01 00:00:00", 10.0, 5L),
      ("it", "2026-01-01 10:00:00", 99.0, 7L)))
    val got = ServingLayer.priceHistoryDense(g2, "it", limit = 48).collect()
    assert(got.length === 48, s"window must cap the grid: ${got.length}")
    val byHour = got.map(r =>
      r.getAs[java.sql.Timestamp]("snapshot_hour").toString ->
        r.getAs[Double]("close_price")).toMap
    assert(byHour("2026-01-01 10:00:00.0") === 99.0)
    // every earlier window hour is the 2015 bar's carried close
    assert(byHour("2026-01-01 09:00:00.0") === 10.0)
    assert(byHour("2025-12-30 11:00:00.0") === 10.0) // window head (hi-47h)
    assert(got.forall(_.getAs[Double]("open_price") > 0))
  }

  test("priceHistoryDense: asOf anchors the window at the serving hour (locf tail)") {
    // ADVICE round-15: without asOf the 48 bars end at the last
    // TRADE; a dashboard serving "now" passes asOf and the carried
    // tail extends to it, volume 0
    val g2 = g2Fixture(Seq(("it", "2026-01-01 00:00:00", 50.0, 3L)))
    val got = ServingLayer.priceHistoryDense(g2, "it", limit = 48,
      asOf = Some(java.sql.Timestamp.valueOf("2026-01-01 05:30:00")))
      .collect()
    val hours = got.map(_.getAs[java.sql.Timestamp]("snapshot_hour").toString)
    assert(hours.head === "2026-01-01 05:00:00.0", // asOf hour-truncated
      s"tail must reach the serving hour: ${hours.head}")
    assert(got.head.getAs[Double]("close_price") === 50.0) // carried
    assert(got.head.getAs[Long]("volume") === 0L)
    assert(got.length === 6) // 00:00 trade + 5 carried tail hours
    // time-travel: an asOf BEFORE the only bar yields nothing to carry
    assert(ServingLayer.priceHistoryDense(g2, "it", limit = 48,
      asOf = Some(java.sql.Timestamp.valueOf("2025-12-31 00:00:00")))
      .collect().isEmpty)
  }

  test("priceHistoryDense plan: item filter pushed to the mart scan, window filter below the grid") {
    val dir = java.nio.file.Files.createTempDirectory("g2plan")
    try {
      g2Fixture(Seq(("it", "2026-01-01 00:00:00", 50.0, 3L),
        ("other", "2026-01-01 01:00:00", 1.0, 1L)))
        .write.mode("overwrite").parquet(dir.toString)
      val q = ServingLayer.priceHistoryDense(
        spark.read.parquet(dir.toString), "it", limit = 48)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        "PushedFilters: \\[[^\\]]*item_id".r.findFirstIn(plan).isDefined,
        s"item filter must reach the mart scan:\n$plan")
      // the serving-window arithmetic (hi − 47h) must appear in the
      // optimized plan — the grid generation consumes the BOUNDED
      // input, not the item's full history
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("47") && opt.toLowerCase.contains("hour"),
        s"window bound missing below the grid:\n$opt")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
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
