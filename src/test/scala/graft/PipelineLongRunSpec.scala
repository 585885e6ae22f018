package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.silver.Dimensions

/** Multi-day pipeline simulation: 8 consecutive daily runs with
  * listings that appear, survive and disappear on a fixed schedule —
  * exercising first-seen accumulation, the bronze_daily mirror, G3's
  * 7-day window with real history, G4 disappearance counting over the
  * whole horizon, and retention at a mid-history boundary.
  */
class PipelineLongRunSpec extends SparkSpec {

  private val d0 = LocalDate.parse("2026-03-01")

  /** Day d carries listings with ids in [d*10, d*10+29]: each listing
    * lives exactly 3 days (appears day d, survives d+1, d+2) — so from
    * day 2 on, 10 listings disappear per day-pair. Item = id % 4.
    */
  private def dayJson(day: Int): String = {
    val ids = ((math.max(0, day - 2)) to day).flatMap(b => (b * 10) until (b * 10 + 10))
    val auctions = ids.map { id =>
      s"""{"id": $id, "item": {"id": ${id % 4}}, "quantity": 2,
         | "unit_price": ${100 + (id % 7) * 10}, "time_left": "LONG"}""".stripMargin.replace("\n", "")
    }
    auctions.mkString("""{"auctions": [""", ",\n", "]}")
  }

  private val source = new Dimensions.ItemMetadataSource {
    override def fetch(itemId: Long): Option[Dimensions.ItemPayload] =
      Some(Dimensions.ItemPayload(Some(s"Item $itemId"), None, None, None))
  }

  test("8-day horizon: windows, demand and retention behave over real history") {
    val wh = Files.createTempDirectory("graft-long").toString
    val p = new Pipeline(spark, wh)
    (0 until 8).foreach { day =>
      p.ingest(d0.plusDays(day.toLong), dayJson(day))
      p.runSilver(d0.plusDays(day.toLong))
    }
    p.runDims(source)
    p.runGold()

    // first-seen: every id lands exactly once => 10 new ids per day-block
    assert(p.silver.count() === 80L)
    assert(p.silver.groupBy("id").count().where("count > 1").count() === 0)

    // G4: days 0..6 have successor snapshots; 10 listings x qty 2
    // disappear per day from day 2 on (the day-0/1 blocks age out)
    val g4 = p.gold("g4_item_demand")
    val perDay = g4.groupBy("snapshot_date")
      .agg(org.apache.spark.sql.functions.sum("estimated_daily_sales").as("s"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(!perDay.contains("2026-03-08")) // last day unknowable
    assert(perDay("2026-03-03") === 20L) // block 1 (ids 10-19) x qty 2
    // NOTE: bronze_daily holds the RAW day sets, so sales come from raw
    // disappearance, not the deduped silver

    // G3 through the pipeline: later days have 7 days of real history
    val g3 = p.gold("g3_market_opportunities")
    val lastDay = g3.where("snapshot_date = DATE'2026-03-08'")
    assert(lastDay.count() === 4) // one row per item
    assert(lastDay.where("avg_price_7d IS NOT NULL").count() === 4)

    // retention: cutoff = asOf - 3 = 03-05; days strictly BEFORE it
    // (03-01..03-04) drop, 03-05..03-08 survive
    val (droppedBronze, droppedParts) = p.runRetention(d0.plusDays(7), 3)
    assert(droppedBronze.map(_.toString).toSet ===
      (0 until 4).map(d => d0.plusDays(d.toLong).toString).toSet)
    // 4 silver + 4 mirror partitions, plus gold ages out with silver:
    // g1/g3/g5/g6/g7 each drop their 4 aged date partitions (g2's bar
    // dates are processing-time = today, so none fall before the cutoff)
    assert(droppedParts === 28L)
    assert(p.silver.count() === 40L) // 4 surviving days x 10 new ids
    assert(p.gold("g1_daily_market_summary")
      .where("snapshot_date < DATE'2026-03-05'").count() === 0)
  }
}
