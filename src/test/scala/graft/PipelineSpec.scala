package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.queries.Fixtures
import graft.silver.Dimensions

/** End-to-end medallion run over the A1 fixtures into a temp
  * warehouse: bronze landing, first-seen silver append, dim upsert,
  * materialized gold, retention partition drop — and the idempotence
  * the reference gets from ON CONFLICT.
  */
class PipelineSpec extends SparkSpec {

  private val d1 = LocalDate.parse("2026-02-13")
  private val d2 = LocalDate.parse("2026-02-14")

  private val source = new Dimensions.ItemMetadataSource {
    override def fetch(itemId: Long): Option[Dimensions.ItemPayload] =
      if (itemId == 777L) None // 404
      else Some(Dimensions.ItemPayload(Some(s"Item $itemId"), Some("Rare"), None, None))
  }

  test("full two-day run: land, normalize, first-seen, dims, gold") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val p = new Pipeline(spark, wh)

    p.ingest(d1, Fixtures.day1Json)
    assert(p.runSilver(d1) === 6L)
    p.ingest(d2, Fixtures.day2Json)
    assert(p.runSilver(d2) === 2L) // 1002 survives -> not re-inserted

    assert(p.silver.count() === 8L)
    // first-seen: 1002 keeps its day-1 snapshot_date
    assert(p.silver.where("id = 1002").select("snapshot_date")
      .head().getDate(0).toString === "2026-02-13")

    // dims: 4 distinct item ids in facts, 777 404s -> 3 enriched
    assert(p.runDims(source) === 3L)
    assert(p.dims.count() === 3L)
    assert(p.dims.where("item_id = 2589").select("item_class")
      .head().getString(0) === "Misc") // default for None

    // second dims run: nothing missing, nothing null-named -> no-op
    assert(p.runDims(source) === 0L)

    p.runGold()
    assert(p.gold("g1_daily_market_summary").count() > 0)
    assert(p.gold("g2_price_history").count() > 0)
    assert(p.gold("g4_item_demand").where("snapshot_date = DATE'2026-02-13'").count() > 0)
    assert(p.gold("g7_sector_trends").count() > 0)
    // G1 carries the denormalized dim name
    assert(p.gold("g1_daily_market_summary")
      .where("item_id = 2589 AND item_name IS NOT NULL").count() > 0)
  }

  test("a second concurrent writer fails loudly, never silently corrupts") {
    // parquet dir swaps have no transaction layer (the reference had
    // Postgres transactions) — the single-writer lock must REFUSE a
    // second writer while one holds the warehouse (round-6 verdict 6)
    val wh = Files.createTempDirectory("graft-wh-lock").toString
    val p = new Pipeline(spark, wh)
    // simulate a live writer from another process: its lock exists
    val lock = java.nio.file.Paths.get(s"$wh/.graft_writer.lock")
    Files.createDirectory(lock)
    Files.writeString(lock.resolve("owner"), "pid=424242 acquired=test")
    val e = intercept[IllegalStateException] { p.ingest(d1, Fixtures.day1Json) }
    assert(e.getMessage.contains("another writer holds"))
    assert(e.getMessage.contains("pid=424242"))
    // nothing was written under the contested lock
    assert(p.bronze.dates().isEmpty)
    // owner released -> the writer proceeds, and the composite runDay
    // is reentrant over its own steps (one lock, not a self-deadlock)
    Files.delete(lock.resolve("owner"))
    Files.delete(lock)
    p.runDay(d1, Fixtures.day1Json, source)
    assert(p.silver.count() === 6L)
    assert(!Files.exists(lock), "lock must be released after the run")
  }

  test("incremental gold equals full recompute on every mart") {
    val wh = Files.createTempDirectory("graft-wh-inc").toString
    val p = new Pipeline(spark, wh)
    // two days maintained incrementally (the runDay path)
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.runDims(source)
    p.runGoldIncremental(d1)
    p.ingest(d2, Fixtures.day2Json)
    p.runSilver(d2)
    p.runGoldIncremental(d2)

    val marts = Seq("g1_daily_market_summary", "g2_price_history",
      "g3_market_opportunities", "g4_item_demand",
      "g5_market_concentration", "g6_market_index", "g7_sector_trends")
    def snapshot(): Map[String, Set[String]] = marts.map { m =>
      val df = p.gold(m)
      m -> df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSet
    }.toMap

    val incremental = snapshot()
    // full recompute over the SAME silver (created_at frozen in
    // parquet, so the comparison is exact, not wall-clock-dependent)
    p.runGold()
    val full = snapshot()
    marts.foreach { m =>
      assert(incremental(m) === full(m), s"mart $m diverges")
      assert(full(m).nonEmpty, s"mart $m is empty")
    }
  }

  test("dim change re-enriches historical gold partitions (incremental == full)") {
    val wh = Files.createTempDirectory("graft-wh-dims").toString
    val p = new Pipeline(spark, wh)
    // day 1: every fetch succeeds but carries no name — the enrichment
    // backlog scenario (r02 re-picks null-name dims for retry)
    val nameless = new Dimensions.ItemMetadataSource {
      override def fetch(itemId: Long): Option[Dimensions.ItemPayload] =
        Some(Dimensions.ItemPayload(None, Some("Rare"), None, None))
    }
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.runDimsTracked(nameless)
    p.runGoldIncremental(d1)
    assert(p.gold("g1_daily_market_summary")
      .where("item_name IS NOT NULL").count() === 0)

    // day 2: the backlog fills in — names arrive, dims CHANGE, and the
    // historical G1/G7 partitions that froze null names must be
    // rewritten (the reference recomputes gold from silver and would
    // re-enrich implicitly)
    p.ingest(d2, Fixtures.day2Json)
    p.runSilver(d2)
    val (_, changed) = p.runDimsTracked(source)
    assert(changed.nonEmpty)
    p.runGoldIncremental(d2)
    p.refreshDimAffectedGold(changed)
    assert(p.gold("g1_daily_market_summary")
      .where(s"snapshot_date = DATE'$d1' AND item_name IS NOT NULL").count() > 0)

    val incG1 = p.gold("g1_daily_market_summary").collect().map(_.toString).toSet
    val incG7 = p.gold("g7_sector_trends").collect().map(_.toString).toSet
    p.runGold()
    assert(incG1 === p.gold("g1_daily_market_summary").collect().map(_.toString).toSet)
    assert(incG7 === p.gold("g7_sector_trends").collect().map(_.toString).toSet)
  }

  test("incremental G6 lags across a gap day exactly like the full recompute") {
    val wh = Files.createTempDirectory("graft-wh-gap").toString
    val p = new Pipeline(spark, wh)
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.runGoldIncremental(d1)
    // d2 never lands (failed ingest); d3 runs incrementally
    val d3 = d1.plusDays(2)
    p.ingest(d3, Fixtures.day2Json)
    p.runSilver(d3)
    p.runGoldIncremental(d3)
    // the lag resolved against d1 (latest present), not the absent d2
    val incRow = p.gold("g6_market_index")
      .where(s"snapshot_date = DATE'$d3'").collect()
    assert(incRow.length === 1)
    assert(!incRow.head.isNullAt(incRow.head.fieldIndex("inflation_pct_daily")),
      "gap day left inflation_pct_daily null on the incremental path")
    val inc = p.gold("g6_market_index").collect().map(_.toString).toSet
    p.runGold()
    assert(inc === p.gold("g6_market_index").collect().map(_.toString).toSet)
  }

  test("silver re-run of the same day is idempotent (ON CONFLICT parity)") {
    val wh = Files.createTempDirectory("graft-wh2").toString
    val p = new Pipeline(spark, wh)
    p.ingest(d1, Fixtures.day1Json)
    assert(p.runSilver(d1) === 6L)
    assert(p.runSilver(d1) === 0L) // re-run inserts nothing
    assert(p.silver.count() === 6L)
    // typed view decodes through the case-class encoder
    val rows = p.silverDs.collect()
    assert(rows.length === 6)
    assert(rows.find(_.id == 1006L).flatMap(_.unit_price) === Some(249L))
  }

  test("retention drops old bronze objects and silver partitions") {
    val wh = Files.createTempDirectory("graft-wh3").toString
    val p = new Pipeline(spark, wh)
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.ingest(d2, Fixtures.day2Json)
    p.runSilver(d2)
    // asOf 35 days after d1: d1 falls out of a 30-day window, d2 (34d) too;
    // use a window that keeps d2 only
    val (droppedBronze, droppedParts) = p.runRetention(d1.plusDays(31), 31)
    assert(droppedBronze === Seq.empty) // d1 is exactly at the cutoff boundary? no: cutoff = asOf-31 = d1 -> not before
    val (dropped2, parts2) = p.runRetention(d2.plusDays(31), 31)
    assert(dropped2 === Seq(d1))
    assert(parts2 === 2L) // silver + bronze_daily partition for d1
    assert(p.silver.where("snapshot_date = DATE'2026-02-13'").count() === 0)
    assert(p.silver.where("snapshot_date = DATE'2026-02-14'").count() === 2)
  }

  test("retention auto-retracts maintained rollups: one call, navigation re-armed with post-delete answers") {
    import org.apache.spark.sql.functions._
    graft.plans.MvCatalog.clear()
    val wh = Files.createTempDirectory("graft-wh5").toString
    val p = new Pipeline(spark, wh)
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.ingest(d2, Fixtures.day2Json)
    p.runSilver(d2)
    val silverPath = s"$wh/silver_auctions"
    val mvPath = s"$wh/mv_silver.parquet"
    graft.streaming.StreamingMvMaintenance.processBatch(
      p.silver, 0L, mvPath, Seq("snapshot_date"), Seq("quantity"))
    graft.plans.MaterializedAggregate.registerExisting(
      spark, silverPath, mvPath, Seq("snapshot_date"), Seq("quantity"),
      maintained = true)
    def q = p.silver.groupBy(col("snapshot_date"))
      .agg(sum("quantity").as("s"), count(lit(1)).as("n"))
    def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Seq.empty[String]
          }
      }.flatten
    try {
      assert(scanned(q).exists(_.contains("mv_silver")),
        "maintained rollup must navigate before retention")
      // ONE call: the retention run itself retracts + re-registers —
      // no manual StreamingMvMaintenance.retract step
      p.runRetention(d2.plusDays(31), 31) // cutoff between d1 and d2
      assert(scanned(q).exists(_.contains("mv_silver")),
        "retention did not auto-retract/re-arm the maintained rollup")
      assert(!scanned(q).exists(_.contains("silver_auctions")),
        "fact still scanned after auto-retract")
      val navigated = q.collect().map(_.toSeq).toSet
      graft.plans.MvCatalog.clear()
      val direct = q.collect().map(_.toSeq).toSet
      assert(navigated === direct, "navigated answers differ from base")
      assert(direct.forall(_.head.toString == "2026-02-14"),
        s"pre-cutoff rows survived retraction: $direct")
    } finally graft.plans.MvCatalog.clear()
  }

  test("retention ages out gold date partitions with silver") {
    val wh = Files.createTempDirectory("graft-wh4").toString
    val p = new Pipeline(spark, wh)
    p.ingest(d1, Fixtures.day1Json)
    p.runSilver(d1)
    p.runGoldIncremental(d1)
    p.ingest(d2, Fixtures.day2Json)
    p.runSilver(d2)
    p.runGoldIncremental(d2)
    assert(p.gold("g1_daily_market_summary")
      .where("snapshot_date = DATE'2026-02-13'").count() > 0)
    p.runRetention(d2.plusDays(31), 31) // cutoff lands between d1 and d2
    assert(p.gold("g1_daily_market_summary")
      .where("snapshot_date = DATE'2026-02-13'").count() === 0)
    assert(p.gold("g1_daily_market_summary")
      .where("snapshot_date = DATE'2026-02-14'").count() > 0)
  }
}
