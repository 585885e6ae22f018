package graft.streaming

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.SparkEntry

/** The driver-surface streaming-parity gates (st01/st02) must equal
  * their batch twins (p33/p37) row for row on real driver data — the
  * same comparison the DuckDB oracle hash runs at sf0.01, pinned here
  * at sf0.001 so `sbt test` catches a parity break before the driver
  * does.
  */
class StreamingGatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSet

  test("st01_streaming_sessions == p33_sessionize on sf0.001") {
    val streamed = rows("st01_streaming_sessions")
    val batch = rows("p33_sessionize")
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st02_streaming_funnel == p37_funnel on sf0.001") {
    val streamed = rows("st02_streaming_funnel")
    val batch = rows("p37_funnel")
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st03_streaming_asof == batch as-of with no tolerance on sf0.001") {
    import org.apache.spark.sql.functions._
    val streamed = rows("st03_streaming_asof")
    val ev = graft.Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("value").cast("double"), lit(0.0)).as("value"))
    val batch = graft.operators.Asof.joinAsOf(
      purchases, views, on = Seq("user_id"),
      leftTime = "ts", rightTime = "ts", rightTie = "event_id",
      rightCols = Seq("ts", "event_id", "value"), rightPrefix = "view_")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("view_event_id"),
        unix_micros(col("view_ts")).as("view_ts_us"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"),
        round(col("view_value") * 100).cast("long").as("view_value_cents"))
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st04_streaming_silver == batch first-seen silver on the fixture days") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("st04_streaming_silver")(spark, dir)
      .collect().toSet
    val d1 = graft.silver.SilverTransform.fromJson(
      spark, graft.queries.Fixtures.materialize(
        "day1.json", graft.queries.Fixtures.day1Json),
      graft.queries.Fixtures.day1Date)
    val d2 = graft.silver.SilverTransform.fromJson(
      spark, graft.queries.Fixtures.materialize(
        "day2.json", graft.queries.Fixtures.day2Json),
      graft.queries.Fixtures.day2Date)
    val batch = d1.unionByName(graft.silver.SilverTransform.firstSeenOnly(d2, d1))
      .select(col("id"), col("item_id"), col("quantity"), col("unit_price"),
        col("buyout"), col("time_left"),
        to_json(col("modifiers")).as("modifiers_json"), col("snapshot_date"))
      .collect().toSet
    assert(streamed.size === 8)
    assert(streamed === batch)
  }

  test("st13 native session_window == custom sessionize (+gap end) on sf0.001") {
    import org.apache.spark.sql.functions._
    val streamed = rows("st13_streaming_session_window")
    val batch = SparkEntry.queries("p33_sessionize")(spark, dir)
      .select(col("user_id"), col("start_us"),
        (col("end_us") + lit(30L * 60 * 1000000)).as("end_us"),
        col("n_events"), col("n_purchases"), col("value_cents"))
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st14 hopping windows == batch sliding aggregation on sf0.001") {
    import org.apache.spark.sql.functions._
    val streamed = rows("st14_streaming_hopping")
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("event_type"), unix_micros(col("window.start")).as("ws_us"),
        col("n_events"), col("value_cents"))
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("st15 stream-static enrichment == batch join + window on sf0.001") {
    import org.apache.spark.sql.functions._
    val streamed = rows("st15_stream_static_enrich")
    val ev = graft.Tables.events(spark, dir)
    val dim = ev.select(col("user_id").cast("long").as("user_id")).distinct()
      .where(pmod(col("user_id"), lit(5)) =!= 4)
      .withColumn("tier", concat(lit("tier_"), pmod(col("user_id"), lit(3))))
    val batch = ev
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value"))
      .join(dim, Seq("user_id"), "left_outer")
      .groupBy(coalesce(col("tier"), lit("unknown")).as("tier"),
        window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("tier"), unix_micros(col("window.start")).as("ws_us"),
        col("n_events"), col("value_cents"))
      .collect().toSet
    assert(streamed.nonEmpty)
    // the dim is deliberately partial: the unknown bucket must exist
    assert(streamed.exists(_.getString(0) == "unknown"))
    assert(streamed === batch)
  }

  test("st12_streaming_hll == batch windowed HLL on sf0.001") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchFunctions._
    val streamed = rows("st12_streaming_hll")
    val baseUs = 1767225600000000L
    val ev = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("text"))
      .withColumn("ingested_at",
        timestamp_micros(lit(baseUs) + col("doc_id") * lit(60000000L)))
    val batch = ev
      .select(col("source"), col("ingested_at"),
        explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("source"), col("ingested_at"),
        graft.functions.Md5Hash.h60(col("tok")).as("h"))
      .groupBy(col("source"), window(col("ingested_at"), "1 hour"))
      .agg(hyperLogLog(col("h"), 4).as("regs"))
      .select(col("source"), col("window.start").as("window_start"),
        md5(array_join(transform(col("regs"), _.cast("string")), ","))
          .as("register_digest"),
        hllZeroRegisters(col("regs")).as("n_zero_registers"),
        hllHarmonicScaled(col("regs")).as("harmonic_scaled"),
        hllEstimate(col("regs"), 4).as("est_distinct"))
      .collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
