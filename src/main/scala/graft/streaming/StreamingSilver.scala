package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas
import graft.silver.SilverTransform

/** Structured Streaming edition of the silver path + hourly OHLC
  * (SURVEY §2.6 / §7 north-star: the reference is batch-daily, the
  * dashboard's 48 hourly bars imply the intended cadence of
  * gold_price_history is hourly — streaming closes that gap).
  *
  * Design: the bronze zone doubles as the stream source — every landed
  * raw object is a micro-batch (file source discovers new day dirs).
  * The same T1-T10 normalization expressions run unchanged; only the
  * snapshot-date derivation differs (from the landed file's path
  * instead of a job parameter). State: the OHLC aggregation keys are
  * (item, hour window) with a watermark bounding state size — at
  * 100 TB/day the state store holds only the open windows, not the
  * stream.
  */
object StreamingSilver {

  /** Bronze file stream -> normalized silver rows. `maxFilesPerTrigger`
    * bounds micro-batch size on backfills (a month of daily dumps
    * arriving at once must not become one giant batch).
    */
  def silverStream(spark: SparkSession, bronzeRoot: String,
      maxFilesPerTrigger: Int = 8): DataFrame = {
    val raw = spark.readStream
      .schema(Schemas.rawSnapshot)
      .option("multiLine", value = true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(s"$bronzeRoot/*/raw_auctions_*.json")
    // bronze path contract: .../{yyyy-MM-dd}/raw_auctions_{date}.json.
    // A landed file whose dir doesn't parse as a date would silently
    // produce null snapshot_date rows (invisible to the watermark,
    // wrong partitions downstream) — a malformed layout is a
    // deployment bug, so fail the batch LOUDLY with the path instead.
    val pathDate = to_date(regexp_extract(
      input_file_name(), "(\\d{4}-\\d{2}-\\d{2})/raw_auctions_", 1))
    val checkedDate = when(pathDate.isNull,
      raise_error(concat(
        lit("bronze path violates {yyyy-MM-dd}/raw_auctions_*.json contract: "),
        input_file_name())).cast("date"))
      .otherwise(pathDate)
    val withDate = SilverTransform.normalizeWith(
      SilverTransform.explodeAuctions(raw), checkedDate)
    withDate.withColumn("created_at",
      col("snapshot_date").cast("timestamp")) // event time = snapshot day
  }

  /** Streaming G2: tumbling 1-hour OHLC bars with a watermark. Same
    * min_by/max_by single-aggregation shape as the batch mart — late
    * ticks beyond the watermark are dropped, closed windows emit once
    * (append mode).
    */
  def streamingPriceHistory(ticks: DataFrame,
      tsCol: String = "created_at",
      price: Column = col("unit_price"),
      watermarkDelay: String = "2 hours"): DataFrame = {
    // event time is a column NAME (not a Column): the watermark and the
    // window must be declared on the same attribute or Spark rejects
    // the append-mode aggregation at start()
    val ts = col(tsCol)
    // null-price rows are not open/close candidates (min_by/max_by
    // skip null ordering keys) — same rule as the batch mart
    val key = when(price.isNotNull, struct(ts.as("__ts"), price.as("__price")))
    ticks
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col("item_id"), window(ts, "1 hour").as("w"))
      .agg(
        min_by(price, key).cast("double").as("open_price"),
        max(price).as("high_price"),
        min(price).as("low_price"),
        max_by(price, key).cast("double").as("close_price"),
        avg(price).as("avarage_price"), // sic — reference schema
        sum(col("quantity")).as("volume"))
      .select(col("item_id"), col("w.start").as("snapshot_hour"),
        col("open_price"), col("high_price"), col("low_price"),
        col("close_price"), col("avarage_price"), col("volume"))
  }

  /** First-seen-wins dedup on the stream (§1.4 for streaming): keep
    * only the first occurrence of each auction id, with state bounded
    * by the watermark (an id older than the delay can no longer
    * recur-and-win, so its state is dropped). The streaming analog of
    * `INSERT ... ON CONFLICT DO NOTHING` — state size is the id set
    * within the watermark horizon, not the stream.
    */
  def firstSeenStream(silver: DataFrame,
      eventTimeCol: String = "created_at",
      watermarkDelay: String = "2 days"): DataFrame =
    silver
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("id")

  /** Land the silver stream as date-partitioned parquet — the
    * streaming write analog of Pipeline.runSilver's append. (File sink
    * is exactly-once via the sink log; first-seen dedup across days is
    * [[firstSeenStream]] upstream when ids can recur within the
    * retention window.)
    */
  def writeSilver(silver: DataFrame, path: String, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    silver.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("snapshot_date")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
