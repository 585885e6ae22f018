package graft.silver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.Schemas

/** Bronze -> silver normalization (operators T1–T10 of SURVEY.md §2.2).
  *
  * The reference runs this as an eager pandas chain with per-row Python
  * lambdas (reference `data_pipeline/assets/silver/transformation.py:17-84`);
  * here every step is a declarative Column expression, so the whole
  * normalization is one narrow (shuffle-free) projection stage that
  * whole-stage-codegens into a single pass over the scan — the shape
  * that scales linearly with input size on a cluster.
  */
object SilverTransform {

  /** T1: document -> table. One bronze snapshot JSON (possibly many
    * files, one per day: pass a glob/dir) to one row per auction.
    * Explicit schema (T2/T4): absent fields are NULL, wrong payloads
    * (no `auctions` key) become zero rows and are caught by
    * [[requireAuctions]].
    */
  def explodeAuctions(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("auctions")).as("a"))
      .select("a.*")

  /** T2: input validation — reject a payload lacking the `auctions`
    * key (reference `transformation.py:23-24`). Schema-on-read makes
    * the column NULL rather than failing, so validate explicitly.
    */
  def requireAuctions(raw: DataFrame): DataFrame = {
    require(
      raw.columns.contains("auctions"),
      "Invalid data: missing 'auctions' key")
    raw
  }

  /** T3–T9 as one projection. Input: exploded raw auctions (one row
    * per auction, columns of [[Schemas.rawAuction]] — possibly with
    * string-typed numerics from schemaless upstreams). Output: silver
    * rows per [[Schemas.silverAuction]] minus created_at.
    *
    * @param snapshotDate the snapshot date as a job parameter
    *        (deterministic / backfillable; the reference stamps
    *        `date.today()`, `transformation.py:55`)
    */
  def normalize(auctions: DataFrame, snapshotDate: java.sql.Date): DataFrame =
    normalizeWith(auctions, lit(snapshotDate))

  /** Column-parameterized variant: batch runs pass a literal job date;
    * the streaming path derives the date from the landed file's path
    * (one bronze object per day — the date IS in the name).
    */
  def normalizeWith(auctions: DataFrame, snapshotDate: Column): DataFrame = {
    // T5: lenient numeric casts (ANSI off -> unparseable becomes null,
    // pandas `errors='coerce'` parity).
    val qty = coalesce(col("quantity").cast(LongType), lit(1L)) // T6: fillna(1)
    val unitPrice = col("unit_price").cast(LongType)
    val buyout = col("buyout").cast(LongType)
    auctions.select(
      col("id").cast(LongType).as("id"),
      col("item.id").cast(LongType).as("item_id"), // T3: struct access, null-safe
      qty.cast(IntegerType).as("quantity"),
      // T7: per-unit price for item auctions; floor-to-Long matches the
      // reference sink's BigInteger truncation (SURVEY §1.3 decision).
      coalesce(unitPrice, floor(buyout / nullif(qty, lit(0L))).cast(LongType))
        .as("unit_price"),
      buyout.as("buyout"),
      col("time_left").cast(StringType).as("time_left"),
      col("item.modifiers").as("modifiers"), // T3
      snapshotDate.cast(DateType).as("snapshot_date") // T8
    ) // T9: exact projection; T10 (NaN->NULL) is a no-op in Spark
  }

  private def nullif(c: Column, v: Column): Column = when(c === v, lit(null)).otherwise(c)

  /** Full bronze->silver slice: read dated raw JSON, validate,
    * explode, normalize, stamp created_at.
    */
  def fromJson(spark: SparkSession, path: String, snapshotDate: java.sql.Date): DataFrame = {
    val raw = spark.read
      .schema(Schemas.rawSnapshot)
      .option("multiLine", value = true)
      .json(path)
    // Document-level validation: with an explicit schema the column
    // always EXISTS, so the reference's "auctions key present" check
    // (transformation.py:23-24) must be row-wise — a document without
    // the key parses to a NULL auctions column. (Empty array [] is
    // valid: zero-row short-circuit, :28-30.)
    require(
      raw.where(col("auctions").isNull).isEmpty,
      "Invalid data: missing 'auctions' key")
    normalize(explodeAuctions(requireAuctions(raw)), snapshotDate)
      .withColumn("created_at", current_timestamp())
  }

  /** First-seen-wins dedup (SURVEY §1.4): only auction ids never seen
    * before are appended; `snapshot_date` keeps the FIRST day a
    * listing was seen (reference
    * `data_pipeline/utils/postgres_client.py:38-39`,
    * `INSERT ... ON CONFLICT (id) DO NOTHING`).
    *
    * `existingIds` needs only the `id` column — pass a pruned scan so
    * the anti-join build side stays minimal; at 100 TB the silver side
    * is date-partitioned and only the retention window participates.
    * Idempotent: re-running the same day yields zero new rows.
    */
  def firstSeenOnly(newRows: DataFrame, existingIds: DataFrame): DataFrame =
    newRows.join(existingIds.select("id"), Seq("id"), "left_anti")

  /** S7/S4: 30-day retention — keep rows whose snapshot_date is within
    * `retentionDays` of `asOf`. On a date-partitioned table this is
    * pure partition pruning (metadata-only delete at scale).
    */
  def retain(silver: DataFrame, asOf: java.sql.Date, retentionDays: Int = 30): DataFrame =
    silver.where(col("snapshot_date") >= date_sub(lit(asOf), retentionDays))
}
