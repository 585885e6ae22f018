package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (SURVEY §4 / the 100 TB design toolbox):
  * persisting a fact table bucketed (and sorted) on its hot join/
  * aggregation key makes every downstream `groupBy(key)` and every
  * join against an equally-bucketed table SHUFFLE-FREE — the scan
  * itself reports hashpartitioning(key, n), so Catalyst drops the
  * Exchange. For the auction domain: silver bucketed by item_id means
  * G1/G3/G5 aggregate and the dim join co-locate without moving the
  * fact table, per run, ever.
  *
  * Bucket count is a capacity decision: ~ (table size / healthy
  * partition size), fixed at write time — resize = rewrite. Bucketed
  * tables live in the session catalog (parquet + bucket metadata);
  * `BucketingSpec` proves the no-Exchange plans.
  */
object Bucketing {

  /** Write as a bucketed, sorted managed table (overwrite). `sortCols`
    * default to the bucket key — sorted buckets additionally enable
    * merge-join without a sort step.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy((key +: sortCols).distinct.head, (key +: sortCols).distinct.tail: _*)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
