package graft.operators

import scala.jdk.CollectionConverters._

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
    *
    * Overwrite only drops a table the CURRENT catalog knows about; a
    * location left behind by a previous session (in-memory catalog,
    * managed dir survives on disk) would fail the write with
    * LOCATION_ALREADY_EXISTS — drop table AND stale location first.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")) match {
        case u if u.getScheme == null || u.getScheme == "file" => u.getPath
        case u => u.toString
      })
    val stale = warehouse.resolve(table)
    if (java.nio.file.Files.exists(stale)) {
      val s = java.nio.file.Files.walk(stale)
      try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy((key +: sortCols).distinct.head, (key +: sortCols).distinct.tail: _*)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
