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

  /** Backtick-quote each part of a possibly db-qualified name
    * (`db.table` must quote as `` `db`.`table` ``, not `` `db.table` ``).
    */
  private def quoted(table: String): String =
    table.split('.').map(p => s"`$p`").mkString(".")

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
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(table)}")
    // Stale-location cleanup is a LOCAL-warehouse affair: on a remote
    // warehouse (s3a/hdfs) the managed dir belongs to a shared
    // catalog — deleting it out-of-band is someone else's data loss,
    // and java.nio can't address it anyway. There saveAsTable's own
    // overwrite handles the location.
    val uri = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    if (uri.getScheme == null || uri.getScheme == "file" || uri.getScheme == "local") {
      val warehouse = java.nio.file.Paths.get(uri.getPath)
      // saveAsTable lower-cases identifiers; Locale.ROOT because the
      // default locale would fold 'I' to dotless-i under tr_TR,
      // checking a path the catalog never writes
      val parts = table.toLowerCase(java.util.Locale.ROOT).split('.')
      val (dbName, tName) = parts match {
        case Array(t) => (spark.catalog.currentDatabase, t)
        case Array(db, t) => (db, t)
        case _ => throw new IllegalArgumentException(
          s"table name '$table' has more than one qualifier")
      }
      // a managed table lives under its DATABASE's location: for the
      // default database that is the warehouse ROOT (not
      // default.db/), so resolve from the catalog; if the database is
      // unknown to this (fresh in-memory) catalog, fall back to the
      // on-disk convention a previous session would have used
      val dbPath = scala.util.Try(java.nio.file.Paths.get(
        new java.net.URI(spark.catalog.getDatabase(dbName).locationUri).getPath))
        .getOrElse(
          if (dbName == "default") warehouse
          else warehouse.resolve(dbName + ".db"))
      val stale = dbPath.resolve(tName)
      if (java.nio.file.Files.exists(stale)) {
        val s = java.nio.file.Files.walk(stale)
        try s.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally s.close()
      }
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
