package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.Schemas

/** Bronze zone: dated raw JSON objects (SURVEY §2.1 S2/S3/S4).
  *
  * The reference lands one JSON object per day per realm at
  * `s3://bronze/{date}/raw_auctions_{date}.json` and prunes objects
  * older than 30 days (reference `data_pipeline/utils/minio_client.py:
  * 33-49,51-67`, path logic `assets/bronze/ingestion.py:35-40`).
  * Here the bronze zone is a date-partitioned directory tree under any
  * filesystem Spark can read (local in tests, `s3a://` on a cluster —
  * the layout, not the client library, is the contract). Date
  * partitioning makes retention a metadata-only directory drop and
  * gives `spark.read` partition pruning for free.
  */
final class Bronze(root: String) {

  private def dayDir(date: LocalDate): Path = Paths.get(root, date.toString)

  def objectPath(date: LocalDate): Path =
    dayDir(date).resolve(s"raw_auctions_$date.json")

  /** S2 — serialize + land one raw snapshot document (UTF-8 JSON),
    * creating the zone/day "bucket" on demand like the reference's
    * auto-create (`minio_client.py:39-43`). Returns the landed path.
    */
  def saveJson(date: LocalDate, rawJson: String): String = {
    Files.createDirectories(dayDir(date))
    Files.write(objectPath(date), rawJson.getBytes(StandardCharsets.UTF_8))
    objectPath(date).toString
  }

  /** S3 — read one day's raw document back as a DataFrame with the
    * explicit bronze schema (`minio_client.py:69-84`).
    */
  def readJson(spark: SparkSession, date: LocalDate): DataFrame =
    spark.read
      .schema(Schemas.rawSnapshot)
      .option("multiLine", value = true)
      .json(objectPath(date).toString)

  /** All landed snapshot dates, ascending. */
  def dates(): Seq[LocalDate] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(Files.isDirectory(_))
        .flatMap(d => scala.util.Try(LocalDate.parse(d.getFileName.toString)).toOption)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** S4 — retention: delete day directories older than `retentionDays`
    * before `asOf` (`minio_client.py:51-67`). Returns deleted dates.
    * On a date-partitioned zone this is a metadata-only partition drop
    * — no data files are read.
    */
  def retain(asOf: LocalDate, retentionDays: Int = 30): Seq[LocalDate] = {
    val cutoff = asOf.minusDays(retentionDays.toLong)
    val old = dates().filter(_.isBefore(cutoff))
    old.foreach { d =>
      val s = Files.walk(dayDir(d))
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
    old
  }
}
