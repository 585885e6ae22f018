package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-isolated parquet table: `v=N` version directories plus an
  * atomically-replaced `_current` pointer file — the lightweight
  * version of the metadata a table format (Delta/Iceberg) owns,
  * lifting [[graft.Pipeline]]'s directory-swap tables from
  * "single-writer, QUIESCENT readers" (README "Concurrency") to
  * "single-writer, CONCURRENT readers":
  *
  *   - A reader resolves the pointer ONCE at plan time and scans
  *     `v=N` — a directory no writer ever mutates or deletes while it
  *     is within the vacuum horizon. Readers planned before a commit
  *     keep reading their snapshot; readers planned after see the new
  *     one. No torn reads, no file-not-found mid-scan.
  *   - A writer stages the full new version BESIDE the live ones and
  *     commits by atomically replacing the pointer (temp file +
  *     `ATOMIC_MOVE` rename — POSIX guarantees all-or-nothing). A
  *     crash before the rename leaves an orphan `v=N+1` directory the
  *     next write overwrites; a crash after is a completed commit.
  *   - [[vacuum]] is the explicit retention knob: old versions are
  *     deleted only when the operator says readers are done with them
  *     (`keepLast` horizon) — the same contract Delta's VACUUM makes.
  *
  * Writer concurrency stays single-writer (two concurrent writers
  * could both stage N+1); serialize writers exactly as
  * `Pipeline.withWriterLock` does. At 100 TB the layout maps 1:1 onto
  * an object store (version prefixes + one small pointer object
  * replaced by PUT, which is atomic per-object on S3/GCS).
  */
object VersionedTable {

  private val PointerName = "_current"

  /** Current committed version, or None for an uninitialized table.
    * A malformed pointer fails LOUDLY — silently serving version 0 of
    * a table whose pointer was corrupted would be a wrong-answer bug.
    */
  def currentVersion(root: String): Option[Long] = {
    val p = pointerPath(root)
    if (!Files.exists(p)) None
    else {
      val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      val v = try raw.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalStateException(
            s"versioned table $root: corrupt pointer file '$raw'")
      }
      require(v >= 1, s"versioned table $root: pointer version $v < 1")
      Some(v)
    }
  }

  /** Commit `df` as the next version and return its version number.
    * The data write is complete before the pointer moves, so readers
    * can never resolve to a half-written version.
    */
  def write(df: DataFrame, root: String): Long = {
    val next = currentVersion(root).getOrElse(0L) + 1
    Files.createDirectories(Paths.get(root))
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(root, next))
    commitPointer(root, next)
    next
  }

  /** Plan-time snapshot read: resolve the pointer NOW, scan that
    * version forever (the returned frame stays valid across any
    * number of subsequent commits, until [[vacuum]] passes its
    * version). Loud on an uninitialized table.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, currentVersion(root).getOrElse(
      throw new IllegalStateException(
        s"versioned table $root: no committed version (missing $PointerName)")))

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = versionDir(root, version)
    require(Files.exists(Paths.get(dir)),
      s"versioned table $root: version $version does not exist (vacuumed?)")
    spark.read.parquet(dir)
  }

  /** All version numbers present on disk (committed or orphaned),
    * ascending.
    */
  def versions(root: String): Seq[Long] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Nil
    else {
      val s = Files.list(r)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("v="))
        .map(_.getFileName.toString.stripPrefix("v=").toLong)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Delete versions older than the `keepLast` most recent COMMITTED
    * ones (the current version is always kept; orphans above the
    * pointer are left for the next write to overwrite). Returns the
    * versions deleted. Run only when readers planned against the old
    * versions are known finished — the explicit retention contract.
    */
  def vacuum(root: String, keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, s"keepLast=$keepLast must keep at least the current version")
    val cur = currentVersion(root).getOrElse(return Nil)
    val victims = versions(root).filter(v => v <= cur - keepLast)
    victims.foreach(v => deleteRecursively(Paths.get(versionDir(root, v))))
    victims
  }

  private def versionDir(root: String, v: Long): String = s"$root/v=$v"

  private def pointerPath(root: String): Path = Paths.get(root, PointerName)

  private def commitPointer(root: String, v: Long): Unit = {
    val tmp = Paths.get(root, s".$PointerName.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
}
