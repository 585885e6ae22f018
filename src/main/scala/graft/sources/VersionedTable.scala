package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Options, Path}
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
  *     commits by replacing the pointer (see the commit contract
  *     below). A crash before the pointer lands leaves an orphan
  *     `v=N+1` directory the next write overwrites; a crash after is
  *     a completed commit.
  *   - [[vacuum]] is the explicit retention knob: old versions are
  *     deleted only when the operator says readers are done with them
  *     (`keepLast` horizon) — the same contract Delta's VACUUM makes.
  *
  * STORAGE SEAM — all I/O goes through the Hadoop FileSystem API, so
  * `root` may be a local path, a `file://` URI, or `s3a://bucket/tbl`.
  * The COMMIT CONTRACT is scheme-aware, because the two storage
  * families give you different atomic primitives:
  *
  *   - rename-atomic filesystems (`file`, `hdfs`, `viewfs`): the
  *     pointer commits as temp-write + `rename OVERWRITE` — POSIX/
  *     HDFS guarantee all-or-nothing, a concurrent reader sees the
  *     old pointer or the new one.
  *   - object stores (`s3a`, `gs`, `abfs`, anything else): rename is
  *     copy+delete and NOT atomic — so the pointer commits as ONE
  *     direct create-overwrite, a single PUT, which IS atomic per
  *     object on S3/GCS/Azure (readers see the old object or the new
  *     one, never bytes of both). Nothing else in the layout renames:
  *     version directories are written once and never moved.
  *
  * This is exactly the manifest-pointer design the directory-swap
  * tables cannot ship to an object store (their two-rename swap has
  * no atomic equivalent there).
  */
object VersionedTable {

  private val PointerName = "_current"

  /** Schemes whose FileSystem.rename is atomic. Everything else is
    * treated as an object store and commits the pointer by direct
    * PUT. Conservative by design: misclassifying an atomic-rename FS
    * as an object store only narrows the reader race to the store's
    * per-object atomicity; the reverse (renaming on S3) would tear.
    */
  private def renameIsAtomic(fs: FileSystem): Boolean =
    fs.getScheme match {
      case "file" | "hdfs" | "viewfs" => true
      case _ => false
    }

  private def fsFor(root: String, hconf: Configuration): FileSystem =
    new Path(root).getFileSystem(hconf)

  /** Current committed version, or None for an uninitialized table.
    * A malformed pointer fails LOUDLY — silently serving version 0 of
    * a table whose pointer was corrupted would be a wrong-answer bug.
    */
  def currentVersion(root: String,
      hconf: Configuration = new Configuration()): Option[Long] = {
    val fs = fsFor(root, hconf)
    val p = pointerPath(root)
    if (!fs.exists(p)) None
    else {
      // any unreadable pointer — parse failure OR an I/O/checksum
      // error on a file that exists — is the same loud contract:
      // never silently serve a stale or guessed version
      val raw = try {
        val in = fs.open(p)
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim
        finally in.close()
      } catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"versioned table $root: unreadable pointer file ($e)")
      }
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
    *
    * WRITER lock: version selection (`current + 1`) plus staging plus
    * the pointer swap must be one critical section — two concurrent
    * writers would both pick N+1, overwrite each other's staging
    * directory mid-write, and the second pointer commit would publish
    * a torn mix. The lock is an atomic directory create UNDER THE
    * TABLE ROOT (`.graft_writer.lock` — the same filesystem primitive
    * as `Pipeline`'s warehouse lock, so it excludes writers across
    * PROCESSES, not just threads; on an object store, directory
    * create is a zero-byte marker PUT — advisory rather than atomic,
    * the slot a real deployment fills with a lease service or Delta
    * optimistic commits). A second writer fails LOUDLY with the
    * recorded owner. A crash-orphaned lock is removed by the operator
    * — refusing to auto-break it is deliberate (the owner may be
    * alive).
    */
  def write(df: DataFrame, root: String): Long = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = fsFor(root, hconf)
    fs.mkdirs(new Path(root))
    val lock = new Path(root, ".graft_writer.lock")
    if (!fs.mkdirs(lock) || {
        // mkdirs returns true even when the dir pre-exists on some
        // FS implementations — claim ownership via an exclusive
        // marker create instead (create w/o overwrite is atomic)
        val marker = new Path(lock, "owner")
        try {
          val out = fs.create(marker, false)
          try out.write(
            (s"pid=${ProcessHandle.current().pid()} " +
              s"acquired=${java.time.Instant.now()}")
              .getBytes(StandardCharsets.UTF_8))
          finally out.close()
          false // claimed
        } catch { case _: java.io.IOException => true } // already owned
      }) {
      val owner = scala.util.Try {
        val in = fs.open(new Path(lock, "owner"))
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      }.getOrElse("unknown")
      throw new IllegalStateException(
        s"another writer holds $lock (owner: $owner). Concurrent " +
          "writers to one versioned table are unsupported: both " +
          "would stage the same v=N+1. If the owner process is " +
          "dead, remove the lock directory and re-run.")
    }
    try {
      val next = currentVersion(root, hconf).getOrElse(0L) + 1
      df.write.mode(SaveMode.Overwrite).parquet(versionDir(root, next))
      commitPointer(fs, root, next)
      next
    } finally {
      fs.delete(lock, true)
      ()
    }
  }

  /** Plan-time snapshot read: resolve the pointer NOW, scan that
    * version forever (the returned frame stays valid across any
    * number of subsequent commits, until [[vacuum]] passes its
    * version). Loud on an uninitialized table.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    readVersion(spark, root, currentVersion(root, hconf).getOrElse(
      throw new IllegalStateException(
        s"versioned table $root: no committed version (missing $PointerName)")))
  }

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = versionDir(root, version)
    require(fsFor(root, hconf).exists(new Path(dir)),
      s"versioned table $root: version $version does not exist (vacuumed?)")
    spark.read.parquet(dir)
  }

  /** All version numbers present on disk (committed or orphaned),
    * ascending.
    */
  def versions(root: String,
      hconf: Configuration = new Configuration()): Seq[Long] = {
    val fs = fsFor(root, hconf)
    val r = new Path(root)
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Delete versions older than the `keepLast` most recent COMMITTED
    * ones (the current version is always kept; orphans above the
    * pointer are left for the next write to overwrite). Returns the
    * versions deleted. Run only when readers planned against the old
    * versions are known finished — the explicit retention contract.
    */
  def vacuum(root: String, keepLast: Int = 2,
      hconf: Configuration = new Configuration()): Seq[Long] = {
    require(keepLast >= 1, s"keepLast=$keepLast must keep at least the current version")
    val fs = fsFor(root, hconf)
    val cur = currentVersion(root, hconf).getOrElse(return Nil)
    val victims = versions(root, hconf).filter(v => v <= cur - keepLast)
    victims.foreach(v => fs.delete(new Path(versionDir(root, v)), true))
    victims
  }

  private def versionDir(root: String, v: Long): String = s"$root/v=$v"

  private def pointerPath(root: String): Path = new Path(root, PointerName)

  /** The scheme-aware pointer commit (see the class doc's commit
    * contract): temp + atomic rename where rename IS atomic, one
    * direct overwrite-PUT where it is not.
    */
  private def commitPointer(fs: FileSystem, root: String, v: Long): Unit = {
    val bytes = v.toString.getBytes(StandardCharsets.UTF_8)
    if (renameIsAtomic(fs)) {
      val tmp = new Path(root, s".$PointerName.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      // FileContext.rename(OVERWRITE): atomic replace on POSIX/HDFS
      org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
        .rename(tmp, pointerPath(root), Options.Rename.OVERWRITE)
    } else {
      val out = fs.create(pointerPath(root), true) // single PUT
      try out.write(bytes) finally out.close()
    }
  }
}
