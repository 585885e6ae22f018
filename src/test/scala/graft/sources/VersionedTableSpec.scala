package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot isolation contract of [[VersionedTable]]: a reader
  * planned before a commit keeps its snapshot across any number of
  * later commits; the pointer swap is all-or-nothing; vacuum is the
  * only thing that invalidates old snapshots.
  */
class VersionedTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-vt").toString + "/tbl"

  test("reader planned before a commit keeps its snapshot; new readers see the commit") {
    val root = freshRoot()
    assert(VersionedTable.currentVersion(root).isEmpty)
    val v1 = VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    assert(v1 === 1L)
    // plan the reader against v1 — the exact cross-session scenario
    // the directory-swap tables cannot serve (README "Concurrency")
    val oldReader = VersionedTable.read(spark, root)
    val v2 = VersionedTable.write(Seq((3L, "c")).toDF("id", "s"), root)
    assert(v2 === 2L)
    // the pre-commit reader still answers from v1, post-commit scans see v2
    assert(oldReader.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(VersionedTable.read(spark, root)
      .select("id").collect().map(_.getLong(0)).toSeq === Seq(3L))
    // time travel
    assert(VersionedTable.readVersion(spark, root, 1L).count() === 2L)
  }

  test("vacuum keeps the horizon, deletes beyond it, and old snapshots fail loudly after") {
    val root = freshRoot()
    (1 to 4).foreach(i => VersionedTable.write(Seq((i.toLong, s"v$i")).toDF("id", "s"), root))
    assert(VersionedTable.versions(root) === Seq(1L, 2L, 3L, 4L))
    assert(VersionedTable.vacuum(root, keepLast = 2) === Seq(1L, 2L))
    assert(VersionedTable.versions(root) === Seq(3L, 4L))
    // current always survives even at keepLast = 1
    assert(VersionedTable.vacuum(root, keepLast = 1) === Seq(3L))
    assert(VersionedTable.read(spark, root).select("s").head().getString(0) === "v4")
    // a vacuumed snapshot is a loud error, not silent empty data
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 2L)
    }
  }

  test("a crashed (uncommitted) staging write is invisible and overwritten by the next commit") {
    val root = freshRoot()
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), root)
    // simulate a writer that crashed after staging v=2 but before the
    // pointer rename: the directory exists, the pointer still says 1
    Seq((99L, "orphan")).toDF("id", "s")
      .write.parquet(s"$root/v=2")
    assert(VersionedTable.currentVersion(root) === Some(1L))
    assert(VersionedTable.read(spark, root).count() === 1L)
    // next commit claims version 2, overwriting the orphan atomically
    val v = VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), root)
    assert(v === 2L)
    assert(VersionedTable.read(spark, root)
      .select("id").head().getLong(0) === 2L)
  }

  test("corrupt or missing pointer fails loudly") {
    val root = freshRoot()
    intercept[IllegalStateException] { VersionedTable.read(spark, root) }
    VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), root)
    val hconf = spark.sparkContext.hadoopConfiguration
    // out-of-band tamper (java.nio, stale CRC sidecar) — unreadable
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "_current"),
      "not-a-number".getBytes)
    intercept[IllegalStateException] {
      VersionedTable.currentVersion(root, hconf)
    }
    // in-band garbage (written through the FS, valid checksum) — unparseable
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(hconf)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_current"), true)
    try out.write("not-a-number".getBytes) finally out.close()
    intercept[IllegalStateException] {
      VersionedTable.currentVersion(root, hconf)
    }
  }

  test("second writer is refused while one writes — genuinely concurrent (two threads, latched)") {
    // writer A's staging job blocks inside a UDF until the latch
    // opens, so A provably HOLDS the lock when B attempts; B must be
    // refused loudly, and after A commits B succeeds. The lock is an
    // atomic mkdir — the same primitive across processes.
    val root = freshRoot()
    VersionedTableSpecLatch.reset()
    val gate = udf { (id: Long) =>
      VersionedTableSpecLatch.await(); id
    }
    val slow = Seq(1L, 2L).toDF("id").withColumn("id", gate($"id"))
    @volatile var vA = -1L
    val a = new Thread(() => { vA = VersionedTable.write(slow, root) })
    a.start()
    // wait until A actually holds the lock (acquisition = the
    // exclusive owner-marker create, not the scaffold mkdir)
    val lock = java.nio.file.Paths.get(root, ".graft_writer.lock")
    val marker = lock.resolve("owner")
    val deadline = System.nanoTime() + 10_000_000_000L
    while (!java.nio.file.Files.exists(marker) && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(java.nio.file.Files.exists(marker), "writer A never took the lock")
    val e = intercept[IllegalStateException] {
      VersionedTable.write(Seq((9L, "b")).toDF("id", "s"), root)
    }
    assert(e.getMessage.contains("another writer holds"))
    VersionedTableSpecLatch.open()
    a.join(30000)
    assert(vA === 1L, "writer A must commit v1 after the latch opens")
    assert(!java.nio.file.Files.exists(lock), "lock released after commit")
    // B retries post-release and lands v2
    assert(VersionedTable.write(Seq(9L).toDF("id"), root) === 2L)
    assert(VersionedTable.read(spark, root).count() === 1L)
  }
}

/** Latch shared with the executor threads (local mode = same JVM). */
object VersionedTableSpecLatch {
  @volatile private var latch = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = { latch = new java.util.concurrent.CountDownLatch(1) }
  def open(): Unit = latch.countDown()
  def await(): Unit = {
    latch.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
  }
}
