package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The object-store-safe storage seam: [[Bronze]] and
  * [[VersionedTable]] address storage through the Hadoop FileSystem
  * API, so the same code serves local paths, `file://` URIs, and
  * `s3a://` buckets. Tested here against (1) an explicit `file://`
  * URI — the Hadoop path-resolution route, not java.nio — and (2) a
  * mock scheme registered as a NON-rename-atomic store, proving the
  * pointer commit takes the single-PUT branch and the table still
  * round-trips (the documented S3 contract, minus the network).
  */
class StorageSeamSpec extends SparkSpec {

  import spark.implicits._

  private def fileUriRoot(prefix: String): String =
    "file://" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("Bronze over a file:// URI: land, read back, list, retain — rename-free") {
    val bronze = new Bronze(fileUriRoot("seam-bronze") + "/bronze",
      spark.sparkContext.hadoopConfiguration)
    val d1 = LocalDate.parse("2024-06-01")
    val d2 = LocalDate.parse("2024-07-15")
    val landed = bronze.saveJson(d1, """{"auctions": []}""")
    assert(landed.startsWith("file:"), s"expected a file: URI, got $landed")
    bronze.saveJson(d2, """{"auctions": []}""")
    assert(bronze.dates() === Seq(d1, d2))
    // overwrite-in-place (at-least-once landing) keeps one object
    bronze.saveJson(d2, """{"auctions": []}""")
    assert(bronze.dates() === Seq(d1, d2))
    assert(bronze.readJson(spark, d2).count() === 1L)
    assert(bronze.retain(d2, retentionDays = 30) === Seq(d1))
    assert(bronze.dates() === Seq(d2))
  }

  test("VersionedTable over a file:// URI: commit, snapshot, vacuum") {
    val root = fileUriRoot("seam-vt") + "/tbl"
    assert(VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), root) === 1L)
    val snap = VersionedTable.read(spark, root)
    assert(VersionedTable.write(Seq((2L, "b")).toDF("id", "s"), root) === 2L)
    assert(snap.select("id").head().getLong(0) === 1L)
    assert(VersionedTable.read(spark, root).select("id").head().getLong(0) === 2L)
    assert(VersionedTable.vacuum(root, keepLast = 1,
      spark.sparkContext.hadoopConfiguration) === Seq(1L))
  }

  test("mock object store (non-atomic rename): pointer commits by direct PUT, table round-trips") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.mockfs.impl", classOf[MockObjectStoreFs].getName)
    val base = java.nio.file.Files.createTempDirectory("seam-mock").toString
    val root = "mockfs://" + base + "/tbl"
    assert(VersionedTable.write(Seq((1L, "a")).toDF("id", "s"), root) === 1L)
    assert(VersionedTable.write(Seq((2L, "b"), (3L, "c")).toDF("id", "s"),
      root) === 2L)
    assert(VersionedTable.currentVersion(root, hconf) === Some(2L))
    assert(VersionedTable.read(spark, root).count() === 2L)
    // the PUT branch must leave no rename-temp artifact behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(base, "tbl", "._current.tmp")),
      "object-store commit must not stage a rename temp")
    // pointer file exists as one object with exactly the version bytes
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base, "tbl", "_current"))).trim === "2")
  }
}

/** RawLocalFileSystem under a fake scheme the commit contract
  * classifies as an object store — the rename-unsafe branch runs for
  * real against local disk.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
}
