package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** The round-17 query-lifetime cache registry: pin persists exactly
  * like the call it replaced, release drops every pinned frame and
  * nothing else (the session mart cache must survive a release).
  */
class SessionCacheSpec extends SparkSpec {
  import spark.implicits._

  test("pin persists at MEMORY_AND_DISK and release unpersists it") {
    SessionCache.release() // drain anything a prior suite pinned
    val df = Seq(1, 2, 3).toDF("x").select(col("x") * 2 as "y")
    val pinned = SessionCache.pin(df)
    assert(pinned eq df, "pin must return the same frame (persist mutates)")
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize the cache
    val released = SessionCache.release()
    assert(released == 1)
    assert(df.storageLevel == StorageLevel.NONE,
      "release must uncache the pinned frame")
  }

  test("release is idempotent and scoped to pins since the last release") {
    SessionCache.release()
    assert(SessionCache.release() == 0)
    val a = SessionCache.pin(Seq(1).toDF("a"))
    val b = SessionCache.pin(Seq(2).toDF("b"))
    assert(SessionCache.release() == 2)
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    assert(SessionCache.release() == 0)
  }

  test("release leaves independently persisted frames (mart cache) alone") {
    SessionCache.release()
    val mart = Seq((1, "x")).toDF("k", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      SessionCache.pin(Seq(3).toDF("c"))
      SessionCache.release()
      assert(mart.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "an unregistered persist must survive release")
    } finally { mart.unpersist(); () }
  }

  test("operator results are identical with pins released mid-session") {
    // jaccardPairs pins its shingle substrate; a release AFTER the
    // action must not change what a fresh invocation computes
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different words here now")).toDF("doc_id", "text")
    val sh = graft.pipeline.Dedup.wordShingles(docs, 3)
    val first = graft.pipeline.Dedup.jaccardPairs(sh, 0.5).collect().toSet
    SessionCache.release()
    val second = graft.pipeline.Dedup.jaccardPairs(
      graft.pipeline.Dedup.wordShingles(docs, 3), 0.5).collect().toSet
    assert(first == second)
  }
}
