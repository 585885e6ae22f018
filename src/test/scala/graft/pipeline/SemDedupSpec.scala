package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.semDedup]] — cell-scoped semantic dedup verdicts:
  * one keeper per duplicate group (lowest centroid-cos, then smallest
  * id), singleton self-keep, malformed-vector quarantine, and the
  * hot-cell pairing cap.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  /** Two tight groups far apart (x-axis-ish and y-axis-ish) plus one
    * orthogonal loner on z.
    */
  private def grouped = Seq(
    (0L, Array(1.0f, 0.00f, 0.0f)),
    (1L, Array(1.0f, 0.01f, 0.0f)),
    (2L, Array(1.0f, 0.02f, 0.0f)),
    (10L, Array(0.0f, 1.0f, 0.00f)),
    (11L, Array(0.0f, 1.0f, 0.01f)),
    (20L, Array(0.0f, 0.0f, 1.0f)))
    .toDF("vec_id", "embedding")

  test("semDedup: one keeper per cluster, singletons keep themselves") {
    val v = Similarity.semDedup(grouped, nlist = 2, eps = 0.9).collect()
    assert(v.length === 6)
    val byCluster = v.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, rows) =>
      assert(rows.count(_.getAs[Boolean]("keeper")) === 1)
    }
    // the x-group and y-group each collapse; the z loner self-keeps
    val keepers = v.filter(_.getAs[Boolean]("keeper"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(v.count(_.getAs[Boolean]("keeper")) < 6)
    assert(keepers.contains(20L))
  }

  test("semDedup: exact duplicates elect the smallest id (cos tie-break)") {
    val dup = Seq(
      (5L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f)),
      (9L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(-3.0f, 1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val v = Similarity.semDedup(dup, nlist = 2, eps = 0.99).collect()
    val dupRows = v.filter(r => Set(3L, 5L, 9L)(r.getAs[Long]("vec_id")))
    assert(dupRows.map(_.getAs[Long]("cluster_id")).toSet.size === 1)
    assert(dupRows.filter(_.getAs[Boolean]("keeper"))
      .map(_.getAs[Long]("vec_id")).toSeq === Seq(3L))
  }

  test("semDedup: malformed vectors quarantine as flagged keepers") {
    val mixed = grouped.unionByName(
      Seq((99L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding"))
    val v = Similarity.semDedup(mixed, nlist = 2, eps = 0.9,
      dim = Some(3)).collect()
    val q = v.filter(_.getAs[Long]("vec_id") == 99L)
    assert(q.length === 1)
    assert(q.head.getAs[Boolean]("keeper"))
    assert(q.head.isNullAt(q.head.fieldIndex("cell")))
    assert(q.head.getAs[Long]("cluster_id") === 99L)
    // the well-formed rows are judged exactly as without the stray
    assert(v.length === 7)
  }

  test("semDedup: eps monotonicity — a stricter threshold drops fewer") {
    def keepers(eps: Double): Long =
      Similarity.semDedup(grouped, nlist = 2, eps = eps)
        .where(col("keeper")).count()
    assert(keepers(0.999) >= keepers(0.9))
    assert(keepers(0.9) >= keepers(0.5))
  }

  test("semDedup: hot-cell cap excludes the cell from pairing (all keep)") {
    val v = Similarity.semDedup(grouped, nlist = 1, eps = 0.5,
      maxCellSize = 2).collect()
    assert(v.length === 6)
    assert(v.forall(_.getAs[Boolean]("keeper")))
    assert(v.forall(r => r.getAs[Long]("cluster_id") == r.getAs[Long]("vec_id")))
  }

  test("semDedup: nlist = 0 derives cell count from the corpus size") {
    assert(Similarity.semDedupNlist(500) === 1)
    assert(Similarity.semDedupNlist(4097) === 2)
    assert(Similarity.semDedupNlist(1000000) === 245)
    assert(Similarity.semDedupNlist(100000000000L) > (1 << 19))
    // end-to-end: auto mode runs and keeps the one-keeper invariant
    val v = Similarity.semDedup(grouped, nlist = 0, eps = 0.9).collect()
    assert(v.length === 6)
    v.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, rows) =>
      assert(rows.count(_.getAs[Boolean]("keeper")) === 1)
    }
  }

  test("semDedupAgainstIndex: index wins, batch-vs-batch not judged, quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup-idx-")
      .toString + "/idx"
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.sampleCentroids(corpus, nlist = 2)
    Similarity.writeIvfIndex(corpus, centroids, dir)
    val batch = Seq(
      (10L, Array(1.0f, 0.001f, 0.0f)), // near indexed 0 -> dropped
      (11L, Array(0.0f, 0.0f, 1.0f)), // far from index -> keeper
      (12L, Array(0.0f, 0.001f, 1.0f)), // near 11 but index-blind -> keeper
      (13L, Array(0.5f, 0.5f))) // malformed -> quarantined keeper
      .toDF("vec_id", "embedding")
    val v = Similarity.semDedupAgainstIndex(spark, batch, dir, centroids,
      eps = 0.95, dim = Some(3)).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(v.size === 4)
    assert(!v(10L).getAs[Boolean]("keeper"))
    assert(v(10L).getAs[Long]("claimed_by") === 0L)
    assert(v(10L).getAs[Double]("claim_cosine") > 0.99)
    assert(v(11L).getAs[Boolean]("keeper"))
    assert(v(12L).getAs[Boolean]("keeper"),
      "batch-vs-batch pair must not be judged against itself")
    assert(v(13L).getAs[Boolean]("keeper"))
    assert(v(13L).isNullAt(v(13L).fieldIndex("cell")))
  }

  test("semDedupAgainstIndex: overloaded index cell is skipped (batch self-keeps)") {
    val dir = java.nio.file.Files.createTempDirectory("semdedup-idx2-")
      .toString + "/idx"
    val corpus = (0 until 50).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.sampleCentroids(corpus, nlist = 1)
    Similarity.writeIvfIndex(corpus, centroids, dir)
    val batch = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val v = Similarity.semDedupAgainstIndex(spark, batch, dir, centroids,
      eps = 0.9, maxCellSize = 10, dim = Some(3)).collect()
    assert(v.length === 1)
    assert(v.head.getAs[Boolean]("keeper"),
      "capped index cell must under-drop, not claim")
  }
}
