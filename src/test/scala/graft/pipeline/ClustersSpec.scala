package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClustersSpec extends SparkSpec {

  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components resolve to their min ids") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (5L, 6L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("a long path converges (multi-hop propagation + shortcut)") {
    // 30-node path written max-first so propagation has to flow the
    // whole chain; also a second component interleaved by id parity
    val path = (1L until 30L).map(i => (i + 1, i))
    assert(cc(path) === (1L to 30L).map(_ -> 1L).toMap)
  }

  test("transitive chain through a shared middle node merges") {
    // a<->b and b<->c but never a<->c directly
    assert(cc(Seq((10L, 7L), (10L, 42L))) ===
      Map(7L -> 7L, 10L -> 7L, 42L -> 7L))
  }

  test("empty pair list yields an empty clustering") {
    val out = Clusters.connectedComponents(
      spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(out.count() === 0)
  }

  test("nearDupClusters groups the transitive closure of verified pairs") {
    // three mutual near-dups (one clause of drift each) + one unique
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, base + "tail one"),
      (2L, base + "tail two"),
      (3L, base + "tail three"),
      (9L, "completely different text with nothing shared at all " * 5))
      .toDF("doc_id", "text")
    val out = Clusters.nearDupClusters(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
    assert(out.forall(t => t._2 === 1L && t._3 === 3L))
  }

  test("dropNearDups keeps one doc per cluster and every singleton") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, base + "tail one"),
      (2L, base + "tail two"),
      (3L, base + "tail three"),
      (9L, "completely different text with nothing shared at all " * 5))
      .toDF("doc_id", "text")
    val kept = Clusters.dropNearDups(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  test("leakageSafeSplit moves whole clusters atomically and covers every doc") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, base + "tail one"),
      (2L, base + "tail two"),
      (3L, base + "tail three"),
      (9L, "completely different text with nothing shared at all " * 5),
      (10L, "another unrelated singleton document body entirely " * 5))
      .toDF("doc_id", "text")
    val out = Clusters.leakageSafeSplit(docs, threshold = 0.5,
      testFraction = 0.5, salt = "s")
      .select("doc_id", "split_key", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // covering: every doc present exactly once
    assert(out.map(_._1).sorted === Seq(1L, 2L, 3L, 9L, 10L))
    // the 1-2-3 cluster shares ONE key (its min id) and ONE split
    val cluster = out.filter(t => Set(1L, 2L, 3L)(t._1))
    assert(cluster.forall(_._2 === 1L))
    assert(cluster.map(_._3).toSet.size === 1)
    // singletons draw from their own ids
    assert(out.find(_._1 === 9L).get._2 === 9L)
    assert(out.find(_._1 === 10L).get._2 === 10L)
    // splits match Sampling.uniform's contract exactly (no re-roll)
    val expected = Seq(1L, 9L, 10L).map { k =>
      k -> Seq(k).toDF("k")
        .select(Sampling.uniform(col("k"), "s").as("u"))
        .collect().head.getDouble(0)
    }.toMap
    out.foreach { case (_, key, split) =>
      assert(split === (if (expected(key) < 0.5) "test" else "train"))
    }
  }
}
