package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LinkGraph.pageRankUnits]] — integer PageRank: hand-computed
  * fixtures, dangling/duplicate-edge contracts, partitioning
  * determinism.
  *
  * Fixture graph: 1→2, 1→3, 2→3 (twice — a real duplicate), 4→1.
  * outdeg: 1↦2, 2↦2, 4↦1; vertex 3 is dangling (dst-only).
  * scale=1000, damping 85/100 → teleport = 150.
  *
  * Round 1 (all ranks 1000):
  *   1→2 and 1→3 each (1000·85) div 200 = 425
  *   2→3 twice: 425 + 425 = 850
  *   4→1: (1000·85) div 100 = 850
  *   r1 = {1: 1000, 2: 575, 3: 1425, 4: 150}
  * Round 2:
  *   1→·: (1000·85) div 200 = 425 each
  *   2→3 twice: (575·85) div 200 = 244 each (48875/200 floors)
  *   4→1: (150·85) div 100 = 127 (12750/100 = 127.5 floors)
  *   r2 = {1: 277, 2: 575, 3: 1063, 4: 150}
  */
class LinkGraphSpec extends SparkSpec {

  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (2L, 3L), (4L, 1L))
    .toDF("src", "dst")

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two hand-computed iterations, floors and duplicate edges exact") {
    val r1 = ranksOf(LinkGraph.pageRankUnits(edges, iterations = 1,
      scale = 1000L))
    assert(r1 === Map(1L -> 1000L, 2L -> 575L, 3L -> 1425L, 4L -> 150L))
    val r2 = ranksOf(LinkGraph.pageRankUnits(edges, iterations = 2,
      scale = 1000L))
    assert(r2 === Map(1L -> 277L, 2L -> 575L, 3L -> 1063L, 4L -> 150L))
  }

  test("iterations=0 is the uniform prior; dangling keeps teleport-only mass") {
    val r0 = ranksOf(LinkGraph.pageRankUnits(edges, iterations = 0,
      scale = 1000L))
    assert(r0 === Map(1L -> 1000L, 2L -> 1000L, 3L -> 1000L, 4L -> 1000L))
    // vertex 4 receives no in-edges: teleport term only, every round
    val r3 = ranksOf(LinkGraph.pageRankUnits(edges, iterations = 3,
      scale = 1000L))
    assert(r3(4L) === 150L)
    // vertex 3 never appears as src yet is ranked (vertex set = src ∪ dst)
    assert(r3.contains(3L))
  }

  test("mass only evaporates: Σ rank ≤ |V| · scale at every depth") {
    (0 to 4).foreach { it =>
      val total = LinkGraph.pageRankUnits(edges, iterations = it,
        scale = 1000L).agg(sum("rank_units")).first().getLong(0)
      assert(total <= 4L * 1000L, s"iteration $it leaked mass: $total")
    }
  }

  test("deterministic across partitionings (integer sums are order-free)") {
    val base = ranksOf(LinkGraph.pageRankUnits(edges, iterations = 3,
      scale = 1000L))
    Seq(1, 3, 7).foreach { p =>
      val got = ranksOf(LinkGraph.pageRankUnits(edges.repartition(p),
        iterations = 3, scale = 1000L))
      assert(got === base, s"partitioning $p diverged")
    }
    // the checkpoint boundary is an execution detail, never a result
    assert(ranksOf(LinkGraph.pageRankUnits(edges, iterations = 3,
      scale = 1000L, checkpoint = false)) === base)
  }

  test("self-loops are real edges: a vertex feeds its own next round") {
    import spark.implicits._
    // 1→1 (self-loop) and 1→2: outdeg(1)=2, vertex 1 receives half
    // its own damped mass back each round
    val g = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val r1 = ranksOf(LinkGraph.pageRankUnits(g, iterations = 1,
      scale = 1000L))
    // contribution per edge: (1000·85) div 200 = 425
    assert(r1 === Map(1L -> 575L, 2L -> 575L))
    val r2 = ranksOf(LinkGraph.pageRankUnits(g, iterations = 2,
      scale = 1000L))
    // round 2: (575·85) div 200 = 244 each
    assert(r2 === Map(1L -> 394L, 2L -> 394L))
  }

  test("tracks float PageRank within floor-loss tolerance on a ring") {
    // 0→1→…→9→0: symmetric, so exact float PageRank is uniform and
    // stationary at `scale`. A prime scale makes every floor lossy
    // (999983·15/100 and r·85/100 never divide evenly), and the loss
    // recursion converges: integer ranks must sit in [scale−4, scale]
    // after 4 rounds (hand-computed fixed point: scale−3).
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val r = ranksOf(LinkGraph.pageRankUnits(ring, iterations = 4,
      scale = 999983L))
    r.values.foreach { v =>
      assert(v <= 999983L && v >= 999983L - 4L, s"ring rank drifted: $v")
    }
  }
}
