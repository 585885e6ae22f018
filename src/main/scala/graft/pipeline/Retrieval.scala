package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Md5Hash, SketchFunctions => SK}

/** Retrieval composition operators — the library forms of the p123/
  * p124 gate shapes: ranked-list construction, reciprocal-rank
  * fusion, and anchor-text aggregation. All three are
  * corpus-never-to-driver, bounded-state compositions of the
  * engine's scoring primitives ([[TextAnalysis.bm25Scores]],
  * [[Similarity.bruteForceTopK]], [[LinkGraph.pageRankUnits]]).
  */
object Retrieval {

  /** Dense 1-based ranks of the top `k` rows of a score table —
    * TakeOrdered FIRST (distributed top-k; the corpus never feeds a
    * global window), then `row_number` over the bounded k-row list.
    * Tie-break is (score DESC, id ASC), deterministic and
    * oracle-restatable. Output: (idCol, rank).
    */
  def topKRanks(scores: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame =
    scores.orderBy(col(scoreCol).desc, col(idCol)).limit(k)
      .select(col(idCol), row_number()
        .over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .as("rank"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    * of named ranked lists — each a (idCol, rank) table, e.g. from
    * [[topKRanks]]. Fused score is Σ 1/(k + rank) over the lists the
    * id appears in (a missing side contributes 0.0 — the COALESCE
    * convention, so single-list ids still rank); ties break on id.
    * Output: (idCol, r_<name> per list, rrf), top `topK` rows. The
    * lists are bounded (top-k each), so the full-outer fusion join
    * is a few-row driver-free merge regardless of corpus size.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String = "doc_id",
      k: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val renamed = lists.map { case (name, df) =>
      name -> df.select(col(idCol), col("rank").as(s"r_$name"))
    }
    val joined = renamed.map(_._2)
      .reduce(_.join(_, Seq(idCol), "full_outer"))
    val rrf = renamed.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k) + col(s"r_$name")), lit(0.0))
    }.reduce(_ + _)
    joined
      .select((col(idCol) +: renamed.map { case (n, _) => col(s"r_$n") })
        :+ rrf.as("rrf"): _*)
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
  }

  /** Anchor-text aggregation — for every link target, the top-`k`
    * anchor strings its in-links carry (what the web "calls" the
    * page; the document-expansion / quality signal next to the
    * [[LinkGraph]] rank prior). `edges` is (src, dst); `anchors` is
    * (src, anchor), the per-source anchor string (null/empty anchors
    * drop). Scale shape: one (dst, anchor) map-side-combinable
    * count, then the NATIVE `top_k_by_score` aggregate — O(targets ×
    * k) state on the wire, never a per-target sort of every distinct
    * anchor; the anchor string rides a bounded (dst, hash)-grain
    * join back. Keys are the anchors' 60-bit MD5 hashes, so the
    * tie-break is (count DESC, hash ASC) — deterministic and
    * restatable by an oracle with the same hash.
    * Output: (doc_id, rank, anchor, cnt).
    */
  def anchorTopK(edges: DataFrame, anchors: DataFrame,
      k: Int = 2): DataFrame = {
    val withAnchor = edges.join(anchors, "src")
      .where(col("anchor").isNotNull && col("anchor") =!= "")
    val counts = withAnchor.groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", Md5Hash.h60(col("anchor")))
    val top = counts.groupBy(col("dst"))
      .agg(SK.topKByScore(col("cnt").cast("double"), col("h"), k)
        .as("keys"))
    top.select(col("dst"), posexplode(col("keys")).as(Seq("pos", "h")))
      .join(counts, Seq("dst", "h"))
      .select(col("dst").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("anchor"), col("cnt"))
  }
}
