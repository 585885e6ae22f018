package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis
import graft.pipeline.TextAnalysis.TermQuery

/** Online BM25 scoring of an arriving document stream against a
  * FROZEN query set + corpus statistics — the ingest-side twin of the
  * batch retrieval ([[TextAnalysis.multiQueryBm25]]): as documents
  * are crawled, each is tagged with its score against every standing
  * probe query (contamination sentinels, topic monitors, eval-set
  * miners) without waiting for the next batch sweep.
  *
  * Architecture — frozen statistics, stateless scoring: BM25 needs
  * corpus-level stats (per-term df, doc count, average length). A
  * stream cannot know its own final stats, and letting them drift
  * per-batch would make every score depend on arrival order — so the
  * stats are computed ONCE from the indexed corpus
  * ([[frozenStats]], a bounded |terms|+1-row driver pull) and shipped
  * into the stream as literals, exactly how a production search
  * engine scores against its last-published index epoch. Scoring is
  * then a PURE PER-ROW projection: per query term, tf inside the
  * row's own token array (a doc arrives whole — no cross-row tf
  * aggregation exists to need state), one [[TextAnalysis.bm25Addend]]
  * per hit term summed in pinned term order. No state store, no
  * shuffle, no watermark — micro-batching cannot change a single
  * output row, which is what makes the batch oracle shared verbatim
  * with the p98 gate.
  *
  * Refresh cadence: stats go stale as the corpus grows; re-run
  * [[frozenStats]] at index-publish cadence and restart the query —
  * the same epoch contract as the materialized LSH/IVF indexes
  * (`Dedup.writeLshIndex` / `Similarity.writeIvfIndex`).
  */
object StreamingRetrieval {

  /** Frozen corpus statistics for a term universe: total docs `n`,
    * total token count `tot`, and per-term document frequency
    * (absent term => df 0 => the term can never score).
    */
  final case class FrozenStats(n: Long, tot: Long, df: Map[String, Long])

  /** Compute [[FrozenStats]] from the indexed corpus — one
    * aggregate pass; the driver pull is |terms|+1 rows, bounded by
    * the query universe, never the corpus.
    */
  def frozenStats(corpus: DataFrame, terms: Seq[String],
      textCol: String = "text"): FrozenStats = {
    val toks = corpus.select(TextAnalysis.tokens(col(textCol)).as("__w"))
    val statsRow = toks
      .agg(count(lit(1)).as("n"), sum(size(col("__w")).cast("long")).as("tot"))
      .head()
    val dfRows = toks
      .select(explode(array_distinct(col("__w"))).as("term"))
      .where(col("term").isin(terms.distinct: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect()
    FrozenStats(
      n = statsRow.getLong(0),
      tot = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1),
      df = dfRows.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  /** `(doc_id, query_id, n_hit_terms, score)` per arriving doc and
    * standing query with >= 1 term hit. Works identically on a
    * static frame (the spec's parity harness scores batch == stream
    * row-for-row).
    */
  def scoreStream(docs: DataFrame, queries: Seq[TermQuery],
      stats: FrozenStats, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "scoreStream needs at least one query")
    require(stats.n > 0, "frozen stats cover an empty corpus")
    val avgdl = stats.tot.toDouble / stats.n
    val toks = TextAnalysis.tokens(col(textCol))
    val dl = size(toks).cast("long")

    def tfOf(term: String): Column =
      size(filter(toks, t => t === lit(term))).cast("long")

    // one struct per query: addends summed LEFT-TO-RIGHT in declared
    // term order — a pinned association the batch groupBy cannot
    // promise (both ride the engine-wide 6-dp note)
    val perQuery = queries.map { q =>
      val scored = q.terms.distinct.flatMap { t =>
        stats.df.get(t).filter(_ > 0).map { dft =>
          val tf = tfOf(t)
          (tf,
            when(tf > 0,
              TextAnalysis.bm25Addend(tf, lit(dft), dl, lit(stats.n),
                lit(avgdl), k1, b)).otherwise(lit(0.0)))
        }
      }
      val hits =
        if (scored.isEmpty) lit(0L)
        else scored.map { case (tf, _) =>
          when(tf > 0, lit(1L)).otherwise(lit(0L))
        }.reduce(_ + _)
      val score =
        if (scored.isEmpty) lit(0.0)
        else scored.map(_._2).reduce(_ + _)
      struct(lit(q.queryId).as("query_id"), hits.as("n_hit_terms"),
        score.as("score"))
    }

    docs
      .select(col(idCol).as("doc_id"),
        explode(array(perQuery: _*)).as("__q"))
      .select(col("doc_id"), col("__q.query_id"), col("__q.n_hit_terms"),
        col("__q.score"))
      .where(col("n_hit_terms") > 0)
  }
}
