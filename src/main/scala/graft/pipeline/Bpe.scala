package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting — the REAL token budget, where
  * [[TextAnalysis.bpeTokenCount]] is the scan-speed pretoken lower
  * bound.
  *
  * Standard two-phase shape (Sennrich et al. 2016; GPT-2's bpe.py):
  *
  *  1. TRAIN ([[trainMerges]]): one distributed pass builds the
  *     pretoken frequency histogram (map-side combined, capped
  *     deterministically), then the classic merge loop runs on the
  *     DRIVER over that word-frequency dict — numMerges iterations
  *     over <= maxVocabRows entries, never over the corpus. This is
  *     exactly how BPE vocabularies are trained in practice (on a
  *     frequency dict / sample, applied corpus-wide).
  *
  *  2. APPLY ([[tokenCounts]]): merges are applied to the corpus'
  *     DISTINCT pretokens (mapPartitions over the deduplicated set —
  *     the fast-tokenizer word-cache as a dataflow: Zipf makes
  *     distinct pretokens orders of magnitude smaller than the token
  *     stream), producing a (pretoken -> token count) vocab table
  *     that joins back to the exploded corpus. Work is
  *     O(distinct pretokens x merges), not O(corpus tokens x merges).
  *     At 100 TB the vocab table is a materialized artifact
  *     ([[writeVocab]]) reused across runs and joined (AQE broadcasts
  *     it when it fits); the gate oracle joins the same parquet.
  *
  * Application order: merges are applied IN TRAINING RANK ORDER, one
  * pass each. For a merge list produced by BPE training this is
  * equivalent to the min-rank-present iteration GPT-2 uses (a merge's
  * constituents exist before it by construction); BpeSpec proves the
  * equivalence against an independent min-rank implementation.
  */
object Bpe {

  /** Unicode-code-point symbols of a pretoken (surrogate-pair safe —
    * `"😀"` is ONE symbol).
    */
  private[pipeline] def splitSymbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var j = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp); j += 1
    }
    out
  }

  /** One left-to-right, non-overlapping merge pass of (a, b) -> ab. */
  private def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Apply a trained merge list to one pretoken, rank order. */
  def applyMerges(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = splitSymbols(word)
    var i = 0
    while (i < merges.length && syms.length > 1) {
      syms = applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  /** Train `numMerges` BPE merges on the corpus.
    *
    * Distributed: ONE pretoken-histogram aggregation (16-ish-byte
    * rows through the shuffle, map-side combine). Driver: the
    * classic loop — count adjacent symbol pairs weighted by word
    * frequency, merge the most frequent everywhere, repeat.
    * Deterministic throughout: the histogram cap orders by
    * (count desc, pretoken asc) and pair ties break lexicographically,
    * so two clusters train byte-identical merge tables.
    *
    * The pair counts are maintained INCREMENTALLY (the standard
    * fast-BPE-trainer shape): after a merge, only the words that
    * actually contain the merged pair — tracked by an inverted
    * pair -> word-ids index — have their contributions retracted and
    * re-added. A naive full recount is O(vocabRows) per round, which
    * is a real latency ceiling at production merge counts (a 32k-merge
    * vocab over a 100k-row histogram is 3.2B word visits recounted vs
    * only the affected slice here); BpeSpec proves the incremental
    * loop emits byte-identical merge tables to the naive recount.
    *
    * `maxVocabRows` caps driver memory (train on the head of the
    * frequency dict — standard practice; the tail's counts cannot
    * win a merge anyway).
    */
  def trainMerges(df: DataFrame, numMerges: Int, textCol: String = "text",
      maxVocabRows: Int = 100000): Array[(String, String)] = {
    val hist = df
      .select(explode(TextAnalysis.bpeTokens(col(textCol))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pt").asc)
      .limit(maxVocabRows)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val words: Array[Array[String]] = hist.map { case (w, _) => splitSymbols(w) }
    val freqs: Array[Long] = hist.map(_._2)

    // counts: adjacent-pair frequencies, weighted by word frequency;
    // pairToWords: which word indices currently contain each pair.
    // Both are maintained exactly — an entry whose count reaches 0 is
    // REMOVED (a lingering zero-count pair could win a late tie-break
    // that the recount implementation would never see).
    val counts = mutable.HashMap.empty[(String, String), Long]
    val pairToWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def addContributions(idx: Int): Unit = {
      val syms = words(idx); val n = freqs(idx)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + n)
        pairToWords.getOrElseUpdate(k, mutable.Set.empty[Int]) += idx
        i += 1
      }
    }
    def removeContributions(idx: Int): Unit = {
      val syms = words(idx); val n = freqs(idx)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val left = counts.getOrElse(k, 0L) - n
        if (left <= 0L) counts.remove(k) else counts.update(k, left)
        pairToWords.get(k).foreach { s =>
          s -= idx
          if (s.isEmpty) pairToWords.remove(k)
        }
        i += 1
      }
    }

    words.indices.foreach(addContributions)

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges && counts.nonEmpty) {
      // max count; ties -> lexicographically smallest pair (determinism
      // — minBy totally orders, so HashMap iteration order is moot)
      val best = counts.keysIterator.minBy { k => (-counts(k), k._1, k._2) }
      merges += best
      // only words containing the merged pair change their pair
      // multiset; snapshot the index entry (the loop mutates it)
      val affected = pairToWords.get(best).map(_.toArray).getOrElse(Array.empty)
      java.util.Arrays.sort(affected)
      affected.foreach { idx =>
        removeContributions(idx)
        words(idx) = applyMerge(words(idx), best._1, best._2)
        addContributions(idx)
      }
      round += 1
    }
    merges.toArray
  }

  /** (pretoken -> post-merge token count) over a `pt` column of
    * distinct pretokens — the memoized application table.
    */
  def vocabFor(pretokens: DataFrame, merges: Array[(String, String)]): DataFrame = {
    val spark = pretokens.sparkSession
    import spark.implicits._
    pretokens.select(col("pt")).as[String]
      .mapPartitions { it => it.map(pt => (pt, applyMerges(pt, merges).length.toLong)) }
      .toDF("pt", "n_tokens")
  }

  /** The corpus' distinct-pretoken vocab table — compute ONCE and
    * share between [[writeVocab]] and [[tokenCounts]] (each would
    * otherwise re-run the explode+distinct+merge application).
    */
  def corpusVocab(df: DataFrame, merges: Array[(String, String)],
      textCol: String = "text"): DataFrame =
    vocabFor(
      df.select(explode(TextAnalysis.bpeTokens(col(textCol))).as("pt")).distinct(),
      merges)

  /** Per-document REAL BPE token counts next to the pretoken lower
    * bound: (doc_id, n_pretokens, n_bpe_real). Empty documents keep a
    * 0 count (left join back to the id spine). By construction
    * n_bpe_real >= n_pretokens always (a merge list maps each
    * pretoken to >= 1 symbols) — BpeSpec holds the invariant.
    *
    * Pass `vocab` to reuse a precomputed/materialized vocab table
    * (e.g. one read back from [[writeVocab]]'s parquet) instead of
    * deriving it from this corpus; it must cover every pretoken of
    * `df` (inner join — uncovered pretokens would undercount).
    */
  def tokenCounts(df: DataFrame, merges: Array[(String, String)],
      textCol: String = "text", idCol: String = "doc_id",
      vocab: Option[DataFrame] = None): DataFrame = {
    val pts = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.bpeTokens(col(textCol))).as("pt"))
    val v = vocab.getOrElse(vocabFor(pts.select("pt").distinct(), merges))
    val perDoc = pts.join(v, Seq("pt"))
      .groupBy("doc_id").agg(sum(col("n_tokens")).as("n_bpe_real"))
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.bpeTokenCount(col(textCol)).as("n_pretokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bpe_real", coalesce(col("n_bpe_real"), lit(0L)))
  }

  /** Materialize a vocab table (the reusable tokenization artifact;
    * the p16b gate oracle joins this exact parquet).
    */
  def writeVocab(vocab: DataFrame, path: String): Unit =
    vocab.write.mode("overwrite").parquet(path)
}
