package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Online benchmark decontamination — the deployment shape of
  * [[graft.pipeline.Contamination.overlap]]: the eval suite's
  * distinct n-gram set is extracted ONCE batch-side, FROZEN, and
  * shipped to the executors as a broadcast (eval sets are small by
  * contract — the same bounded-artifact trade as
  * [[StreamingPerplexity.frozenLm]]); each ARRIVING document then
  * scores as a pure per-row function of (text, benchmark set) — no
  * state, no shuffle, no watermark; micro-batching cannot change a
  * single row. This is the admission-time guard a production crawler
  * runs: flag (or quarantine) eval-contaminated pages the moment
  * they land instead of re-scanning the accumulated corpus before
  * every training run.
  *
  * Emission contract matches the batch operator exactly: one row per
  * document sharing >= 1 distinct n-gram with the benchmark —
  * (doc_id, n_shingles, n_overlap, contamination) with
  * `contamination` a single exact-integer division — so the st30
  * gate replays the p24 corpus and hash-checks against the p24
  * oracle VERBATIM. Clean documents emit nothing (the batch hits
  * join produces no row for them; a downstream quarantine consumes
  * flagged ids only).
  */
object StreamingContamination {

  case class ContDoc(doc_id: Long, text: String)

  case class ContScore(doc_id: Long, n_shingles: Long, n_overlap: Long,
      contamination: Double)

  /** Frozen benchmark artifact: the DISTINCT word n-grams of the
    * eval suite. Collected to the driver — bounded by the eval-suite
    * contract (benchmarks are thousands of rows, not corpus-scale);
    * the corpus side never collects anywhere in this family.
    */
  def frozenBenchmark(benchmark: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): Set[String] =
    graft.pipeline.Dedup.wordShingles(benchmark, n, textCol, idCol)
      .select(col("shingle")).distinct()
      .collect().map(_.getString(0)).toSet

  /** Row-side mirror of [[graft.pipeline.Dedup.wordShingles]]:
    * distinct word n-grams of one document (fewer than n tokens →
    * none, same as the batch explode).
    */
  private[streaming] def shingles(text: String, n: Int): Set[String] = {
    val toks = StreamingPerplexity.tokenize(text)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Stateless stream scorer: benchmark set rides a Spark broadcast
    * (one copy per executor, not per task).
    */
  def scoreStream(stream: Dataset[ContDoc], bench: Set[String], n: Int = 5)(
      implicit spark: SparkSession): Dataset[ContScore] = {
    val b = spark.sparkContext.broadcast(bench)
    stream.flatMap { d =>
      val sh = shingles(d.text, n)
      if (sh.isEmpty) None
      else {
        val hits = sh.count(b.value.contains)
        if (hits == 0) None
        else Some(ContScore(d.doc_id, sh.size.toLong, hits.toLong,
          hits.toDouble / sh.size))
      }
    }(Encoders.product[ContScore])
  }

  case class ExcisedDoc(doc_id: Long, n_tokens: Long, n_removed: Long,
      clean_text: String)

  /** Row-side mirror of
    * [[graft.pipeline.Contamination.exciseOverlaps]]: excise exactly
    * the tokens covered by a benchmark-shared n-gram window, keep
    * the rest in order. Pure per-row function of (text, frozen
    * benchmark) — the admission-time "mask, don't drop" cleaner. One
    * row per document ALWAYS (unlike [[scoreStream]]'s hits-only
    * contract: the cleaner's output IS the corpus), so the st32 gate
    * replays the p115 oracle verbatim.
    */
  private[streaming] def exciseDoc(docId: Long, text: String, n: Int,
      bench: Set[String]): ExcisedDoc = {
    val toks = StreamingPerplexity.tokenize(text)
    if (toks.length < n)
      return ExcisedDoc(docId, toks.length.toLong, 0L, toks.mkString(" "))
    val covered = new Array[Boolean](toks.length)
    var i = 0
    while (i + n <= toks.length) {
      // allocation-light join of the window — same single-space
      // convention as the batch shingles
      val gram = toks.slice(i, i + n).mkString(" ")
      if (bench.contains(gram)) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    val kept = toks.indices.filterNot(covered)
    ExcisedDoc(docId, toks.length.toLong,
      (toks.length - kept.length).toLong,
      kept.map(toks).mkString(" "))
  }

  def exciseStream(stream: Dataset[ContDoc], bench: Set[String], n: Int = 5)(
      implicit spark: SparkSession): Dataset[ExcisedDoc] = {
    val b = spark.sparkContext.broadcast(bench)
    stream.map(d => exciseDoc(d.doc_id, d.text, n, b.value))(
      Encoders.product[ExcisedDoc])
  }
}
