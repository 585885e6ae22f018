package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Online LM-perplexity scoring — the deployment shape of
  * [[graft.pipeline.TextAnalysis.bigramLogProb]] (the CCNet-style LM
  * data filter): the interpolated bigram model is trained ONCE on the
  * indexed corpus, FROZEN, and shipped to the executors as a broadcast
  * (the exact production topology — CCNet ships its trained KenLM
  * binary to every worker the same way); each arriving document then
  * scores as a PURE PER-ROW FUNCTION of (text, model) — no state, no
  * shuffle, no watermark; micro-batching cannot change a single row.
  *
  * Model size is the vocabulary grain (unigram + observed-bigram
  * counts), NOT the corpus grain — the standard LM-artifact trade; a
  * 100 TB corpus's token-level work happened once, batch-side, in
  * [[frozenLm]]'s single map-side-combinable aggregation.
  *
  * OOV contract (the frozen model WILL meet unseen tokens online,
  * unlike the self-trained batch op): an unseen unigram scores with
  * count floored to 1 (Laplace floor — p >= (1-lambda)/n, never
  * ln(0)); an unseen PREVIOUS token means no context evidence, so the
  * token scores unigram-only (the first-token rule). On in-vocabulary
  * text the scores equal the batch operator's exactly (same pinned
  * mixture arithmetic, token-order summation inside the batch
  * oracle's 6-dp rounding discipline) — the st25 gate replays the
  * training corpus itself and hash-checks against the p73 oracle
  * VERBATIM.
  */
object StreamingPerplexity {

  /** Frozen model: Jelinek-Mercer interpolated bigram LM counts.
    * `bi` is keyed "prev term" — a single-space join, unambiguous
    * because tokens are whitespace-split and so cannot contain one.
    */
  case class LmModel(lambda: Double, n: Long,
      uni: Map[String, Long], bi: Map[String, Long])

  case class PplDoc(doc_id: Long, text: String)

  case class PplScore(doc_id: Long, n_tokens: Long, avg_logprob: Double)

  /** Mirror of [[graft.pipeline.TextAnalysis.tokens]] row-side:
    * Spark's `trim` strips ASCII spaces only, `split(_, "\\s+", -1)`
    * plus the non-empty filter equals Java split's behavior here.
    * Null text tokenizes empty — the batch operator emits no row for
    * it; the stream scores it 0 over 0 tokens rather than killing
    * the query on one bad row.
    */
  private[streaming] def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else {
      var lo = 0
      var hi = text.length
      while (lo < hi && text.charAt(lo) == ' ') lo += 1
      while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
      text.substring(lo, hi).split("\\s+").filter(_.nonEmpty)
    }

  /** Train the frozen model: ONE corpus pass — (prev, term) pairs come
    * narrow from each row's own token array (the batch operator's
    * plan) and reduce through a single (prev, term)-grain count that
    * keeps the null-prev (first-token) rows, from which BOTH tables
    * derive driver-side: bigram counts are the non-null-prev rows,
    * unigram counts the per-term sums over ALL rows (every token
    * occurs exactly once as `term`). The driver pull is
    * vocabulary-sized by construction.
    */
  def frozenLm(docs: DataFrame, lambda: Double = 0.75): LmModel = {
    val pairRows = docs
      .select(graft.pipeline.TextAnalysis.tokens(col("text")).as("__w"))
      .select(col("__w"), posexplode(col("__w")).as(Seq("pos", "term")))
      .select(col("term"),
        when(col("pos") > 0, element_at(col("__w"), col("pos"))).as("prev"))
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("c"))
      .collect()
    val uni = new scala.collection.mutable.HashMap[String, Long]()
    val bi = Map.newBuilder[String, Long]
    var n = 0L
    pairRows.foreach { r =>
      val term = r.getString(1)
      val c = r.getLong(2)
      uni.updateWith(term)(prev => Some(prev.getOrElse(0L) + c))
      n += c
      if (!r.isNullAt(0)) bi += (r.getString(0) + " " + term) -> c
    }
    LmModel(lambda, n, uni.toMap, bi.result())
  }

  /** Score one document under the frozen model — the pinned mixture
    * arithmetic of the batch operator, summed in token order.
    */
  private[streaming] def scoreDoc(docId: Long, text: String,
      m: LmModel): PplScore = {
    val w = tokenize(text)
    val nD = m.n.toDouble
    var sum = 0.0
    var i = 0
    while (i < w.length) {
      val cu = m.uni.getOrElse(w(i), 0L) max 1L // Laplace floor for OOV
      val cuPrev = if (i == 0) 0L else m.uni.getOrElse(w(i - 1), 0L)
      val p =
        if (cuPrev == 0L) cu.toDouble / nD // first token or unseen context
        else {
          val cb = m.bi.getOrElse(w(i - 1) + " " + w(i), 0L)
          (m.lambda * cb.toDouble) / cuPrev.toDouble +
            ((1.0 - m.lambda) * cu.toDouble) / nD
        }
      sum += math.log(p)
      i += 1
    }
    PplScore(docId, w.length.toLong,
      if (w.length == 0) 0.0 else sum / w.length)
  }

  /** Stateless stream scorer: the model rides a Spark broadcast (one
    * copy per executor, not per task). Empty/null documents emit NO
    * row — the batch operator's contract (its tokens-explode produces
    * nothing to aggregate for them). Emitting (0, 0.0) instead would
    * hand empty docs the best possible score and a downstream
    * perplexity-band filter would keep exactly the docs it must drop.
    */
  def scoreStream(stream: Dataset[PplDoc], model: LmModel)(
      implicit spark: SparkSession): Dataset[PplScore] = {
    val b = spark.sparkContext.broadcast(model)
    stream.map(d => scoreDoc(d.doc_id, d.text, b.value))(
      Encoders.product[PplScore])
      .filter(_.n_tokens > 0L)
  }
}
