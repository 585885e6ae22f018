package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All operators are pure narrow column expressions (no shuffle, no
  * UDF — every one whole-stage-codegens), so they stream through a
  * 100 TB corpus at scan speed and compose freely with dedup /
  * filtering stages.
  *
  * Determinism: only rational arithmetic on integer counts (no
  * transcendental functions whose libm rounding could differ across
  * engines), so results are oracle-comparable bit-for-bit. The one
  * documented exception is [[unigramLogProb]] (`ln` is the definition
  * of the score) — see its determinism note.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the fast baseline). Empty/whitespace-only
    * text yields ZERO tokens — `split` alone returns [""] there,
    * which would count a phantom token into every budget and hand
    * empty docs a real SimHash signature; the `array_remove` is the
    * only case "" can occur (trim + \s+ cannot produce interior
    * empties). Oracle mirror: `list_filter(string_split_regex(...),
    * t -> t <> '')`.
    */
  def tokens(text: Column): Column =
    array_remove(split(trim(text), "\\s+"), "")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** GPT-2-style pretokenizer pattern: contraction suffixes, then
    * space-prefixed letter / digit / punctuation runs — the segments a
    * BPE vocabulary would merge within. Deliberately lookahead-free so
    * RE2-based engines (DuckDB, Go) match Java's semantics exactly
    * (both are leftmost-first on alternation).
    */
  val BpeTokenPattern: String =
    "'(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish pretokens (whitespace runs are separators, not tokens). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  /** Pretoken count — the standard "token budget" estimator for a
    * pretraining corpus (a real BPE would split each pretoken further,
    * so this is a stable lower bound at scan speed, no vocab needed).
    */
  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("long")

  /** Count of regex hits, as a long. */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    patternCount(text, "\\b(" + stopwords.mkString("|") + ")\\b")

  val EnglishStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "is", "in", "a", "that")

  /** Quality features + a composite score in [0, 1]:
    * 0.4 * min(tokens,50)/50       (length credit)
    *  + 0.3 * min(stopword_ratio,1) (natural-language credit)
    *  + 0.3 * alpha_ratio           (clean-characters credit).
    * Weights are our documented parameters; the shape (length /
    * stopword / character-class ratios) follows standard pretraining
    * data quality heuristics (e.g. Gopher rules). The stopword term
    * is CLAMPED: hits are regex matches over raw text against a
    * whitespace-token denominator, so the raw ratio (exposed
    * unclamped as `stopword_ratio`) can exceed 1 on
    * punctuation-joined stopwords ("the,the" = one token, two hits) —
    * without the clamp the documented [0,1] score bound would break.
    */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_stopwords", stopwordCount(t, EnglishStopwords))
      .withColumn("alpha_chars", patternCount(t, "[A-Za-z]"))
      .withColumn("n_chars_total", length(t).cast("long"))
      .withColumn("stopword_ratio",
        col("n_stopwords") / when(col("n_tokens") === 0, lit(null)).otherwise(col("n_tokens")))
      .withColumn("alpha_ratio",
        col("alpha_chars") / when(col("n_chars_total") === 0, lit(null)).otherwise(col("n_chars_total")))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.4 +
          least(coalesce(col("stopword_ratio"), lit(0.0)), lit(1.0)) * 0.3 +
          coalesce(col("alpha_ratio"), lit(0.0)) * 0.3)
  }

  /** N-gram-heuristic language ID: per-language stopword hit counts,
    * argmax with a fixed priority order (en > es > de > fr) on ties.
    * The word lists are our documented parameters.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scored = LangMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"${lang}_hits", stopwordCount(t, words))
    }
    val Seq(en, es, de, fr) = LangMarkers.map { case (l, _) => col(s"${l}_hits") }
    scored.withColumn("predicted_lang",
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr"))
  }

  /** Content fingerprint: md5 of whitespace-normalized, lower-cased
    * text. The canonical key for exact dedup across formatting
    * variants.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Winnowed rolling-hash fingerprints: Rabin-Karp window hashes
    * over the text's code points (native codegen'd
    * [[graft.functions.RollingWindowHashes]]), then the minimum per
    * band of `band` consecutive windows, distinct per doc —
    * MOSS-style local fingerprints that survive edits outside the
    * changed windows, where [[fingerprint]]'s whole-doc md5 flips on
    * any edit. Output (doc_id, fp) matches the shingle shape, so
    * [[Dedup.jaccardPairs]] composes for containment/overlap
    * detection at ~1/band the index size of full shingling.
    *
    * The hash array is materialized in its own projection and
    * referenced 3x, so Catalyst won't inline the (non-trivial)
    * expression into the banding lambda (the HOF no-CSE trap).
    * Docs shorter than `window` code points yield no fingerprints.
    */
  def winnowedFingerprints(df: DataFrame, window: Int = 8, band: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hashed = df.select(col(idCol).as("doc_id"),
      graft.functions.RollingHashFunctions
        .rollingHashes(col(textCol), window).as("__hs"))
    val hs = col("__hs")
    val mins = transform(
      // ceil(n/band) bands; Column./ is double division — floor back
      sequence(lit(0), floor((size(hs) - 1) / band).cast("int")),
      b => array_min(slice(hs, b * band + 1, lit(band))))
    hashed.select(col("doc_id"),
      explode(when(size(hs) >= 1, mins).otherwise(array())).as("fp"))
      .distinct()
  }

  /** Per-document average unigram log-probability — the classic
    * KenLM-style "LM perplexity" quality proxy with the corpus itself
    * as the unigram model: `avg_logprob = Σ tf·ln(cnt/N) / Σ tf` where
    * `cnt` is the word's corpus count and `N` the corpus token count.
    * Natural-language docs score high (common words), gibberish and
    * boilerplate-with-rare-symbols score low; downstream a quantile
    * gate ([[graft.operators.Medians.filterAtOrAboveQuantile]])
    * turns it into a filter. No smoothing is needed: the model is
    * trained on the scored corpus, so every token has cnt ≥ 1. (To
    * score a corpus against a FOREIGN vocab, left-join and decide the
    * OOV penalty explicitly — deliberately not defaulted here.)
    *
    * Plan shape (the corpus text is read once and never shuffled):
    * per-doc tf aggregation (map-side combinable, (doc, word) grain) →
    * vocab counts from the tf grain (word grain, tiny) → tf⋈vocab on
    * word → per-doc weighted average. Three exchanges, every one over
    * the distinct-pair grain which is ≤ tokens and usually ≪ (Zipf);
    * the 1-row total is a broadcast literal.
    *
    * Determinism note: `ln` is libm-rounded (≤ 1 ulp, no cross-engine
    * contract) and the per-doc Σ is float-order-dependent — both
    * effects are ~1e-12 relative, far inside the oracle's 6-dp
    * rounding, but unlike this module's integer-ratio operators the
    * raw doubles are NOT bit-stable across engines. Persist rounded
    * (or compare rounded) when hashing across engines.
    */
  def unigramLogProb(df: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n"))
    tf.join(vocab, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        (sum(col("tf") * log(col("cnt").cast("double") / col("n"))) /
          sum(col("tf"))).as("avg_logprob"))
  }

  /** Interpolated bigram-LM quality proxy — the context-aware upgrade
    * of [[unigramLogProb]] and the shape of the classic
    * LM-perplexity data filter (CCNet-style: score each document
    * under a corpus LM, gate on the score): per-doc average
    * ln P(w_i | w_{i-1}) with Jelinek-Mercer interpolation
    * `lambda * cb(prev,w)/cu(prev) + (1-lambda) * cu(w)/N`; a
    * document's first token scores unigram-only. The default
    * lambda = 0.75 is chosen binary-exact so `1 - lambda` is too —
    * an inexact lambda (0.7) would make the mixture constant itself
    * engine-dependent, on top of the documented `ln` rounding.
    *
    * No smoothing: the model is self-trained on the scored corpus,
    * so every observed token and bigram has count ≥ 1 (the foreign-
    * vocab OOV decision is deliberately not defaulted, as in
    * [[unigramLogProb]]).
    *
    * Plan shape: the corpus text is read ONCE and never shuffled —
    * (prev, term) pairs come from `element_at` on the same token
    * array (narrow), not a window or self-join; then unigram counts
    * (term grain), bigram counts ((prev, term) grain ≤ tokens), two
    * term-grain joins + one pair-grain join back onto the token rows,
    * and the per-doc average. The 1-row total is a broadcast literal.
    *
    * Determinism: [[unigramLogProb]]'s note applies (`ln` + per-doc
    * float Σ are ~1e-12 — inside the oracle's 6-dp rounding, not
    * bit-stable).
    */
  def bigramLogProb(df: DataFrame, lambda: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .select(col("doc_id"), col("__w"),
        posexplode(col("__w")).as(Seq("pos", "term")))
      .select(col("doc_id"), col("term"),
        when(col("pos") > 0, element_at(col("__w"), col("pos"))).as("prev"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu")).as("n"))
    val bi = toks.where(col("prev").isNotNull)
      .groupBy(col("prev"), col("term")).agg(count(lit(1)).as("cb"))
    toks
      .join(uni, Seq("term"))
      .join(uni.select(col("term").as("prev"), col("cu").as("cu_prev")),
        Seq("prev"), "left")
      .join(bi, Seq("prev", "term"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__p",
        when(col("prev").isNull, col("cu").cast("double") / col("n"))
          .otherwise(
            lit(lambda) * coalesce(col("cb"), lit(0L)).cast("double") /
              col("cu_prev") +
              lit(1.0 - lambda) * col("cu").cast("double") / col("n")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(log(col("__p"))) / count(lit(1))).as("avg_logprob"))
  }

  /** Per-document top-`n` rarity-weighted terms — the TF-IDF keyword
    * shape with weight `tf / df` instead of `tf * ln(N/df)`: one
    * IEEE division of two exact integers is correctly rounded and
    * therefore bit-identical across engines, where `ln` is a libm
    * call with no cross-engine rounding contract (the engine-wide
    * determinism rule). The 1/df weight preserves the ranking
    * property that matters (rare-in-corpus, frequent-in-doc terms
    * first); ties break by term ascending.
    *
    * Plan: tf aggregation (map-side combinable, keyed (doc, term)) →
    * df aggregation over the tf grain (keyed term — counts DOCS, so
    * df needs no second scan of the corpus) → tf⋈df on term → top-n
    * window per doc. Three exchanges over token-grain frames that
    * shrink at each step; the corpus TEXT is read once and never
    * shuffled.
    */
  def topRarityTerms(df: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(docFreq, "term")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Okapi BM25 keyword scoring (Lucene idf variant — always
    * positive): every doc containing >= 1 query term scored as
    *
    *   Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    *       · tf·(k1+1) / (tf + k1·((1−b) + b·(dl/avgdl)))
    *
    * The corpus-side retrieval primitive (keyword search over a
    * training corpus: contamination triage, topic probes, eval-set
    * mining) — cheap enough to run inline because the term filter
    * lands BEFORE the first exchange: text explodes in a narrow
    * projection, non-query tokens are discarded at scan, so only
    * (doc, query-term) hits — |Q| integers per doc max — ever
    * shuffle. df table is |Q| rows broadcast; corpus stats a 1-row
    * broadcast.
    *
    * Determinism: each (doc, term) addend is one pinned-order chain
    * of IEEE ops and ONE ln; the per-doc sum over <= |Q| addends
    * rides the engine-wide 6-dp note ([[unigramLogProb]]).
    */
  def bm25Scores(df: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Scores needs at least one query term")
    val toks = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__w"))
    val dl = toks.select(col("doc_id"),
      size(col("__w")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    // dl rides the exploded hit rows (functionally dependent on
    // doc_id, so an extra grouping key, not a grain change) — the
    // corpus-sized dl frame never joins back: only hit rows shuffle
    val tf = toks
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      // avgdl as ONE division of exact integer totals — identical in
      // the SQL mirror (tot::DOUBLE / n)
      .withColumn("__avgdl", col("tot").cast("double") / col("n"))
      .withColumn("__s",
        bm25Addend(col("tf"), col("df"), col("dl"), col("n"), col("__avgdl"), k1, b))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("__s")).as("score"))
  }

  /** One (doc, term) BM25 addend — the EXACT expression chain
    * [[bm25Scores]] always used, factored so the multi-query
    * ([[multiQueryBm25]]) and streaming
    * ([[graft.streaming.StreamingRetrieval]]) paths score
    * bit-identically (same parenthesization, ONE ln per addend; the
    * per-doc sum over <= |Q| addends rides the engine-wide 6-dp
    * note).
    */
  private[graft] def bm25Addend(tf: Column, df: Column, dl: Column,
      n: Column, avgdl: Column, k1: Double, b: Double): Column =
    log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5))) *
      (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (dl / avgdl)))

  /** One named term query of a retrieval batch. */
  final case class TermQuery(queryId: Long, terms: Seq[String])

  /** Batched BM25 retrieval — a whole QUERY SET scored in ONE corpus
    * pass: `(query_id, doc_id, n_hit_terms, score)` for every doc
    * hitting >= 1 term of a query. The eval-mining / contamination-
    * triage shape: thousands of probe queries against a 100 TB
    * corpus must share the scan, not rerun it per query
    * ([[bm25Scores]] x |queries| would).
    *
    * Scale shape: the union of all query terms is a driver-side
    * literal `isin` filter, so non-query tokens die AT THE SCAN and
    * only (doc, hit-term) rows — <= |terms| integers per doc — ever
    * shuffle. The term->query map and per-term df are |terms|-row
    * broadcasts; corpus stats a 1-row broadcast; one exchange keyed
    * by doc_id builds tf, one keyed by (query_id, doc_id) sums the
    * final scores. A term shared by two queries scores once per
    * query (the broadcast term->query join fans it out AFTER tf is
    * aggregated — corpus work is per-term, never per-query).
    *
    * Determinism: each addend is [[bm25Addend]]'s pinned chain;
    * per-(query, doc) sums ride the 6-dp note. Ranking cuts stay
    * spec-side (6-dp equality cannot order raw transcendental
    * scores — the [[bm25TopK]] contract).
    */
  def multiQueryBm25(df: DataFrame, queries: Seq[TermQuery],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "multiQueryBm25 needs at least one query")
    require(queries.forall(_.terms.nonEmpty), "every query needs >= 1 term")
    val spark = df.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_.terms).distinct
    val termToQuery = queries
      .flatMap(q => q.terms.distinct.map(t => (q.queryId, t)))
      .toDF("query_id", "term")
    val toks = df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("__w"))
    val dl = toks.select(col("doc_id"),
      size(col("__w")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    // dl rides the exploded hit rows (see bm25Scores) — no
    // corpus-sized join back
    val tf = toks
      .select(col("doc_id"), size(col("__w")).cast("long").as("dl"),
        explode(col("__w")).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(docFreq), Seq("term"))
      .join(broadcast(termToQuery), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("tot").cast("double") / col("n"))
      .withColumn("__s",
        bm25Addend(col("tf"), col("df"), col("dl"), col("n"), col("__avgdl"), k1, b))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("__s")).as("score"))
  }

  /** Per-query top-n over [[multiQueryBm25]] — a query-partitioned
    * window (parallel across queries, never a global sort); same
    * spec-side-only ranking contract as [[bm25TopK]].
    */
  def multiQueryBm25TopK(df: DataFrame, queries: Seq[TermQuery], n: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    multiQueryBm25(df, queries, k1, b, idCol, textCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= n)
  }

  /** Top-n BM25 retrieval: [[bm25Scores]] cut to the n best docs
    * (score desc, doc_id tie-break) — a TakeOrderedAndProject, never
    * a global sort. Spec-gated: the cut compares raw transcendental
    * scores, which the cross-engine 6-dp contract cannot order; the
    * SCORES (p79) carry the oracle.
    */
  def bm25TopK(df: DataFrame, queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bm25Scores(df, queryTerms, k1, b, idCol, textCol)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(n)

  /** Non-whitespace C0/DEL control characters (keeps \t \n \r —
    * they carry layout, and line-grain operators depend on \n).
    * Hex-escape ranges only, no character-class intersection — the
    * pattern text is valid and identical under Java regex AND RE2,
    * so the DuckDB oracle runs the SAME pattern.
    */
  val ControlCharPattern: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Canonical text cleaning for corpus ingestion, in the order
    * every step expects: (1) Unicode NFC composition (the native
    * [[graft.functions.NfcNormalize]] — composed vs decomposed
    * encodings of the same text must stop being distinct BEFORE
    * anything hashes, shingles or tokenizes it), (2) strip
    * non-whitespace control characters, (3) collapse space/tab runs,
    * (4) trim. Pure narrow codegen'd scan ops — composes with every
    * downstream operator at scan speed.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        graft.functions.UnicodeFunctions.nfcNormalize(text),
        ControlCharPattern, ""),
      "[ \\t]+", " "))
}
