package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("quality features: ratios and score on a known doc") {
    val df = Seq((1L, "the cat and the dog")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).head()
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("n_stopwords") === 3L) // the, and, the
    assert(r.getAs[Long]("alpha_chars") === 15L)
    assert(r.getAs[Long]("n_chars_total") === 19L)
    val expected = math.min(5.0 / 50.0, 1.0) * 0.4 + 3.0 / 5.0 * 0.3 + 15.0 / 19.0 * 0.3
    assert(math.abs(r.getAs[Double]("quality_score") - expected) < 1e-12)
  }

  test("quality features: empty text yields null ratios, score 0-ish") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).head()
    assert(r.getAs[Any]("alpha_ratio") === null)
    assert(r.getAs[Double]("quality_score") >= 0.0)
  }

  test("tokenizer: empty/whitespace-only text counts ZERO tokens, not a phantom ''") {
    val df = Seq((1L, ""), (2L, "   "), (3L, " one two ")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 2L))
    // and empty docs get NO SimHash signature (no phantom-token votes)
    val sigs = Dedup.simHashSignatures(df).collect().map(_.getLong(0)).toSet
    assert(sigs === Set(3L))
  }

  test("quality_score stays within [0,1] when punctuation-joined stopwords inflate hits") {
    // 2 whitespace tokens but 5 \b-bounded stopword matches:
    // raw stopword_ratio = 2.5 — exposed unclamped, but the score's
    // stopword TERM clamps at 1 so the documented bound holds
    val df = Seq((1L, "the-and-of the,and")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).head()
    assert(r.getAs[Double]("stopword_ratio") === 2.5)
    assert(r.getAs[Double]("quality_score") <= 1.0)
  }

  test("langId: marker argmax with fixed tie priority") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el perro y la casa de los vecinos"),
      (3L, "der hund und die katze ist nicht da"),
      (4L, "le chat et les chiens est une famille"),
      (5L, "xyzzy plugh")) // no markers anywhere -> all 0 -> 'en' priority
      .toDF("doc_id", "text")
    val got = TextAnalysis.langId(df).select("doc_id", "predicted_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "en"))
  }

  test("fingerprint: whitespace/case variants collapse") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "hello\tworld"),
      (4L, "different"))
      .toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(1) === fps(2))
    assert(fps(3) !== fps(0))
  }

  test("bpeTokens: GPT-2-style segmentation of contractions/digits/punct") {
    val df = Seq((1L, "I don't have 42 apples, sadly.")).toDF("doc_id", "text")
    val toks = df.select(TextAnalysis.bpeTokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    // "don't" splits into "don" + "'t"; " 42" keeps its leading space;
    // punctuation segments separately
    assert(toks === Seq("I", " don", "'t", " have", " 42", " apples",
      ",", " sadly", "."))
    val counts = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe")).head()
    assert(counts.getLong(0) === 6L)
    assert(counts.getLong(1) === 9L)
  }

  test("topRarityTerms: tf/df ranking, term-asc tie-break, top-n cut") {
    // corpus: "rare" appears in 1 doc, "shared" in all 3; doc 1 repeats
    // "rare" twice -> score 2.0 beats everything
    val docs = Seq(
      (1L, "rare rare shared alpha"),
      (2L, "shared beta beta"),
      (3L, "shared gamma")).toDF("doc_id", "text")
    val got = TextAnalysis.topRarityTerms(docs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: rare tf=2 df=1 score 2.0; alpha tf=1 df=1 score 1.0
    assert(got((1L, 1L)) === (("rare", 2L, 1L, 2.0)))
    assert(got((1L, 2L)) === (("alpha", 1L, 1L, 1.0)))
    // doc 2: beta tf=2 df=1 score 2.0 first; gamma-doc: gamma then shared
    assert(got((2L, 1L))._1 === "beta")
    assert(got((3L, 1L)) === (("gamma", 1L, 1L, 1.0)))
    // "shared" df=3 score 1/3 only surfaces where the doc has < 2
    // better terms
    assert(got((3L, 2L)) === (("shared", 1L, 3L, 1.0 / 3)))
    // top-n cut: no rank beyond 2
    assert(got.keys.map(_._2).max === 2L)
  }

  test("topRarityTerms: equal scores order by term ascending") {
    val docs = Seq((1L, "zeta alpha"), (2L, "keeper")).toDF("doc_id", "text")
    // zeta and alpha both tf=1 df=1 -> score 1.0; alpha must rank first
    val got = TextAnalysis.topRarityTerms(docs, n = 5)
      .where(col("doc_id") === 1L).orderBy(col("rank"))
      .collect().map(_.getString(1)).toSeq
    assert(got === Seq("alpha", "zeta"))
  }

  test("unigramLogProb: hand-computed corpus model, common words score higher, empty docs drop") {
    // corpus tokens: a a a | b | a b  -> N=6, p(a)=4/6, p(b)=2/6
    val docs = Seq(
      (1L, "a a a"),     // avg = ln(4/6)
      (2L, "b"),         // avg = ln(2/6)
      (3L, "a b"),       // avg = (ln(4/6) + ln(2/6)) / 2
      (4L, "   ")        // zero tokens -> no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    val (lnA, lnB) = (math.log(4.0 / 6), math.log(2.0 / 6))
    assert(math.abs(got(1L)._2 - lnA) < 1e-12)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(2L)._2 - lnB) < 1e-12)
    assert(math.abs(got(3L)._2 - (lnA + lnB) / 2) < 1e-12)
    // the common-word doc scores strictly higher than the rare-word doc
    assert(got(1L)._2 > got(3L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("bigramLogProb: hand-computed mixture, first token unigram-only") {
    // single doc "a b a b": uni a=2 b=2 N=4; bi (a,b)=2 (b,a)=1
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val row = TextAnalysis.bigramLogProb(docs).collect().head
    assert(row.getLong(1) === 4L)
    val p1 = 2.0 / 4 // a (first token, unigram)
    val p2 = 0.75 * 2 / 2 + 0.25 * 2 / 4 // b | a
    val p3 = 0.75 * 1 / 2 + 0.25 * 2 / 4 // a | b
    val expected =
      (math.log(p1) + math.log(p2) + math.log(p3) + math.log(p2)) / 4
    assert(math.abs(row.getDouble(2) - expected) < 1e-12)
  }

  test("bigramLogProb is context-sensitive where the unigram model is blind") {
    // identical unigram histograms, different order: the bigram model
    // must separate them, the unigram model must not
    val docs = Seq((1L, "x y x y"), (2L, "x x y y")).toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uniscores = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uniscores(1L) - uniscores(2L)) < 1e-12)
    assert(math.abs(bi(1L) - bi(2L)) > 1e-6)
    // doc 1's alternation is the corpus's dominant pattern -> higher
    assert(bi(1L) > bi(2L))
  }

  test("bm25Scores: hand-computed score, non-matching docs absent") {
    // corpus: 3 docs, query {x}: df(x)=2, N=3, dl = 2/4/3, avgdl = 3
    val docs = Seq(
      (1L, "x y"), (2L, "x x q r"), (3L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Scores(docs, Seq("x"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(3L), "doc without query terms must be absent")
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / 3.0)))
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - s(1, 2)) < 1e-12)
    assert(math.abs(got(2L)._2 - s(2, 4)) < 1e-12)
    // higher tf wins, but sub-linearly (saturation): score(tf=2) is
    // less than twice score(tf=1) at equal length
    assert(got(2L)._2 > got(1L)._2)
  }

  test("bm25: rare terms outrank common terms; length normalization bites") {
    val docs = (0L until 100L).map { i =>
      val base = "common common common"
      (i, if (i == 7L) s"$base rare" else base)
    }.toDF("doc_id", "text")
    val scored = TextAnalysis.bm25Scores(docs, Seq("common", "rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 7 has everything the others have plus the df=1 term
    assert(scored(7L) > scored(0L))
    val top = TextAnalysis.bm25TopK(docs, Seq("common", "rare"), n = 1)
      .collect().map(_.getLong(0))
    assert(top === Array(7L))
    // bm25TopK tie-break: equal-scored docs cut by doc_id ascending
    val topTies = TextAnalysis.bm25TopK(docs, Seq("common"), n = 3)
      .collect().map(_.getLong(0))
    assert(topTies.take(2) === Array(0L, 1L))
  }
}
