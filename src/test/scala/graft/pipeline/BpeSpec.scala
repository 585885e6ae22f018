package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** INDEPENDENT reference: GPT-2-style min-rank-present iteration
    * (repeatedly merge ALL occurrences of the lowest-rank bigram
    * present), deliberately a different algorithm shape than the
    * engine's rank-order application — for trained merge lists the
    * two must agree.
    */
  private def referenceBpe(word: String, merges: Array[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp))).toVector
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val (a, b) = present.minBy(_._2)._1
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms.length
  }

  private def docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the cat"),
    (2L, "concatenation of cats and caterpillars"),
    (3L, ""),
    (4L, "aaaa aaaa aa"),
    (5L, "Mixed CASE text, with punct!! and 123 numbers"))
    .toDF("doc_id", "text")

  test("hand-computed merges on a crafted corpus") {
    // corpus "aa aa ab": pretokens 'aa', ' aa', ' ab'. Adjacent pair
    // counts: (a,a)=2 ('aa' and ' aa'), (' ',a)=2 (' aa' and ' ab'),
    // (a,b)=1 — the tie breaks to the lexicographically smallest
    // pair, (' ',a)
    val tiny = Seq((0L, "aa aa ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(tiny, numMerges = 1)
    assert(merges.head === (" ", "a"))
    // with that single merge: 'aa'->[a,a]=2, ' aa'->[' a',a]=2,
    // ' ab'->[' a',b]=2
    val counts = Bpe.tokenCounts(tiny, merges).collect().head
    assert(counts.getAs[Long]("n_pretokens") === 3L)
    assert(counts.getAs[Long]("n_bpe_real") === (2L + 2L + 2L))
  }

  test("rank-order application == independent min-rank reference on every pretoken") {
    val merges = Bpe.trainMerges(docs, numMerges = 32)
    val pretokens = docs
      .select(explode(TextAnalysis.bpeTokens(col("text"))).as("pt"))
      .distinct().as[String].collect()
    assert(pretokens.nonEmpty)
    pretokens.foreach { pt =>
      assert(Bpe.applyMerges(pt, merges).length === referenceBpe(pt, merges),
        s"application order diverges on pretoken '$pt'")
    }
  }

  test("invariant: n_pretokens <= n_bpe_real <= code points; empty doc = 0") {
    val merges = Bpe.trainMerges(docs, numMerges = 16)
    val rows = Bpe.tokenCounts(docs, merges).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val pre = r.getAs[Long]("n_pretokens")
      val real = r.getAs[Long]("n_bpe_real")
      assert(real >= pre, s"doc ${r.getLong(0)}: real $real < pretokens $pre")
    }
    assert(rows.find(_.getLong(0) == 3L).get.getAs[Long]("n_bpe_real") === 0L)
  }

  test("more merges never increase the count; zero merges = code points") {
    val m0 = Bpe.tokenCounts(docs, Array.empty).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_real")).toMap
    // zero merges: every pretoken splits to its code points
    val expected = docs.select(col("doc_id"),
      aggregate(TextAnalysis.bpeTokens(col("text")), lit(0L),
        (acc, t) => acc + length(t)).as("cps"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m0 === expected)
    val m8 = Bpe.tokenCounts(docs, Bpe.trainMerges(docs, 8)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_real")).toMap
    val m32 = Bpe.tokenCounts(docs, Bpe.trainMerges(docs, 32)).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_real")).toMap
    m0.keys.foreach { id =>
      assert(m8(id) <= m0(id) && m32(id) <= m8(id), s"doc $id not monotone")
    }
  }

  test("training is deterministic across partitionings") {
    val a = Bpe.trainMerges(docs, 24)
    val b = Bpe.trainMerges(docs.repartition(7), 24)
    assert(a.toSeq === b.toSeq)
  }

  /** INDEPENDENT naive trainer: full pair recount every round (the
    * textbook Sennrich loop), run on the same driver-side histogram
    * the engine trains on. The engine's incremental-update trainer
    * must emit a byte-identical merge table.
    */
  private def naiveTrain(hist: Array[(String, Long)], numMerges: Int): Array[(String, String)] = {
    var words = hist.map { case (w, n) => (Bpe.splitSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(k =>
          counts.update(k, counts.getOrElse(k, 0L) + n))
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, n)
        }
      }
      round += 1
    }
    merges.result().toArray
  }

  private def corpusHistogram(df: org.apache.spark.sql.DataFrame): Array[(String, Long)] =
    df.select(explode(TextAnalysis.bpeTokens(col("text"))).as("pt"))
      .groupBy("pt").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pt").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("incremental pair counting == naive recount at 1024 merges (and at exhaustion)") {
    // high-entropy corpus: md5-hex words give a 16-char alphabet with
    // thousands of distinct adjacent pairs, so 1024 merges is a REAL
    // training run, not an early exhaustion
    val md = java.security.MessageDigest.getInstance("MD5")
    def word(d: Int, k: Int): String = md.digest(s"$d:$k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    val big = (0 until 100).map(d =>
      (d.toLong, (0 until 40).map(k => word(d, k)).mkString(" ")))
      .toDF("doc_id", "text")

    val incremental = Bpe.trainMerges(big, numMerges = 1024)
    val naive = naiveTrain(corpusHistogram(big), numMerges = 1024)
    assert(incremental.length === 1024, "corpus exhausted early; gate would be weak")
    assert(incremental.toSeq === naive.toSeq)

    // exhaustion parity on the tiny corpus: both must stop at the same
    // merge list when no adjacent pairs remain
    val tinyInc = Bpe.trainMerges(docs, numMerges = 100000)
    val tinyNaive = naiveTrain(corpusHistogram(docs), numMerges = 100000)
    assert(tinyInc.toSeq === tinyNaive.toSeq)
  }
}
