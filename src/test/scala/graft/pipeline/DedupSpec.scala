package graft.pipeline

import graft.SparkSpec

/** Dedup operator edge semantics, incl. the round-1 latent bugs:
  * short docs must not crash shingling, and non-default numHashes must
  * produce correct LSH candidates (the old hardcoded 16 read past the
  * signature array).
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with nothing shared here at all"),
    (4L, "tiny"), // < n tokens: must yield zero shingles, not crash
    (5L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1
    .toDF("doc_id", "text")

  test("wordShingles: short docs yield zero shingles (no crash)") {
    val sh = Dedup.wordShingles(docs, n = 3)
    assert(sh.where("doc_id = 4").count() === 0)
    assert(sh.where("doc_id = 1").count() === 7) // 9 tokens -> 7 trigrams
  }

  test("charShingles: canonical form, short docs safe, composes with jaccard") {
    val sh = Dedup.charShingles(docs, n = 5)
    // "tiny" has 4 chars -> zero 5-gram shingles
    assert(sh.where("doc_id = 4").count() === 0)
    // case/whitespace variants collapse to the same shingles
    import spark.implicits._
    val variants = Seq((1L, "Hello   World"), (2L, "hello world")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(Dedup.charShingles(variants, 5), threshold = 0.99)
    assert(pairs.count() === 1)
  }

  test("exact dedup: deterministic keeper is min doc_id") {
    val groups = Dedup.exactDuplicateGroups(docs)
    val dup = groups.where("dup_count > 1").collect()
    assert(dup.length === 1)
    assert(dup.head.getAs[Long]("keeper_doc_id") === 1L)
    assert(Dedup.dropExactDuplicates(docs).count() === 4)
  }

  test("dropExactDuplicates: opt-in unique-id guard fails fast on duplicate ids") {
    import spark.implicits._
    // duplicate doc_id 1 carrying duplicate content: the keeper id's
    // copies would BOTH survive the semi-join — silent retention
    val dirty = Seq((1L, "same text"), (1L, "same text"), (2L, "other"))
      .toDF("doc_id", "text")
    assert(Dedup.dropExactDuplicates(dirty).count() === 3) // documented hazard
    val e = intercept[IllegalArgumentException] {
      Dedup.dropExactDuplicates(dirty, assertUniqueIds = true)
    }
    assert(e.getMessage.contains("doc_id=1"))
    // clean ids pass the guard unchanged
    assert(Dedup.dropExactDuplicates(docs, assertUniqueIds = true).count() === 4)
  }

  test("jaccardPairs finds the near-dup pair and the exact pair") {
    val pairs = Dedup.jaccardPairs(Dedup.wordShingles(docs, n = 3), threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 5L))) // jaccard 1.0
    assert(pairs.contains((1L, 2L))) // 6/8 = 0.75
    assert(pairs.contains((2L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs: quoted-inside dup has containment 1 but low jaccard") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val long = s"unrelated preamble words here then $quote and a long trailing " +
      "tail of many extra unique words padding the document further onward"
    val docs = Seq((1L, quote), (2L, long), (3L, "nothing in common at all here"))
      .toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, n = 3)
    val cont = Dedup.containmentPairs(sh, threshold = 0.9)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(cont.keySet === Set((1L, 2L)))
    assert(cont((1L, 2L)) === 1.0) // every trigram of the quote is in the long doc
    // ...while jaccard misses it at the same bar
    val jac = Dedup.jaccardPairs(sh, threshold = 0.9).count()
    assert(jac === 0)
  }

  test("minHashNearDups with NON-default numHashes=8 returns correct pairs") {
    val pairs = Dedup.minHashNearDups(docs, threshold = 0.99, numHashes = 8, rowsPerBand = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // identical docs are always LSH candidates (identical signatures)
    // and jaccard 1.0 passes any threshold
    assert(pairs === Set((1L, 5L)))
  }

  test("minHash LSH candidates subset-verify: exact jaccard filters them") {
    val all = Dedup.minHashNearDups(docs, threshold = 0.7, numHashes = 16, rowsPerBand = 4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(all.contains((1L, 5L)))
    assert(!all.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simHashNearDups: identical docs at hamming 0; maxHamming >= 4 rejected") {
    val pairs = Dedup.simHashNearDups(docs, maxHamming = 0)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 5L)))
    intercept[IllegalArgumentException] {
      Dedup.simHashNearDups(docs, maxHamming = 4)
    }
  }

  test("lshCandidatePairs rejects numHashes not divisible by rowsPerBand") {
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(
        Dedup.minHashSignatures(Dedup.wordShingles(docs), 6), numHashes = 6, rowsPerBand = 4)
    }
  }

  test("noveltyCurve: first owner is novel, repeats are not; exact fractions") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a b c d"),      // shingles {a b c, b c d} — all novel
      (2L, "a b c x y"),    // {a b c, b c x, c x y}: 1 repeat, 2 novel
      (3L, "a b c d"))      // all shingles seen before -> novelty 0
      .toDF("doc_id", "text")
    val got = Dedup.noveltyCurve(Dedup.wordShingles(fix)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getAs[Double]("novelty"))).toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) === ((2L, 0L, 0.0)))
    // partitioning cannot move a first-seen (min over a unique order)
    val rep = Dedup.noveltyCurve(Dedup.wordShingles(fix.repartition(7)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rep === got.map { case (k, v) => k -> v._2 })
  }

  test("weightedCosinePairs: hand-computed cosine; non-sharing docs never pair") {
    import spark.implicits._
    val fix = Seq((1L, "x x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val got = Dedup.weightedCosinePairs(fix, maxTermDf = 10).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) === ((1L, 2L)))
    assert(r.getAs[Long]("n_shared") === 2L)
    // w(1)=(x:2/2, y:1/2), w(2)=(x:1/2, y:1/2):
    // dot=0.75, norms=sqrt(1.25), sqrt(0.5)
    val expected = 0.75 / (math.sqrt(1.25) * math.sqrt(0.5))
    assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-12)
  }

  test("weightedCosinePairs: df cap bounds the PAIR grain, norms stay true") {
    import spark.implicits._
    val fix = ((1L, "common rare") +: (2L, "common rare") +:
      (3L until 13L).map(i => (i, "common"))).toDF("doc_id", "text")
    val got = Dedup.weightedCosinePairs(fix, maxTermDf = 2).collect()
    // 'common' (df 12) may not pair anyone; only the rare-sharing duo
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) === ((1L, 2L)))
    assert(r.getAs[Long]("n_shared") === 1L)
    // dot counts ONLY the index-eligible term, norms the full vector:
    // w(rare)=1/2, w(common)=1/12; dot=0.25, norm²=0.25+1/144
    val n2 = 0.25 + 1.0 / 144.0
    val expected = 0.25 / n2 // both norms equal
    assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-12)
    // identical all-rare docs under no cap pressure score exactly 1
    val twins = Seq((1L, "uniq twin"), (2L, "uniq twin")).toDF("doc_id", "text")
    val c = Dedup.weightedCosinePairs(twins, maxTermDf = 10)
      .collect().head.getAs[Double]("cosine")
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("hammingNearDups generalizes the banding to arbitrary 64-bit signatures") {
    // planted signatures; every pairwise distance hand-derivable:
    //   s2 = base ^ bit0; s3 = base ^ bits{0,1,2};
    //   s4 = base ^ bits{0,16,32,48} (one per chunk); s5 = base ^ bits{16,32}
    // kept (<= 3): (1,2)=1 (1,3)=3 (1,5)=2 (2,3)=2 (2,4)=3 (2,5)=3 (4,5)=2
    // excluded: (1,4)=4 (3,4)=5 (3,5)=5 — and for (1,4) NO chunk
    // matches (one flipped bit in each), so banding itself drops it,
    // agreeing with the hamming filter (the pigeonhole boundary case).
    val base = 0x0123456789ABCDEFL
    val sigs = Seq(
      (1L, base),
      (2L, base ^ 0x1L),
      (3L, base ^ 0x7L),
      (4L, base ^ 0x0001000100010001L),
      (5L, base ^ 0x0000000100010000L))
      .toDF("item_id", "sig")
    val pairs = Dedup.hammingNearDups(sigs, maxHamming = 3,
      sigCol = "sig", idCol = "item_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs === Map(
      (1L, 2L) -> 1, (1L, 3L) -> 3, (1L, 5L) -> 2, (2L, 3L) -> 2,
      (2L, 4L) -> 3, (2L, 5L) -> 3, (4L, 5L) -> 2))
  }
}
