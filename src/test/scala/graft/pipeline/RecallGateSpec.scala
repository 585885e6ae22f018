package graft.pipeline

import graft.SparkSpec

/** Recall gates for the rows-only near-dup operators.
  *
  * The driver's oracle can only count rows for LSH outputs (signatures
  * are engine-specific), so a banding bug that silently collapses
  * recall — wrong band width, off-by-one into the signature array,
  * hashing the wrong columns — would never fail a gate. These specs
  * close that hole:
  *
  *  - MinHash+LSH: recall >= 90% of the EXACT jaccardPairs set on a
  *    corpus of non-identical near-dups (identical docs have identical
  *    signatures and collide under any deterministic banding, buggy or
  *    not — only mutated pairs exercise the probabilistic path).
  *  - SimHash: the 16-bit-chunk pigeonhole banding is COMPLETE for
  *    hamming <= 3, so the operator must EQUAL a driver-side
  *    brute-force over all signature pairs, including pairs at
  *    hamming 1..3 (hamming-0 pairs collide under any banding).
  *
  * The corpus is fully deterministic (no RNG): 20 disjoint-vocabulary
  * base docs of 28 tokens, each with two 1-token mutants. A 1-token
  * edit flips <= 3 of the 26 trigrams -> pairwise jaccard ~0.79-0.84,
  * safely above the 0.7 threshold and squarely in the range where
  * 8-band/2-row LSH has ~0.999 collision probability per pair.
  */
class RecallGateSpec extends SparkSpec {

  import spark.implicits._

  // base b: tokens w<b>_0 .. w<b>_27 (no vocab shared across bases);
  // mutants substitute one deterministic interior position each
  private def corpus = {
    val rows = (0 until 20).flatMap { b =>
      val base = (0 until 28).map(k => s"w${b}_$k").toArray
      def mutate(pos: Int, tag: String) = {
        val m = base.clone(); m(pos) = s"x${b}$tag"; m.mkString(" ")
      }
      val p1 = 2 + (b * 3) % 24
      val p2 = 2 + (b * 5 + 7) % 24
      Seq(
        (b * 10L, base.mkString(" ")),
        (b * 10L + 1, mutate(p1, "a")),
        (b * 10L + 2, mutate(if (p2 == p1) (p1 + 5) % 24 + 2 else p2, "b")))
    }
    rows.toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  test("minhash LSH recall >= 90% of exact jaccardPairs on non-identical near-dups") {
    val exact = pairSet(
      Dedup.jaccardPairs(Dedup.wordShingles(corpus, n = 3), threshold = 0.7,
        maxShingleDf = 1000))
    // the gate must be exercised by the probabilistic path: a healthy
    // population of non-identical pairs (3 per base triple at most)
    assert(exact.size >= 20, s"corpus produced only ${exact.size} exact pairs")

    val lsh = pairSet(
      Dedup.minHashNearDups(corpus, threshold = 0.7, n = 3,
        numHashes = 16, rowsPerBand = 2))
    // soundness: LSH output is exact-verified, so it can never exceed
    // the exact set
    assert(lsh.subsetOf(exact), s"unsound pairs: ${lsh.diff(exact)}")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9,
      s"LSH recall collapsed: ${lsh.size}/${exact.size} = $recall")
  }

  test("simhash chunk banding is COMPLETE for hamming <= 3 (matches brute force)") {
    val sigs = Dedup.simHashSignatures(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .sortBy(_._1)
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield (sigs(i)._1, sigs(j)._1, h.toLong)).toSet

    // the corpus must exercise the banding beyond trivial collisions:
    // hamming-0 pairs (identical signatures) collide under ANY chunk
    // width — only 1..3 pairs prove the pigeonhole is intact
    assert(brute.exists { case (_, _, h) => h >= 1 && h <= 3 },
      "corpus has no pairs at hamming 1..3; gate would be vacuous")

    val op = Dedup.simHashNearDups(corpus, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(op === brute,
      s"missing=${brute.diff(op)} spurious=${op.diff(brute)}")
  }
}
