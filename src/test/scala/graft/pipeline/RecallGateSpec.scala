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

  // ---- ANN recall gates (p11 / p13 defaults) -------------------------
  //
  // SimilaritySpec proves probe-ALL == brute force, but nothing there
  // pins recall at the parameters the p11/p13 gates actually run
  // (lshTopK bits=4 single-probe; ivfTopK nlist=16 nprobe=4 sampled
  // centroids). These gates do, on a deterministic clustered corpus:
  // 20 tight clusters of 12 members in 64 dims (md5-derived, no RNG),
  // so the query's true top-10 are its 11 cluster-mates and an ANN
  // path that loses its bucket/cell loses them all at once.

  private val embDim = 64

  // deterministic md5-folded clustered corpus (no RNG) — shared
  // generator, spec-specific seed prefix/dim/jitter
  private def embMember(c: Int, m: Int): Array[Float] =
    EmbeddingFixture.member("rg", embDim, 0.02f)(c, m)

  // ids: cluster c holds c*12 .. c*12+11
  private def embCorpus = (for {
    c <- 0 until 20; m <- 0 until 12
  } yield (c * 12L + m, embMember(c, m)))
    .toDF("vec_id", "embedding")
    .withColumn("embedding",
      org.apache.spark.sql.functions.col("embedding").cast("array<float>"))

  private def idsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getAs[Long]("vec_id")).toSeq

  private def recallAt10(got: Seq[Long], truth: Seq[Long]): Double =
    got.toSet.intersect(truth.toSet).size.toDouble / truth.size

  test("sign-LSH top-k recall@10 >= 0.9 at the p11 gate defaults (bits=4, single probe)") {
    val emb = embCorpus
    val truth = idsOf(Similarity.bruteForceTopK(emb, queryId = 0L, k = 10))
    val lsh = idsOf(Similarity.lshTopK(emb, queryId = 0L, k = 10, bits = 4,
      dim = Some(embDim)))
    assert(recallAt10(lsh, truth) >= 0.9,
      s"LSH recall@10 collapsed at gate defaults: got=$lsh truth=$truth")

    // injected bug — an off-by-one banding defect: candidates read
    // from the bucket at (true bucket XOR 1) instead of the query's
    // own. Built from the PUBLIC lshBucket so the same projection
    // code paths run; only the bucket equality is wrong. The gate
    // must be able to see this class of failure.
    import org.apache.spark.sql.functions._
    val bucketed = emb.withColumn("__bucket",
      Similarity.lshBucket(col("embedding"), bits = 4, dim = embDim))
    val qRow = bucketed.where(col("vec_id") === 0L)
      .select(col("embedding"), col("__bucket")).collect().head
    val qVec = qRow.getSeq[Float](0).toArray
    val shiftedBucket = qRow.getLong(1) ^ 1L
    val qCol = array(qVec.toSeq.map(lit(_)): _*).cast("array<float>")
    val shifted = idsOf(bucketed
      .where(col("vec_id") =!= 0L && col("__bucket") === shiftedBucket)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), qCol).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(10))
    assert(recallAt10(shifted, truth) < 0.9,
      s"shifted-bucket bug not visible to the gate — it is vacuous: $shifted")
  }

  test("IVF top-k recall@10 >= 0.9 at the p13 gate defaults (nlist=16, nprobe=4)") {
    val emb = embCorpus
    val truth = idsOf(Similarity.bruteForceTopK(emb, queryId = 0L, k = 10))
    val ivf = idsOf(Similarity.ivfTopK(emb, queryId = 0L, k = 10,
      nlist = 16, nprobe = 4))
    assert(recallAt10(ivf, truth) >= 0.9,
      s"IVF recall@10 collapsed at gate defaults: got=$ivf truth=$truth")

    // injected bug — a stale/corrupt centroid ARTIFACT: the index on
    // disk was written under the true centroid list, but the prober
    // holds one whose cid->vector mapping is rotated (the failure
    // mode of versioning centroids separately from the index files).
    // Assignment and probing disagree about the cell geometry, so the
    // probed directories hold the wrong vectors and recall collapses.
    val sampled = Similarity.sampleCentroids(emb, nlist = 16)
    val path = java.nio.file.Files.createTempDirectory("graft-rg-ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, sampled, path)
    val qVec = embMember(0, 0)
    val healthy = idsOf(Similarity.ivfTopKIndexed(spark, path, sampled, qVec,
      k = 10, nprobe = 1)).filterNot(_ == 0L)
    assert(recallAt10(healthy, truth.take(healthy.size)) >= 0.9,
      s"healthy indexed recall broken: $healthy")
    val rotated = sampled.indices.map(i =>
      (sampled(i)._1, sampled((i + 1) % sampled.length)._2)).toArray
    val stale = idsOf(Similarity.ivfTopKIndexed(spark, path, rotated, qVec,
      k = 10, nprobe = 1)).filterNot(_ == 0L)
    assert(recallAt10(stale, truth) < 0.9,
      s"corrupt centroid artifact not visible to the gate — it is vacuous: $stale")
  }

  test("production ANN defaults hold on the clustered reference corpus (recall@10 >= 0.9)") {
    // the geometry the BASELINE.md recall curves justify defaults on:
    // RecallCurve.clusteredCorpus — semantic neighbors concentrate,
    // the shape real embedding models produce. Defaults under test:
    // IVF nlist=64/nprobe=4 (16x candidate pruning) and sign-LSH
    // bits=4/probes=3. Same pinned-query protocol as the sf1 curve.
    import org.apache.spark.sql.functions._
    val emb = graft.RecallCurve.clusteredCorpus(spark, n = 2000, dim = 64,
      clusters = 40)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.where(col("vec_id") % 311 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = Similarity.bruteSearchAll(emb, queries, 10)
      .select(col("query_id"), col("vec_id"))
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      truth
        .join(approx.select(col("query_id"), col("vec_id"),
          lit(1L).as("__hit")), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) / count(lit(1))).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
    val centroids = Similarity.kmeansCentroids(emb, nlist = 64, iters = 2)
    val ivf = meanRecall(
      Similarity.ivfSearchAll(emb, queries, centroids, k = 10, nprobe = 4))
    assert(ivf >= 0.9, s"IVF recall at production defaults collapsed: $ivf")
    val lsh = meanRecall(
      Similarity.lshSearchAll(emb, queries, k = 10, bits = 4, probes = 3,
        dim = Some(64)))
    assert(lsh >= 0.9, s"LSH recall at production defaults collapsed: $lsh")
    emb.unpersist()
  }

  test("quantized paths hold recall on the clustered reference corpus (int8 ~free, PQ bounded)") {
    // the honesty artifact behind the compression knobs: int8 keeps
    // full-precision geometry at 1/4 the bytes (recall ~1), PQ-ADC at
    // m=8/ksub=16 (8 bytes/vector) trades real recall for 32x
    // compression — the spec pins the floor each is sold at. Same
    // corpus/protocol as the production-defaults gate above.
    import org.apache.spark.sql.functions._
    val emb = graft.RecallCurve.clusteredCorpus(spark, n = 2000, dim = 64,
      clusters = 40)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.where(col("vec_id") % 311 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val truth = Similarity.bruteSearchAll(emb, queries, 10)
      .select(col("query_id"), col("vec_id"))
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      truth
        .join(approx.select(col("query_id"), col("vec_id"),
          lit(1L).as("__hit")), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg((sum(coalesce(col("__hit"), lit(0L))) / count(lit(1))).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
    val int8 = meanRecall(Quantization.quantizedSearchAll(emb, queries, 10))
    assert(int8 >= 0.9, s"int8 recall collapsed: $int8")
    // PQ-ADC approximates the INNER PRODUCT — index the normalized
    // corpus (the cosine-deployment recipe; truth is norm-invariant).
    // On clustered geometry PQ resolves at CODE granularity: a whole
    // cluster shares one code vector, ADC scores tie exactly, and
    // recall@10 floors near k / cluster-size (measured 0.21 at 50
    // members) — NOT an approximation bug, the quantization's honest
    // resolution limit. The deployable contract is therefore
    // SHORTLIST COVERAGE: the ADC top-50 must contain (nearly) every
    // true top-10, so the standard ADC-shortlist -> exact-rerank
    // pipeline recovers full recall at 1/40th the float scoring.
    val nemb = Quantization.l2Normalize(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nq = nemb.where(col("vec_id") % 311 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val pq10 = meanRecall(Quantization.pqSearchAll(nemb, nq, 10,
      m = 8, ksub = 16, knownCount = Some(2000L)))
    assert(pq10 >= 0.15, s"PQ m=8/ksub=16 recall@10 below its floor: $pq10")
    val pqShortlist = meanRecall(Quantization.pqSearchAll(nemb, nq, 50,
      m = 8, ksub = 16, knownCount = Some(2000L)))
    assert(pqShortlist >= 0.9,
      s"PQ shortlist-50 lost true neighbors (rerank can't recover): $pqShortlist")
    nemb.unpersist()
    emb.unpersist()
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
