package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizationSpec extends SparkSpec {

  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("codes span [0,255] with endpoints exact and monotone interior") {
    val df = emb(
      (0L, Seq(0f, -1f)), (1L, Seq(0.5f, 0f)), (2L, Seq(1f, 3f)))
    val q = Quantization.quantized(df)
      .select($"vec_id", $"qvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim0 range [0,1]: 0 -> 0, 0.5 -> 128 (floor(127.5+0.5)), 1 -> 255
    assert(q(0L)(0) === 0)
    assert(q(1L)(0) === 128)
    assert(q(2L)(0) === 255)
    // dim1 range [-1,3]: -1 -> 0, 0 -> 64 (255/4 = 63.75 -> floor(64.25)), 3 -> 255
    assert(q(0L)(1) === 0)
    assert(q(1L)(1) === 64)
    assert(q(2L)(1) === 255)
  }

  test("degenerate constant dimension quantizes to 0") {
    val df = emb((0L, Seq(7f, 1f)), (1L, Seq(7f, 2f)))
    val q = Quantization.quantized(df)
      .select($"qvec").collect().map(_.getSeq[Int](0))
    assert(q.forall(_.head === 0))
  }

  test("dequantization error is bounded by half a step per dim") {
    val df = emb((0L, Seq(0.13f, -0.7f)), (1L, Seq(0.87f, 0.2f)),
      (2L, Seq(0.41f, 0.9f)), (3L, Seq(-0.3f, 0.05f)))
    val ranges = Quantization.dimRanges(df).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val qs = Quantization.quantized(df).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getSeq[Int](2)))
    qs.foreach { case (_, vec, qvec) =>
      vec.zip(qvec).zipWithIndex.foreach { case ((v, code), d) =>
        val (lo, hi) = ranges(d)
        val step = (hi - lo) / 255.0
        val deq = lo + code * step
        assert(math.abs(deq - v.toDouble) <= step / 2 + 1e-12,
          s"dim $d v=$v code=$code")
      }
    }
  }

  test("quantized top-k ranks like brute force on separated clusters") {
    // 3 tight clusters in 4d; query in cluster A must rank the other
    // A members first under the quantized integer dot
    def jitter(base: Seq[Float], eps: Float) = base.map(_ + eps)
    val a = Seq(10f, 0f, 0f, 0f); val b = Seq(0f, 10f, 0f, 0f); val c = Seq(0f, 0f, 10f, 0f)
    val df = emb(
      (0L, a), (1L, jitter(a, 0.1f)), (2L, jitter(a, -0.1f)),
      (3L, b), (4L, jitter(b, 0.2f)),
      (5L, c), (6L, jitter(c, 0.2f)))
    val top = Quantization.quantizedTopK(df, queryId = 0L, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(top === Set(1L, 2L))
  }

  test("qscore is an exact integer and ties break by vec_id") {
    val df = emb((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)),
      (3L, Seq(0f, 1f)))
    val rows = Quantization.quantizedTopK(df, queryId = 0L, k = 3).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).getLong(1) === rows(1).getLong(1))
  }

  // ---- PQ

  private val pqDim = 8

  /** 4 tight clusters x 8 members at dim 8 (divisible by m=2 and
    * m=4): a PQ query's ADC ranking should surface cluster-mates.
    */
  private def pqCorpus = {
    val rows = for (c <- 0 until 4; mm <- 0 until 8) yield
      (c * 10L + mm, EmbeddingFixture.member("pq", pqDim, 0.03f)(c, mm))
    rows.toDF("vec_id", "embedding")
  }

  test("pqCodes: codes are codebook ids, deterministic across partitionings") {
    val codebook = Similarity.sampleCentroids(pqCorpus, 8)
    val cids = codebook.map(_._1).toSet
    val a = Quantization.pqCodes(pqCorpus, codebook, m = 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(a.size === 32)
    a.values.foreach { codes =>
      assert(codes.length === 4)
      codes.foreach(c => assert(cids.contains(c)))
    }
    val b = Quantization.pqCodes(pqCorpus.repartition(7), codebook, m = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(a === b)
    intercept[IllegalArgumentException](
      Quantization.pqCodes(pqCorpus, codebook, m = 3)) // 8 % 3 != 0
  }

  test("pqTopK: ADC ranking surfaces the query's cluster-mates") {
    // query 0 belongs to cluster 0 (members 0..7); with tight jitter
    // the 7 nearest under ADC must be exactly its cluster-mates
    val top = Quantization.pqTopK(pqCorpus, queryId = 0L, k = 7, m = 4, ksub = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(top === (1L to 7L).toSet)
  }

  test("pqTopK: m=1 single subspace equals full-vector codeword scoring; missing query is empty") {
    // with m=1 the ADC score of candidate v is dot(q, codeword(v)) —
    // every member of a tight cluster scores (near-)identically; the
    // ranking must still be complete, deterministic, and well-formed
    val rows = Quantization.pqTopK(pqCorpus, queryId = 0L, k = 31, m = 1, ksub = 8)
      .collect()
    val allIds = (for (c <- 0 until 4; mm <- 0 until 8) yield c * 10L + mm).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === allIds - 0L)
    val empty = Quantization.pqTopK(pqCorpus, queryId = 999L, k = 5)
    assert(empty.count() === 0L)
  }

  test("ivfQuantizedTopK: probing every cell recovers quantizedTopK; codes stay corpus-calibrated") {
    val full = Quantization.quantizedTopK(pqCorpus, queryId = 0L, k = 7)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("qscore"))).toSeq
    val all = Quantization.ivfQuantizedTopK(pqCorpus, queryId = 0L, k = 7,
      nlist = 8, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("qscore"))).toSeq
    assert(all === full)
    // narrow probe: a subset of candidates, with IDENTICAL integer
    // scores (quantization ranges come from the whole corpus, not the
    // probed subset — a probe-calibrated code would change scores)
    val fullScores = Quantization.quantizedTopK(pqCorpus, queryId = 0L, k = 31)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("qscore")).toMap
    val narrow = Quantization.ivfQuantizedTopK(pqCorpus, queryId = 0L, k = 7,
      nlist = 8, nprobe = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("qscore")).toMap
    narrow.foreach { case (id, sc) => assert(sc === fullScores(id), s"id $id") }
    assert(Quantization.ivfQuantizedTopK(pqCorpus, queryId = 999L, k = 5).count() === 0L)
  }

  test("ivfPqTopK: probing every cell recovers pqTopK exactly; narrow probe is a subset") {
    val full = Quantization.pqTopK(pqCorpus, queryId = 0L, k = 7, m = 4, ksub = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("qscore"))).toSeq
    val all = Quantization.ivfPqTopK(pqCorpus, queryId = 0L, k = 7,
      nlist = 8, nprobe = 8, m = 4, ksub = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("qscore"))).toSeq
    assert(all === full)
    // narrow probing returns candidates only from probed cells, with
    // the SAME ADC scores for whatever it does return
    val narrow = Quantization.ivfPqTopK(pqCorpus, queryId = 0L, k = 7,
      nlist = 8, nprobe = 2, m = 4, ksub = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("qscore")).toMap
    val fullScores = Quantization.pqTopK(pqCorpus, queryId = 0L, k = 31, m = 4, ksub = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("qscore")).toMap
    narrow.foreach { case (id, score) => assert(score === fullScores(id), s"id $id") }
    val emptyQ = Quantization.ivfPqTopK(pqCorpus, queryId = 999L, k = 5)
    assert(emptyQ.count() === 0L)
  }

  test("rerank paths: a corpus-wide shortlist recovers exact brute-force cosine top-k") {
    // shortlist >= corpus (and for IVF: probe every cell) makes the
    // ADC stage a pure pass-through — the rerank MUST then equal the
    // exact-cosine ranking, tie-breaks included. This pins the rerank
    // arithmetic/tie-breaks; the recall value of narrow shortlists is
    // pinned separately by RecallGateSpec's coverage floors.
    val exact = Similarity.bruteForceTopK(pqCorpus, queryId = 0L, k = 7)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val pq = Quantization.pqRerankTopK(pqCorpus, queryId = 0L, k = 7,
      shortlist = 64, m = 4, ksub = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(pq === exact)
    val ivfpq = Quantization.ivfPqRerankTopK(pqCorpus, queryId = 0L, k = 7,
      shortlist = 64, nlist = 8, nprobe = 8, m = 4, ksub = 8)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(ivfpq === exact)
    // narrow shortlist: results are a subset of the shortlist with
    // exact cosines (never ADC approximations)
    val narrow = Quantization.ivfPqRerankTopK(pqCorpus, queryId = 0L, k = 3,
      shortlist = 8, nlist = 8, nprobe = 2, m = 4, ksub = 8)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val exactAll = Similarity.bruteForceTopK(pqCorpus, queryId = 0L, k = 31)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    narrow.foreach { case (id, c) => assert(c === exactAll(id), s"id $id") }
  }

  test("dimRobustProfile: exact quartiles per dim; outliers cannot move them") {
    // dim0: values 1..5 -> p25=2, p50=3, p75=4, iqr=2; dim1 constant
    val df = emb(
      (0L, Seq(1f, 7f)), (1L, Seq(2f, 7f)), (2L, Seq(3f, 7f)),
      (3L, Seq(4f, 7f)), (4L, Seq(5f, 7f)))
    val prof = Quantization.dimRobustProfile(df).collect()
      .map(r => r.getInt(0) -> (r.getFloat(1), r.getFloat(2), r.getFloat(3),
        r.getAs[Double]("iqr"))).toMap
    assert(prof(0) === ((2f, 3f, 4f, 2.0)))
    assert(prof(1) === ((7f, 7f, 7f, 0.0)))

    // one corrupted vector: min/max calibration explodes, the robust
    // profile moves by at most one rank step
    val poisoned = df.unionByName(emb((5L, Seq(1e30f, 7f))))
    val p2 = Quantization.dimRobustProfile(poisoned).collect()
      .map(r => r.getInt(0) -> (r.getFloat(1), r.getFloat(2), r.getFloat(3))).toMap
    assert(p2(0) === ((2f, 3f, 4f)))
    val hi = Quantization.dimRanges(poisoned).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(hi(0) > 1e29, "ranges DO explode — that is the contrast")
  }

  test("robustScale: (v - median)/iqr; zero-IQR dims pass 0") {
    val df = emb(
      (0L, Seq(1f, 7f)), (1L, Seq(2f, 7f)), (2L, Seq(3f, 7f)),
      (3L, Seq(4f, 7f)), (4L, Seq(5f, 7f)))
    val prof = Quantization.dimRobustProfile(df)
    val scaled = Quantization.robustScale(df, prof).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // dim0: median 3, iqr 2 -> 1f scales to -1, 5f to +1
    assert(scaled(0L)(0) === -1f)
    assert(scaled(4L)(0) === 1f)
    assert(scaled(2L)(0) === 0f)
    // constant dim: no information -> 0, never a division blowup
    assert(scaled.values.forall(_(1) === 0f))
  }
}
