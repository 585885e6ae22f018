package graft.pipeline

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite
    (4L, Array(0.5f, 0.5f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK: exact ranking, query excluded") {
    val top = Similarity.bruteForceTopK(emb, queryId = 0L, k = 3).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 4L, 2L))
    assert(math.abs(top.head.getAs[Double]("cosine") -
      (0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1))) < 1e-6)
  }

  test("embeddingNearDups: high-cosine pair survives its shared bucket") {
    // identical vectors always share every LSH bucket and have cosine 1
    val dup = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(dup, threshold = 0.99, bits = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("ivfTopK: probing ALL cells recovers the exact brute-force top-k") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val ivf = Similarity.ivfTopK(emb, 0L, 3, nlist = 2, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(ivf === brute)
  }

  test("ivfTopK: nprobe < nlist returns a subset with exact cosines") {
    // two well-separated clusters of 20 so the query's probed cell is
    // populated no matter which rows the centroid sample picks
    val qVec = Array(1.0f, 0.01f, 0.02f)
    val clustered = ((1L until 40L).map { i =>
      val base = if (i < 20) Array(1.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f)
      (i, base.zipWithIndex.map { case (v, d) => v + 0.01f * ((i + d) % 5) })
    } :+ (0L -> qVec)
      // 999 = exact duplicate of the query vector: it assigns to the
      // query's own cell whatever the centroid sample is, so the
      // probed result can never be empty
      :+ (999L -> qVec.clone()))
      .toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(clustered, 0L, 10).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val ivf = Similarity.ivfTopK(clustered, 0L, 10, nlist = 2, nprobe = 1).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(math.abs(r.getAs[Double]("cosine") - brute(r.getAs[Long]("vec_id"))) < 1e-12)
    }
  }

  test("kmeansCentroids: separates well-separated clusters; refined IVF stays exact") {
    // two tight orthogonal clusters; sampled seeds may both come from
    // one cluster, k-means must pull one centroid to each
    val clustered = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f) else Array(0.0f, 1.0f, 0.0f)
      (i, base.map(v => v + 0.01f * (i % 5)))
    }.toDF("vec_id", "embedding")
    val cs = Similarity.kmeansCentroids(clustered, nlist = 2, iters = 4)
    assert(cs.length === 2)
    // each centroid should be dominated by a different axis
    val axes = cs.map { case (_, c) => c.indexOf(c.max) }.toSet
    assert(axes === Set(0, 1), s"centroids collapsed: ${cs.map(_._2.toSeq).toSeq}")

    // refined IVF probing all cells is still exact w.r.t. brute force
    val brute = Similarity.bruteForceTopK(clustered, 0L, 5).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    val ivf = Similarity.ivfTopK(clustered, 0L, 5, nlist = 2, nprobe = 2,
      refineIters = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
    assert(ivf === brute)
  }

  test("assignCells: broadcast-data path matches inline-literal assignments exactly") {
    // the edge cases that could diverge between the two shapes: a
    // zero-norm corpus vector, a malformed (short) vector, a corpus
    // vector exactly equal to a DUPLICATED centroid (tie-break), and
    // a degenerate all-zero centroid
    val cvecs = Array.tabulate(5)(i =>
      Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat))
    val centroids: Array[(Long, Array[Float])] =
      cvecs.zipWithIndex.map { case (c, i) => i.toLong -> c } ++
        Array(99L -> Array.fill(8)(0.0f), // degenerate centroid
          100L -> cvecs(3).clone()) // duplicate of cid 3 — larger cid must win
    val rows = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 3 + d).toFloat))
    } ++ cvecs.zipWithIndex.map { case (c, i) => (50L + i, c.clone()) } ++
      Seq((60L, Array.fill(8)(0.0f)), (61L, Array(1.0f, 2.0f)))
    val df = rows.toDF("vec_id", "embedding")
    def cells(inlineLimit: Long) =
      Similarity.assignCells(df, centroids, "embedding",
          inlineLimit = inlineLimit)
        .select($"vec_id", $"__cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inline = cells(Long.MaxValue)
    val bcast = cells(0L)
    assert(inline === bcast)
    // the duplicated-centroid row ties (3, 100) and must pick 100 in
    // BOTH shapes (array_max prefers the larger cid at equal score)
    assert(inline(53L) === 100L)
    assert(bcast(53L) === 100L)
    // a malformed row scores NULL against every real centroid and
    // -Inf against the degenerate one: quarantine cell 99, not a crash
    assert(inline(61L) === 99L)
  }

  test("vec_dot is callable from SQL (extensions registration)") {
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("multi-probe lshTopK: superset of single-probe, exact cosines, bounds enforced") {
    val single = Similarity.lshTopK(emb, 0L, 4, bits = 2).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val multi = Similarity.lshTopK(emb, 0L, 4, bits = 2, probes = 3).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    // probing more buckets can only add candidates
    assert(single.subsetOf(multi.keySet))
    val brute = Similarity.bruteForceTopK(emb, 0L, 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    multi.foreach { case (id, c) => assert(math.abs(c - brute(id)) < 1e-12) }
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, 0L, 4, bits = 2, probes = 4)
    }
  }

  test("embeddingNearDups: adversarial all-zero corpus is bounded by the bucket cap") {
    // a broken encoder emitting all-zero vectors: every zero vector
    // projects to 0 on every hyperplane -> one shared bucket. Without
    // the cap that bucket is an all-pairs join (n^2/2 at corpus
    // scale); with maxBucketSize below its population the bucket is
    // excluded and the output stays bounded.
    // (-1,-2,-3) projects positive on plane 0 -> bucket 1, away from
    // the zero vectors' bucket 0 (computed from the md5 planes)
    val broken = (0L until 50L).map(i => (i, Array.fill(3)(0.0f))) :+
      (100L, Array(-1.0f, -2.0f, -3.0f)) :+ (101L, Array(-1.0f, -2.0f, -3.0f))
    val df = broken.toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, threshold = -1.0, bits = 4,
      maxBucketSize = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the 50-member zero bucket (> cap 10) contributes no pairs; the
    // 2-member duplicate bucket survives
    assert(pairs === Set((100L, 101L)))
    // and the drop is observable
    val dropped = Similarity.overflowBuckets(df, bits = 4, maxBucketSize = 10)
      .collect()
    assert(dropped.exists(_.getAs[Long]("population") === 50L))
  }

  test("embeddingNearDups/lshTopK: malformed vectors quarantine instead of pairing") {
    // corpus dim = 3 (max); two truncated and one empty vector would
    // all share bit-0 buckets under a default-bucket rule — with
    // quarantine they never pair, and well-formed pairing is intact
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(9.0f)), (3L, Array(9.0f)), (4L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, threshold = -1.0, bits = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((0L, 1L)))
    // quarantined population is reported under the NULL bucket
    val quarantined = Similarity.overflowBuckets(df, bits = 4).collect()
      .filter(_.isNullAt(0)).map(_.getAs[Long]("population"))
    assert(quarantined.toSeq === Seq(3L))
    // a malformed QUERY returns no candidates rather than a wrong bucket's
    assert(Similarity.lshTopK(df, 2L, 4, bits = 2).collect().isEmpty)
  }

  test("one OVER-length corrupt vector quarantines itself, not the corpus") {
    // dim = the MODAL length: with max() a single 5-element row would
    // flip the corpus dim to 5 and quarantine every well-formed
    // 3-dim vector, silently emptying the output
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 1.0f, -2.0f)),
      (9L, Array(9.0f, 9.0f, 9.0f, 9.0f, 9.0f))) // corrupt: too long
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(df, threshold = 0.99, bits = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs === Set((0L, 1L)))
    val quarantined = Similarity.overflowBuckets(df, bits = 4).collect()
      .filter(_.isNullAt(0)).map(_.getAs[Long]("population"))
    assert(quarantined.toSeq === Seq(1L))
  }

  test("ivfTopK: missing query id returns empty like the other ANN entry points") {
    assert(Similarity.ivfTopK(emb, queryId = 424242L, k = 3, nlist = 2, nprobe = 2)
      .collect().isEmpty)
    assert(Similarity.bruteForceTopK(emb, 424242L, 3).collect().isEmpty)
    assert(Similarity.lshTopK(emb, 424242L, 3, bits = 2).collect().isEmpty)
  }

  test("ivfTopK: an all-zero sampled centroid does not swallow the corpus") {
    // a zero-norm centroid scores NaN without the guard, and NaN ranks
    // GREATEST in Spark ordering — every row would assign to the
    // degenerate cell while the probe ranked it last, returning empty
    val withZero = ((1L until 20L).map { i =>
      (i, Array(1.0f + 0.01f * i, 0.1f * (i % 3), 0.0f))
    } :+ (0L, Array(1.0f, 0.0f, 0.0f)) :+ (999L, Array.fill(3)(0.0f)))
      .toDF("vec_id", "embedding")
    // force the zero vector into the centroid sample: nlist >= corpus
    // stride keeps every md5-selected id, so try a few nlists until
    // 999 is sampled — with nlist=21 stride=1, ALL ids are centroids
    val centroids = Similarity.sampleCentroids(withZero, nlist = 21)
    assert(centroids.exists(_._2.forall(_ == 0.0f)), "zero centroid not sampled")
    val got = Similarity.ivfTopKWith(withZero, centroids, queryId = 0L,
      k = 5, nprobe = 21).collect()
    assert(got.nonEmpty, "degenerate centroid emptied the result")
    val brute = Similarity.bruteForceTopK(withZero, 0L, 5).collect()
      .map(r => r.getAs[Long]("vec_id")).toSeq
    // probing every cell recovers brute force despite the zero centroid
    assert(got.map(_.getAs[Long]("vec_id")).toSeq === brute)
  }

  test("embeddingNearDups: recall vs brute-force pairs on a clustered corpus") {
    // three tight clusters of 6 + scattered singletons; every
    // same-cluster pair has cosine ~1 — single-table sign-LSH with few
    // bits must still recover most of them (same-cluster vectors
    // project to the same side of nearly every hyperplane)
    val rows = (0 until 3).flatMap { c =>
      val base = Array.tabulate(8)(d => if (d == c) 1.0f else 0.05f)
      (0 until 6).map { j =>
        (c * 10L + j, base.map(v => v + 0.001f * j))
      }
    } ++ (0 until 5).map { j =>
      (100L + j, Array.tabulate(8)(d => if (d == (j + 3) % 8) 1.0f else -0.3f * ((j + d) % 3)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val ids = rows.map(_._1)
    val brute = (for {
      a <- ids; b <- ids if a < b
    } yield (a, b)).filter { case (a, b) =>
      val va = rows.find(_._1 == a).get._2; val vb = rows.find(_._1 == b).get._2
      val d = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(va.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(vb.map(x => x.toDouble * x).sum)
      d / (na * nb) >= 0.95
    }.toSet
    assert(brute.size >= 45) // 3 clusters x C(6,2)=15
    val got = Similarity.embeddingNearDups(df, threshold = 0.95, bits = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // every reported pair is a true near-dup (cosine verified in-plan)
    assert(got.subsetOf(brute))
    val recall = got.size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall: ${got.size}/${brute.size} pairs")
  }

  test("lshTopK: results are a subset of brute-force ordering semantics") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val ann = Similarity.lshTopK(emb, 0L, 4, bits = 2).collect()
    // every ANN hit must carry the exact cosine the brute-force path computes
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("cosine") - brute(id)) < 1e-12)
    }
  }
}
