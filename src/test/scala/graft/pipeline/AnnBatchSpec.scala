package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batched ANN search + recall evaluation
  * ([[Similarity.bruteSearchAll]], [[Similarity.ivfSearchAll]],
  * [[Similarity.ivfRecallAtK]]): the batch paths must agree exactly
  * with their audited point-lookup twins, and the recall harness must
  * report 1.0 precisely when probing everything.
  */
class AnnBatchSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 8

  /** 4 tight md5-random clusters x 10 members: every vector's true
    * neighbors are its cluster-mates.
    */
  private def corpus = {
    val rows = for (c <- 0 until 4; m <- 0 until 10) yield
      (c * 10L + m, EmbeddingFixture.member("ann", dim, 0.05f)(c, m))
    rows.toDF("vec_id", "embedding")
  }

  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  test("bruteSearchAll agrees with per-query bruteForceTopK") {
    val emb = corpus
    val qs = queriesOf(emb)
    val batch = Similarity.bruteSearchAll(emb, qs, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq)
      .toMap
    val qids = qs.select("query_id").as[Long].collect()
    assert(batch.keySet === qids.toSet)
    qids.foreach { qid =>
      val point = Similarity.bruteForceTopK(emb, qid, 5).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      assert(batch(qid) === point, s"query $qid")
    }
  }

  test("ivfSearchAll agrees with per-query ivfTopKWith on shared centroids") {
    val emb = corpus
    val qs = queriesOf(emb)
    val centroids = Similarity.sampleCentroids(emb, nlist = 4)
    val batch = Similarity.ivfSearchAll(emb, qs, centroids, k = 5, nprobe = 2)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq)
      .toMap
    qs.select("query_id").as[Long].collect().foreach { qid =>
      val point = Similarity.ivfTopKWith(emb, centroids, qid, 5, nprobe = 2)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      assert(batch(qid) === point, s"query $qid")
    }
  }

  test("ivfRecallAtK: probing every cell reports recall 1.0 for every query") {
    val emb = corpus
    val qs = queriesOf(emb)
    val centroids = Similarity.sampleCentroids(emb, nlist = 4)
    val recall = Similarity.ivfRecallAtK(emb, qs, centroids, k = 5, nprobe = 4)
      .collect()
    assert(recall.nonEmpty)
    recall.foreach { r =>
      assert(r.getAs[Long]("n_hits") === 5L, s"query ${r.getAs[Long]("query_id")}")
      assert(r.getAs[Double]("recall") === 1.0)
    }
  }

  test("lshSearchAll agrees with per-query lshTopK; multi-probe is a superset") {
    val emb = corpus
    val qs = queriesOf(emb)
    val batch = Similarity.lshSearchAll(emb, qs, k = 5, bits = 3,
      dim = Some(dim))
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq)
      .toMap
    qs.select("query_id").as[Long].collect().foreach { qid =>
      val point = Similarity.lshTopK(emb, qid, 5, bits = 3, dim = Some(dim))
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSeq
      assert(batch.getOrElse(qid, Seq.empty) === point, s"query $qid")
    }
    // multi-probe returns at least the single-probe candidates per query
    val multi = Similarity.lshSearchAll(emb, qs, k = 40, bits = 3,
      probes = 4, dim = Some(dim))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val single = Similarity.lshSearchAll(emb, qs, k = 40, bits = 3,
      dim = Some(dim))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(single.subsetOf(multi))
  }

  test("ivfRecallAtK: narrow probing degrades recall but stays bounded and exact") {
    val emb = corpus
    val qs = queriesOf(emb)
    val centroids = Similarity.sampleCentroids(emb, nlist = 8)
    val rows = Similarity.ivfRecallAtK(emb, qs, centroids, k = 5, nprobe = 1)
      .collect()
    // every query reports, recall in [0,1], and recall == n_hits/k exactly
    assert(rows.map(_.getAs[Long]("query_id")).toSet ===
      qs.select("query_id").as[Long].collect().toSet)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= 5L)
      assert(r.getAs[Double]("recall") === hits / 5.0)
    }
  }
}
