package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.hardNegatives]] — label-aware mining: negatives never
  * share the query label, same-label rows never consume rank slots,
  * the false-negative ceiling excludes suspected mislabels, and the
  * LSH-pruned path returns exact-cosine subsets of the brute path.
  */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // label 0 around +x, label 1 around +y, one mislabeled twin of the
  // query (id 99: query's vector but label 1 — a labeling error)
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.98f, 0.05f, 0.0f), 0), // same label: never a negative
    (2L, Array(0.8f, 0.6f, 0.0f), 1),
    (3L, Array(0.5f, 0.86f, 0.0f), 1),
    (4L, Array(0.0f, 1.0f, 0.0f), 1),
    (99L, Array(1.0f, 0.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  private def queries = emb.where(col("vec_id") === 0L)
    .select(col("vec_id").as("query_id"),
      col("embedding").as("query_vec"), col("label").as("query_label"))

  test("negatives differ in label; same-label rows never take rank slots") {
    val got = Similarity.hardNegatives(emb, queries, k = 3)
      .orderBy("rank").collect()
    assert(got.forall(_.getAs[Int]("label") == 1))
    // id 1 (same label, cosine ~0.999) is absent; ranks are the
    // different-label rows by descending cosine: 99 (1.0), 2, 3
    assert(got.map(_.getAs[Long]("vec_id")).toSeq === Seq(99L, 2L, 3L))
    assert(got.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("maxCos excludes the mislabeled near-duplicate") {
    val got = Similarity.hardNegatives(emb, queries, k = 3, maxCos = 0.95)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 3L, 4L))
  }

  test("LSH path: exact cosines, subset of brute candidates; full probes == brute") {
    val brute = Similarity.hardNegatives(emb, queries, k = 4, maxCos = 0.95)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    val bits = 3
    val pruned = Similarity.hardNegatives(emb, queries, k = 4, maxCos = 0.95,
      bits = Some(bits)).collect()
    pruned.foreach { r =>
      val exact = brute(r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("cosine") - exact) < 1e-12)
    }
    // probing every bucket (1 + bits one-bit flips covers all at this
    // tiny corpus spread) recovers at least as much as single-probe
    val full = Similarity.hardNegatives(emb, queries, k = 4, maxCos = 0.95,
      bits = Some(bits), probes = 1 + bits).collect()
    assert(full.length >= pruned.length)
  }

  test("contrastivePairs: hardest positive is the LEAST similar same-label row") {
    // exclude the mislabeled twin via the ceiling; label-0 positives
    // for query 0 are id 1 only -> pos_id 1; negatives by desc cosine
    val rows = Similarity.contrastivePairs(emb, queries, kNeg = 2,
      maxCos = 0.95).orderBy("neg_rank").collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Long]("pos_id") == 1L))
    assert(rows.map(_.getAs[Long]("neg_id")).toSeq === Seq(2L, 3L))
    assert(rows.map(_.getAs[Int]("neg_rank")).toSeq === Seq(1, 2))
    // with two same-label candidates the FARTHER one is the positive
    val emb2 = emb.unionByName(
      Seq((5L, Array(0.9f, 0.44f, 0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val pos2 = Similarity.contrastivePairs(emb2, queries, kNeg = 1,
      maxCos = 0.95).collect().head
    assert(pos2.getAs[Long]("pos_id") === 5L,
      "hardest positive must be the least similar same-label vector")
  }

  test("contrastivePairs: anchors without a qualifying side drop whole") {
    // query with a singleton label: no positive exists -> no rows
    val lonely = emb.unionByName(
      Seq((50L, Array(0.0f, 0.0f, 1.0f), 7)).toDF("vec_id", "embedding", "label"))
    val qs = lonely.where(col("vec_id") === 50L)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))
    assert(Similarity.contrastivePairs(lonely, qs, kNeg = 3).count() === 0L)
  }

  test("zero-norm vectors are never mined, even when finite negatives run short") {
    // corpus: ONE finite different-label row + a malformed zero-norm
    // row; k = 3 > finite supply, so the DESC rank alone would let
    // the -Infinity sentinel claim a slot
    val sparse = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.43f, 0.0f), 1),
      (66L, Array(0.0f, 0.0f, 0.0f), 1)) // zero norm -> -Inf cosine
      .toDF("vec_id", "embedding", "label")
    val qs = sparse.where(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"), col("label").as("query_label"))

    val negs = Similarity.hardNegatives(sparse, qs, k = 3).collect()
    assert(negs.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L),
      s"malformed vector mined as hard negative: ${negs.mkString(",")}")

    val pairs = Similarity.contrastivePairs(
      sparse.unionByName( // a positive so the anchor survives
        Seq((2L, Array(0.95f, 0.31f, 0.0f), 0)).toDF("vec_id", "embedding", "label")),
      qs, kNeg = 3).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Long]("neg_id") == 1L),
      s"malformed vector exported as training negative: ${pairs.mkString(",")}")
    assert(pairs.forall(r =>
      !r.getAs[Double]("neg_cosine").isNegInfinity &&
        !r.getAs[Double]("pos_cosine").isNegInfinity))
  }
}
