package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Embedding outlier flags ([[Similarity.embeddingOutliers]]):
  * agreement with an independent driver-side nearest-centroid fold,
  * the zero-norm degenerate rule, and cell population joins.
  */
class EmbeddingOutliersSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 8
  private val fixture: Seq[(Long, Array[Float])] = {
    // 3 tight md5-random clusters of 20 + 2 far outliers + 1 zero-norm
    val members = for {
      c <- 0 until 3; m <- 0 until 20
    } yield ((c * 20 + m).toLong,
      EmbeddingFixture.member("out", Dim, jitter = 0.05f)(c, m))
    val lonely = Seq(
      (100L, Array.tabulate(Dim)(i => EmbeddingFixture.rnd("lone:1", i))),
      (101L, Array.tabulate(Dim)(i => EmbeddingFixture.rnd("lone:2", i))))
    val zero = Seq((102L, Array.fill(Dim)(0.0f)))
    members ++ lonely ++ zero
  }

  private lazy val emb = fixture.toDF("vec_id", "embedding")

  test("flags agree with an independent nearest-centroid computation") {
    val centroids = Similarity.sampleCentroids(emb, nlist = 8)
    val tau = 0.5
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until Dim).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) Double.NegativeInfinity
      else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = fixture.map { case (id, v) =>
      val best = centroids.map { case (cid, c) => (cos(v, c), cid) }
        .maxBy { case (s, cid) => (s, cid) }
      id -> (best._1 < tau)
    }.toMap
    val got = Similarity.embeddingOutliers(emb, nlist = 8, tau = tau)
      .collect().map(r =>
        r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(got.keySet === expected.keySet)
    // tolerate nothing: the operator's cosine is the same math
    assert(got === expected)
  }

  test("zero-norm vectors report -Infinity cosine and are always outliers") {
    val r = Similarity.embeddingOutliers(emb, nlist = 8, tau = 0.01)
      .where(col("vec_id") === 102L).collect().head
    assert(r.getAs[Double]("cell_cosine").isNegInfinity)
    assert(r.getAs[Boolean]("is_outlier"))
  }

  test("cell_n is the assigned cell's population") {
    val out = Similarity.embeddingOutliers(emb, nlist = 8, tau = 0.5).collect()
    val byCell = out.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("cell_n") === rows.length.toLong))
    }
    assert(out.length === fixture.length) // every vector flagged or not, none lost
  }
}
