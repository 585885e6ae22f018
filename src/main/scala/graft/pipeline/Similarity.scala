package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, one scan, no shuffle besides
  *    the final TakeOrdered — the correct baseline and the oracle.
  *  - sign-LSH (random hyperplanes): hash every vector to an n-bit
  *    bucket; queries only score their own bucket. Candidate cost
  *    drops ~2^bits-fold; recall is tunable by bits / multi-probe.
  *    Hyperplanes are pseudo-random from xxhash64(bit, dim) — fully
  *    deterministic, no state to ship.
  *
  * All dot products are computed in double precision by a native
  * Catalyst expression with codegen
  * ([[graft.functions.FloatVectorDot]]) — higher-order functions are
  * interpreted and too slow for the pair-scoring inner loop.
  */
object Similarity {

  /** Double-precision dot product of two float-array columns
    * (codegen'd native expression; sequential accumulation, matching
    * the DuckDB oracle's DOUBLE[] dot product).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the query vector (the row of
    * `queryId`). The query side is a 1-row broadcast; the scan side
    * never shuffles — TakeOrdered keeps only k rows per partition.
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.where(col(idCol) === queryId)
      .select(col(vecCol).as("__q"))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        cosine(col(vecCol), col("__q")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for a mixed
    * (bit, dim) index: xxhash64 folded to {-1.0, +1.0}. Rademacher
    * planes are standard for sign-LSH and need no stored model.
    */
  private def planeComponent(mixedIdx: Column): Column =
    when(xxhash64(mixedIdx).bitwiseAND(1L) === 1L, lit(1.0))
      .otherwise(lit(-1.0))

  /** n-bit sign-LSH bucket id for a vector column. */
  def lshBucket(vec: Column, bits: Int = 8): Column = {
    val bitCols = (0 until bits).map { b =>
      // dot(vec, plane_b) via fold over element indices; the i*97+b mix
      // gives each (bit, dim) an independent hash input
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(i * lit(97L) + lit(b))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k: score only vectors in the query's LSH bucket. Exact
    * within the bucket; recall < 1 by construction (the scale path —
    * at 100 TB the bucket column is a partition key and a query
    * touches 1/2^bits of the corpus).
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.withColumn("__bucket", lshBucket(col(vecCol), bits))
    val q = bucketed.where(col(idCol) === queryId)
      .select(col(vecCol).as("__q"), col("__bucket"))
    bucketed.where(col(idCol) =!= queryId)
      .join(broadcast(q), Seq("__bucket"))
      .select(col(idCol),
        cosine(col(vecCol), col("__q")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets: pairs
    * within the same bucket with cosine >= threshold. The in-bucket
    * self-join replaces the corpus-wide cross product.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), bits).as("__bucket"))
    val l = bucketed.select(col("__bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val r = bucketed.select(col("__bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    l.join(r, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
