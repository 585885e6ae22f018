package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8-range) embedding quantization: per-dimension min/max
  * over the corpus → each float component mapped to an integer code
  * in [0, 255]. Quantized vectors are 4× smaller than float32 (the
  * difference between an ANN index that fits executor memory at
  * 100 TB and one that doesn't), and scoring becomes an INTEGER dot
  * product — exact, associativity-free arithmetic, so ranking is
  * bit-reproducible across engines and partitionings (unlike float
  * sums, whose order matters).
  *
  * Quantization formula (per dim d with corpus range [lo_d, hi_d]):
  *   q = clamp(floor((v - lo_d) * 255.0 / (hi_d - lo_d) + 0.5), 0, 255)
  * (floor(x+0.5) spelled out rather than round() — round()'s
  * half-case convention varies across engines; floor doesn't. The
  * expression is a fixed chain of exact-input IEEE double ops, so any
  * engine computes the identical code.) Degenerate dims
  * (hi == lo) map to 0.
  *
  * Scale shape: the range pass is one explode → groupBy(dim) over 64
  * groups (map-side-combined to 64 rows per partition); ranges ride
  * along as a 1-row broadcast, so quantization itself is narrow.
  * Scoring the full corpus is a broadcast-1-row cross join + narrow
  * dot + TakeOrdered — same plan family as
  * [[Similarity.bruteForceTopK]], which this replaces when memory,
  * not compute, is the binding constraint. Compose with
  * [[Similarity.ivfTopKWith]] cells for the both-axes path.
  */
object Quantization {

  /** Per-dimension corpus ranges: (d, lo, hi), one row per dimension.
    * posexplode is 0-based, matching the oracle's range(dim) axis.
    */
  def dimRanges(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("d", "v")))
      .groupBy("d").agg(
        min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))

  /** The ranges packed into two ordered arrays as a single row
    * (`los`, `his`) — the broadcastable form.
    */
  private def rangeArrays(emb: DataFrame, vecCol: String): DataFrame =
    dimRanges(emb, vecCol)
      .groupBy().agg(
        sort_array(collect_list(struct(col("d"), col("lo")))).as("__l"),
        sort_array(collect_list(struct(col("d"), col("hi")))).as("__h"))
      .select(transform(col("__l"), e => e("lo")).as("los"),
        transform(col("__h"), e => e("hi")).as("his"))

  /** Quantization expression for one vector column against `los`/
    * `his` array columns (all same length). Interpreted HOF, but NOT
    * a per-query path: quantization runs once per corpus batch when
    * the qvec column is materialized (the index build); queries score
    * prebuilt codes through the native codegen'd [[intDot]].
    */
  private def quantizeExpr(vec: Column, los: Column, his: Column): Column =
    zip_with(vec, zip_with(los, his, (l, h) => struct(l.as("lo"), h.as("hi"))),
      (v, r) => when(r("hi") === r("lo"), lit(0))
        .otherwise(least(greatest(
          floor((v.cast("double") - r("lo")) * 255.0 / (r("hi") - r("lo")) + lit(0.5)),
          lit(0.0)), lit(255.0)).cast("int")))

  /** The corpus with a quantized `qvec: array<int>` column appended
    * (ranges computed from the corpus itself).
    */
  def quantized(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.crossJoin(broadcast(rangeArrays(emb, vecCol)))
      .withColumn("qvec", quantizeExpr(col(vecCol), col("los"), col("his")))
      .drop("los", "his")

  /** Exact integer dot product of two int-array columns (long
    * accumulator) — the native codegen'd
    * [[graft.functions.IntVectorDot]] (a tight primitive loop inside
    * whole-stage codegen; the `aggregate(zip_with(...))` HOF
    * formulation it replaces is interpreted per element, which is the
    * wrong shape for the per-query corpus-scan scoring path).
    */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.intVecDot(a, b)

  /** Top-k nearest corpus vectors to `queryId` by quantized dot
    * product: (vec_id, qscore). Ties break by vec_id ascending;
    * qscore is an exact BIGINT, so the ordering (and any oracle
    * hash) is engine-independent.
    */
  def quantizedTopK(emb: DataFrame, queryId: Long, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = quantized(emb, vecCol)
      .select(col(idCol).as("vec_id"), col("qvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queryVec = q.where(col("vec_id") === queryId)
      .select(col("qvec").as("query_qvec"))
    q.crossJoin(broadcast(queryVec))
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), intDot(col("qvec"), col("query_qvec")).as("qscore"))
      .orderBy(col("qscore").desc, col("vec_id").asc)
      .limit(k)
  }
}
