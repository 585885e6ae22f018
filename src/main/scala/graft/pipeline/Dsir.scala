package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Hash

/** DSIR-style data selection: hashed n-gram importance weighting
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"). Given a small TARGET corpus (the
  * distribution you want — e.g. curated reference text) and the big
  * RAW corpus, score every raw document by how much more likely its
  * hashed n-gram features are under the target's bag-of-features
  * model than under the raw corpus's own:
  *
  *   log w(doc) = Σ_b c_doc[b] · (ln p_target[b] − ln p_raw[b])
  *
  * over `buckets` feature buckets (word unigrams + bigrams hashed
  * through the engine md5 family), each distribution Laplace-smoothed
  * (+1 per bucket). Resampling ∝ w then yields a raw subset whose
  * feature distribution approaches the target's — the paper's
  * importance-resampling selection, here as [[resampleTopN]]'s
  * Gumbel top-k (deterministic via md5 variates).
  *
  * Scale shape (100 TB raw corpus):
  *  - Feature strings live only inside the narrow explode→hash
  *    projection; the FIRST exchange is already at the
  *    (doc_id, bucket) long-pair grain with map-side combine — text
  *    never shuffles.
  *  - Both bucket tables are exactly `buckets` rows; the per-bucket
  *    log-ratio table is broadcast into the per-doc join, so scoring
  *    is one map-side join + one map-side-combinable per-doc sum.
  *  - The target side is the small curated corpus by construction;
  *    its full feature pass is the cheap one.
  *
  * Determinism: each bucket's log-ratio is ONE `ln` of one
  * exact-product double ratio, identically parenthesized in the SQL
  * oracle ((t+1)·(TR+B) / ((TT+B)·(r+1))); the per-doc Σ c·δ is a
  * float sum whose partition order rides the engine-wide 6-dp
  * rounding note (see [[TextAnalysis.unigramLogProb]]).
  */
object Dsir {

  /** Per-document hashed feature counts: (idCol, bucket, c) at the
    * long-pair grain. Features are word unigrams + adjacent bigrams;
    * docs with no tokens contribute no rows (rejoined by the caller).
    */
  def hashedFeatureCounts(df: DataFrame, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val w = TextAnalysis.tokens(col(textCol))
    val bigrams = when(size(w) >= 2,
      zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(concat(w, bigrams)).as("__f"))
      .select(col(idCol), (Md5Hash.h60(col("__f")) % buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Laplace-smoothed per-bucket counts + total for one corpus side:
    * (bucket, cnt) for every occupied bucket plus the corpus feature
    * total as a 1-row frame. Missing buckets are implicit zeros
    * (filled at ratio time).
    */
  private def bucketCounts(feats: DataFrame): (DataFrame, DataFrame) = {
    val per = feats.groupBy(col("bucket")).agg(sum(col("c")).as("cnt"))
    val tot = per.agg(coalesce(sum(col("cnt")), lit(0L)).as("tot"))
    (per, tot)
  }

  /** Per-raw-document importance weights against `target`'s hashed
    * n-gram distribution: (idCol, n_feats, log_weight). Every raw doc
    * appears exactly once; feature-less docs score 0 (weight 1).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 256, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    importanceWeightsFromCounts(raw.select(col(idCol)),
      hashedFeatureCounts(raw, buckets, idCol, textCol),
      hashedFeatureCounts(target, buckets, idCol, textCol),
      buckets, idCol)

  /** [[importanceWeights]] over PRE-COMPUTED feature-count frames
    * ([[hashedFeatureCounts]] output shape) — for pipelines that hold
    * the (id, bucket, c) substrate already filtered to the live
    * corpus (e.g. [[Curation]], which computes features once off the
    * scan and intersects id sets on the narrow frame so document
    * text never rides a verdict join). `rawIds` supplies the id
    * universe: every id appears exactly once in the output,
    * feature-less docs score 0.
    */
  def importanceWeightsFromCounts(rawIds: DataFrame, rawFeats: DataFrame,
      tgtFeats: DataFrame, buckets: Int,
      idCol: String = "doc_id"): DataFrame = {
    val (rawPer, rawTot) = bucketCounts(rawFeats)
    val (tgtPer, tgtTot) = bucketCounts(tgtFeats)

    // All `buckets` rows, zeros filled — tiny (≤ buckets rows), built
    // once and broadcast into the per-doc scoring join. The ratio is
    // exact-integer sums pushed through ONE double product per side
    // and ONE ln — the whole cross-engine float surface per bucket.
    val spark = rawIds.sparkSession
    import spark.implicits._
    val ids = spark.createDataset(0L until buckets.toLong).toDF("bucket")
    val deltas = ids
      .join(tgtPer, Seq("bucket"), "left")
      .withColumnRenamed("cnt", "tcnt")
      .join(rawPer, Seq("bucket"), "left")
      .withColumnRenamed("cnt", "rcnt")
      .crossJoin(broadcast(tgtTot.select(col("tot").as("tt"))))
      .crossJoin(broadcast(rawTot.select(col("tot").as("tr"))))
      .select(col("bucket"),
        log(((coalesce(col("tcnt"), lit(0L)) + 1L).cast("double") *
          (col("tr") + buckets.toLong).cast("double")) /
          ((col("tt") + buckets.toLong).cast("double") *
            (coalesce(col("rcnt"), lit(0L)) + 1L).cast("double")))
          .as("delta"))

    val perDoc = rawFeats
      .join(broadcast(deltas), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("__nf"),
        sum(col("c").cast("double") * col("delta")).as("__lw"))

    rawIds.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nf"), lit(0L)).as("n_feats"),
        coalesce(col("__lw"), lit(0.0)).as("log_weight"))
  }

  /** Importance resampling: n raw docs drawn without replacement with
    * probability ∝ exp(log_weight), via the Gumbel-top-k identity —
    * rank by log_weight + Gumbel(md5 variate) and keep the n largest.
    * Deterministic given (corpus, salt): the variate is the engine
    * md5 uniform, so the selected set is partition/replay-stable.
    * Spec-gated (not oracle-gated): the selection compares raw
    * transcendental keys, which the cross-engine 6-dp contract cannot
    * order — the WEIGHTS (p78) carry the oracle.
    */
  def resampleTopN(weighted: DataFrame, n: Int, salt: String = "dsir",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 0, s"n=$n must be non-negative")
    // (h + 0.5) / 2^32 keeps u strictly inside (0, 1) so both ln
    // calls are finite — Sampling.uniform's [0, 1) would send u = 0
    // to gumbel = -Infinity and silently exile that doc.
    val k = col(idCol).cast("string")
    val enc = concat(
      coalesce(concat(length(k).cast("string"), lit(":"), k), lit("null")),
      lit("/" + salt))
    val u = (conv(substring(md5(enc), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)
    val key = col("log_weight") + -log(-log(u))
    weighted
      .withColumn("__k", key)
      .orderBy(col("__k").desc, col(idCol))
      .limit(n)
      .drop("__k")
  }
}
