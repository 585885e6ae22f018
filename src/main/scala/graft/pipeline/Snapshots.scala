package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-versioning primitive: given
  * two snapshots of a corpus (yesterday's crawl and today's), classify
  * every id as added / removed / changed / unchanged. Training-data
  * pipelines need this to answer "what actually moved between crawls"
  * before re-running expensive downstream stages (re-dedup, re-embed)
  * on the delta only — the corpus-level counterpart of the warehouse
  * CDC apply ([[graft.silver.Cdc]] consumes a change LOG; this
  * derives one from two materialized states).
  *
  * Scale shape: each side reduces to (id, 32-char content hash) in
  * the scan — the join carries hashes, never document text, so the
  * exchange is id-grain regardless of document size. The hash is md5
  * over length-prefixed content columns (the injective encoding
  * discipline of [[Sampling.uniform]]: bare concatenation would
  * collide ("ab","c") with ("a","bc") and misreport unchanged). NULL
  * content encodes as the sentinel "null" so a NULL-vs-NULL column
  * compares EQUAL (SQL NULL <> NULL would misreport every null-held
  * row as changed on each diff).
  */
object Snapshots {

  /** (idCol, status) for the union of both snapshots' ids, status in
    * {'added', 'removed', 'changed', 'unchanged'}. Ids must be unique
    * per snapshot (a corpus primary key).
    */
  def diff(old: DataFrame, cur: DataFrame, idCol: String = "doc_id",
      contentCols: Seq[String] = Seq("text")): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    def fingerprinted(df: DataFrame, fpName: String) = df.select(
      col(idCol),
      md5(concat(contentCols.map { c =>
        coalesce(
          concat(length(col(c).cast("string")).cast("string"),
            lit(":"), col(c).cast("string")),
          lit("null"))
      }: _*)).as(fpName))
    fingerprinted(old, "__fp_old")
      .join(fingerprinted(cur, "__fp_cur"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_cur").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_cur"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The diff rolled up into a RELEASE-NOTE composition card: per
    * (status, stratum) doc and token counts — "this crawl added 1.2M
    * docs / 900M tokens of src_news, removed 40k of src_forum, edited
    * ..." — the versioning report a dataset release ships next to the
    * [[Reporting.dataCard]]. Rows describe the CURRENT snapshot's
    * content for added/changed/unchanged and the OLD snapshot's for
    * removed (the only side that still has those docs).
    *
    * Scale shape: [[diff]]'s id-grain hash join + one id-grain
    * attribute join + a (status, stratum)-grain aggregation — text
    * reduces to token counts in the scan, never shuffles.
    */
  def diffCard(old: DataFrame, cur: DataFrame, stratumCol: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val statuses = diff(old, cur, idCol, Seq(textCol))
    def attrs(df: DataFrame) = df.select(
      col(idCol), col(stratumCol),
      TextAnalysis.tokenCount(col(textCol)).as("__nt"))
    // current rows for every id the current snapshot has; old rows
    // only for ids that vanished (anti-join) — exactly one attribute
    // row per diffed id
    val side = attrs(cur).unionByName(
      attrs(old).join(cur.select(col(idCol)), Seq(idCol), "left_anti"))
    statuses.join(side, Seq(idCol))
      .groupBy(col("status"), col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
  }

  /** Token-distribution drift between two snapshots — the TEXT-side
    * drift monitor next to [[Similarity.ivfAssignmentQuality]]'s
    * embedding drift guard: hashed uni+bigram feature distributions
    * ([[Dsir.hashedFeatureCounts]]' space), Laplace-smoothed, compared
    * by Jensen-Shannon divergence and total-variation distance. One
    * summary row: `(n_old_feats, n_cur_feats, js_divergence,
    * tv_distance)`. A rising JS between yesterday's and today's crawl
    * is the "retrain/re-weight your filters" signal (the classifier's
    * and DSIR's bucket tables went stale) — the release-note number a
    * versioned corpus ships next to [[diffCard]].
    *
    * Scale shape: each side reduces to `buckets` (cnt) rows in one
    * map-side-combinable pass (text scanned once per side, never
    * shuffled); the divergence is a `buckets`-row aggregation. JS is
    * symmetric and bounded by ln 2 — unlike raw KL it cannot blow up
    * on a bucket one side has never seen, which hashed buckets of a
    * fresh crawl routinely produce even under smoothing.
    */
  def tokenDrift(old: DataFrame, cur: DataFrame, buckets: Int = 256,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    tokenDriftFromCounts(
      bucketTotals(old, buckets, textCol, idCol),
      bucketTotals(cur, buckets, textCol, idCol), buckets)

  /** One side's hashed-feature bucket totals: (bucket, cnt) for the
    * occupied buckets — the bounded substrate [[tokenDriftFromCounts]]
    * compares and the state a STREAMING monitor accumulates
    * ([[graft.streaming.StreamingDrift]]): merging two corpora's
    * totals is a trivial per-bucket sum.
    */
  def bucketTotals(df: DataFrame, buckets: Int = 256,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    Dsir.hashedFeatureCounts(df.select(col(idCol), col(textCol)),
      buckets, idCol, textCol)
      .groupBy(col("bucket")).agg(sum(col("c")).as("cnt"))

  /** [[tokenDrift]] over PRE-AGGREGATED (bucket, cnt) frames. */
  def tokenDriftFromCounts(oldCounts: DataFrame, curCounts: DataFrame,
      buckets: Int = 256): DataFrame = {
    def named(df: DataFrame, cntName: String) =
      df.select(col("bucket"), col("cnt").as(cntName))
    val spark = oldCounts.sparkSession
    import spark.implicits._
    val ids = spark.createDataset(0L until buckets.toLong).toDF("bucket")
    val joined = ids
      .join(named(oldCounts, "__co"), Seq("bucket"), "left")
      .join(named(curCounts, "__cc"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__co"), lit(0L)).as("co"),
        coalesce(col("__cc"), lit(0L)).as("cc"))
    // Laplace-smoothed probabilities over exact integer totals; the
    // one-row totals broadcast into the 256-row frame
    val totals = joined.agg(sum(col("co")).as("to"), sum(col("cc")).as("tc"))
    val probs = joined.crossJoin(broadcast(totals))
      .select(col("co"), col("cc"),
        ((col("co") + 1L).cast("double") /
          (col("to") + buckets.toLong).cast("double")).as("p"),
        ((col("cc") + 1L).cast("double") /
          (col("tc") + buckets.toLong).cast("double")).as("q"))
    val m = (col("p") + col("q")) / 2.0
    probs.agg(
      sum(col("co")).as("n_old_feats"),
      sum(col("cc")).as("n_cur_feats"),
      (sum(col("p") * log(col("p") / m)) / 2.0 +
        sum(col("q") * log(col("q") / m)) / 2.0).as("js_divergence"),
      (sum(abs(col("p") - col("q"))) / 2.0).as("tv_distance"))
  }
}
