package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.BloomFunctions
import graft.pipeline.Dedup

/** ONLINE corpus-novelty monitor — the streaming face of
  * [[Dedup.noveltyCurve]]: documents arrive as a stream and each
  * micro-batch's docs are scored by the fraction of their shingles
  * NOT yet in the corpus-so-far, where "so far" is a persisted Bloom
  * filter ([[BloomFunctions]]' artifact) seeded offline from the
  * base corpus and OR-updated after every batch. The live ingest
  * dashboard signal: novelty trending toward zero means the crawl is
  * re-paying for data it already has.
  *
  * Exact-vs-approx trade, explicit: the batch noveltyCurve holds the
  * full (shingle → first owner) grain; a stream cannot (unbounded
  * state). The Bloom bounds state to mWords longs FOREVER, at the
  * cost of false positives — a novel shingle can be miscounted as
  * seen, so the streamed novelty is a deterministic UNDERestimate
  * with FP rate set by sizing (and the md5 double-hash family makes
  * even the FP set engine-reproducible — the st18 oracle rebuilds
  * the filter bit-for-bit in SQL).
  *
  * Determinism: all docs in one micro-batch are judged against the
  * SAME pre-batch filter (batch-internal order never matters); the
  * filter then advances once per batch, so the outputs are a pure
  * function of the batch partitioning — which a bounded replay pins
  * (the st02-style drain-between-files harness).
  */
object StreamingNovelty {

  /** Writer appending (doc_id, n_shingles, n_novel, novelty) per
    * micro-batch to `outPath`; `bloomPath` must hold a seeded bloom
    * ([[BloomFunctions.writeBloom]] over the base corpus's shingles)
    * and is advanced after each batch. Caller sets the checkpoint
    * location and starts it.
    */
  def noveltyWriter(docs: DataFrame, bloomPath: String, outPath: String,
      n: Int = 3): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val sh = Dedup.wordShingles(batch, n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // judge against the PRE-batch filter...
          val (words, k) = BloomFunctions.readBloom(spark, bloomPath)
          val filterDf = Seq(Tuple1(words.toSeq)).toDF("__bloom")
          val (ha, hb) = BloomFunctions.md5Halves(col("shingle"))
          sh.crossJoin(broadcast(filterDf))
            .withColumn("__seen",
              BloomFunctions.bloomContains(col("__bloom"), ha, hb, k))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_shingles"),
              sum(when(col("__seen"), 0L).otherwise(1L)).as("n_novel"))
            .withColumn("novelty", col("n_novel") / col("n_shingles"))
            .write.mode("append").parquet(outPath)
          // ...then advance it for the next batch
          BloomFunctions.appendToBloom(
            sh.select(col("shingle")).distinct(), "shingle", bloomPath)
        } finally { sh.unpersist(); () }
        ()
      }
      .trigger(Trigger.ProcessingTime(50))
}
