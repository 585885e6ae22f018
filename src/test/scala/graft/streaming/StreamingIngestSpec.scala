package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Classifier, Dedup, TextAnalysis}

/** The composed online ingest chain ([[StreamingIngest]]): replay
  * idempotence over the WHOLE chain (sink + counter state), cross-
  * batch persistence of both stateful stages (admission quota and
  * bucket counters), and batch-boundary invariance of the final
  * coordinates under doc_id-ordered staging — the properties the
  * st28 hash gate assumes.
  */
class StreamingIngestSpec extends SparkSpec {

  import spark.implicits._

  // 12 docs, 2 sources, word lengths varied so buckets and quotas
  // both get exercised; doc 5 is an exact twin of indexed doc 0.
  private val indexed = Seq(
    (0L, "idx", "one two three four five six seven eight nine ten"),
    (2L, "idx", "completely different indexed content lives here"))
  private val arriving = (1L to 23L by 2L).map { i =>
    val words = (1L to (3 + i % 9)).map(w => s"w${(i * 7 + w) % 13}")
    (i, if (i % 4 == 1) "sa" else "sb",
      if (i == 5L) "one two three four five six seven eight nine ten"
      else words.mkString(" "))
  }

  private def mkIndex(): String = {
    val dir = Files.createTempDirectory("graft-st28-idx-").toString + "/idx"
    Dedup.writeLshIndex(indexed.toDF("doc_id", "source", "text")
      .select("doc_id", "text"), dir)
    dir
  }

  private def models() = {
    val all = (indexed ++ arriving).toDF("doc_id", "source", "text")
    (StreamingPerplexity.frozenLm(
      all.select(col("doc_id").cast("long"), col("text").cast("string"))),
      Classifier.trainLogReg(all, (col("source") === "sa").cast("double"),
        buckets = 64, iterations = 2, learningRate = 4.0))
  }

  private def inputDf = arriving.toDF("doc_id", "source", "text")
    .select(col("doc_id").cast("long"), col("source").cast("string"),
      col("text").cast("string"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))

  private def readOut(out: String): Set[(Long, Long, Long, Long)] =
    spark.read.parquet(out)
      .select("doc_id", "bucket", "batch_id", "slot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def runPipeline(nFiles: Int, cfg0: StreamingIngest.Config = null)
      : (String, StreamingIngest.Config) = {
    val (lm, clf) = models()
    val dirP = Files.createTempDirectory("graft-st28-spec-")
    val stage = dirP.resolve("in").toString
    val in = inputDf
    // chop into nFiles files, doc_id-ordered (midpoint splits)
    val ids = arriving.map(_._1).sorted
    val bounds = (1 to nFiles).map(k => ids((k * ids.size / nFiles) - 1))
    var lo = Long.MinValue
    bounds.zipWithIndex.foreach { case (hi, k) =>
      in.where(col("doc_id") > lo && col("doc_id") <= hi)
        .coalesce(1).write.mode("append").parquet(stage)
      lo = hi
      // distinct mtimes so file order == doc_id order
      val t = java.nio.file.attribute.FileTime.fromMillis(
        1000000000000L + k * 60000L)
      val s = Files.list(java.nio.file.Paths.get(stage))
      try s.iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".parquet") &&
          Files.getLastModifiedTime(p).toMillis < 1000000000000L)
          Files.setLastModifiedTime(p, t)
        ()
      } finally s.close()
    }
    val cfg = if (cfg0 != null) cfg0 else StreamingIngest.Config(
      indexPath = mkIndex(), outPath = dirP.resolve("out").toString,
      budget = 40L, threshold = 0.8, qMin = 0.0, pplMin = -99.0,
      bucketWidth = 4, batchSize = 2)
    val q = StreamingIngest.pipeline(
      spark.readStream.schema(in.schema).option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .as[StreamingIngest.IngestDoc],
      cfg, lm, clf)
      .option("checkpointLocation", dirP.resolve("ckpt").toString).start()
    try q.awaitTermination() finally q.stop()
    (cfg.outPath, cfg)
  }

  test("stages all bite and compose: quota closes, index dup dropped, coordinates dealt") {
    val (out, cfg) = runPipeline(2)
    val got = spark.read.parquet(out)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(5L), "index twin must be deduped")
    // budget 40 closes at least one source's quota
    assert(ids.size < arriving.size - 1, "quota never closed")
    // slot coordinates: per bucket, slots fill 0..batchSize-1 in order
    val byBucket = readOut(out).groupBy(_._2)
    byBucket.foreach { case (b, rows) =>
      val dealt = rows.toSeq.sortBy(_._1).map(r => (r._3, r._4))
      val expected = rows.toSeq.indices.map(i =>
        (i.toLong / cfg.batchSize, i.toLong % cfg.batchSize))
      assert(dealt === expected, s"bucket $b dealt out of order: $dealt")
    }
  }

  test("batch-boundary invariance: 1-file vs 3-file staging deal identical coordinates") {
    val a = readOut(runPipeline(1)._1)
    val b = readOut(runPipeline(3)._1)
    assert(a === b,
      "chopping the doc_id-ordered replay differently must not move a coordinate")
    assert(a.nonEmpty)
  }

  test("processBatch is replay-idempotent: sink AND counter state unchanged on re-run") {
    val (lm, clf) = models()
    val dirP = Files.createTempDirectory("graft-st28-replay-")
    val cfg = StreamingIngest.Config(
      indexPath = mkIndex(), outPath = dirP.resolve("out").toString,
      budget = 1000L, threshold = 0.8, qMin = 0.0, pplMin = -99.0,
      bucketWidth = 4, batchSize = 2)
    val half = inputDf.withColumn("tokens_before", lit(0L))
    val b0 = half.where(col("doc_id") <= 11)
    val b1 = half.where(col("doc_id") > 11)
    StreamingIngest.processBatch(b0, 0L, cfg, lm, clf)
    StreamingIngest.processBatch(b1, 1L, cfg, lm, clf)
    def snapshot() = (readOut(cfg.outPath),
      spark.read.parquet(cfg.statePath).select("bucket", "dealt").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val before = snapshot()
    // crash-replay batch 1 (the at-least-once case)
    StreamingIngest.processBatch(b1, 1L, cfg, lm, clf)
    assert(snapshot() === before,
      "replaying a batch must leave sink and state byte-identical")
    // counters genuinely persisted across the batch boundary: batch 1
    // docs continue their bucket's numbering, never restart at 0
    val slots = readOut(cfg.outPath)
    val byBucket = slots.groupBy(_._2).filter { case (_, rows) =>
      rows.exists(_._1 <= 11) && rows.exists(_._1 > 11)
    }
    assert(byBucket.nonEmpty, "fixture must span both batches in some bucket")
    byBucket.foreach { case (b, rows) =>
      val dealt = rows.toSeq.sortBy(_._1)
        .map(r => r._3 * cfg.batchSize + r._4)
      assert(dealt === dealt.indices.map(_.toLong),
        s"bucket $b numbering restarted across the batch boundary")
    }
  }
}
