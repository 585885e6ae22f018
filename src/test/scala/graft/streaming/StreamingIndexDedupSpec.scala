package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Dedup

/** The online ingest-dedup loop: micro-batched verdicts against the
  * static LSH index must equal the one-shot batch operator — and be
  * blind to micro-batch peers (the p19 index-wins contract).
  */
class StreamingIndexDedupSpec extends SparkSpec {

  import spark.implicits._

  private val longDoc =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"

  private val base = Seq(
    (0L, longDoc),
    (2L, "one two three four five six seven eight nine"),
    (4L, "totally unrelated corpus content sits here quietly"))
  private val arrivals = Seq(
    // near-dup of indexed doc 0 (one token appended: all 20 of its
    // shingles survive, jaccard 20/21 ~ 0.952 — and with this md5
    // family the banded signature still collides; a 0.905 variant
    // (trailing token REPLACED) deterministically misses banding,
    // which is the expected ~0.92 recall of (16, 4) banding, p63)
    (1L, longDoc + " psi"),
    // exact twin of indexed doc 2
    (3L, "one two three four five six seven eight nine"),
    // twin of doc 3 ARRIVING IN THE OTHER BATCH: must match the index
    // (doc 2), never its stream peer (doc 3)
    (5L, "one two three four five six seven eight nine"),
    (7L, "nothing like anything indexed at all whatsoever"))

  private def runStream(indexPath: String): Set[(Long, Long)] = {
    val dirP = Files.createTempDirectory("graft-st17-spec-")
    val stage = dirP.resolve("in").toString
    val out = dirP.resolve("out").toString
    val odd = arrivals.toDF("doc_id", "text")
    odd.where(col("doc_id") % 4 === 1).coalesce(1).write.parquet(stage)
    odd.where(col("doc_id") % 4 === 3).coalesce(1)
      .write.mode("append").parquet(stage)
    val q = StreamingIndexDedup.verdictWriter(
      spark.readStream.schema(odd.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage),
      indexPath, out, threshold = 0.8)
      .option("checkpointLocation", dirP.resolve("ckpt").toString).start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old")))
      .toSet
  }

  test("micro-batched union == one-shot batch; verdicts are batch-blind") {
    val dirP = Files.createTempDirectory("graft-st17-idx-")
    val indexPath = dirP.resolve("index").toString
    Dedup.writeLshIndex(base.toDF("doc_id", "text"), indexPath)

    val streamed = runStream(indexPath)
    val oneShot = Dedup.nearDupsAgainstIndex(
      arrivals.toDF("doc_id", "text"), indexPath, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old")))
      .toSet
    assert(streamed === oneShot,
      "micro-batching changed the verdict union")
    // the twins matched the INDEX...
    assert(streamed.contains((3L, 2L)) && streamed.contains((5L, 2L)))
    assert(streamed.contains((1L, 0L)))
    // ...and never each other (batch-blind), in either batch order
    assert(!streamed.exists { case (a, b) => a % 2 == 1 && b % 2 == 1 },
      s"stream peers paired with each other: $streamed")
    // the unrelated arrival matched nothing
    assert(!streamed.exists(_._1 == 7L))
  }

  test("replaying a committed micro-batch leaves the sink row set unchanged") {
    val dirP = Files.createTempDirectory("graft-st17-replay-")
    val indexPath = dirP.resolve("index").toString
    val out = dirP.resolve("out").toString
    Dedup.writeLshIndex(base.toDF("doc_id", "text"), indexPath)

    val batch = arrivals.toDF("doc_id", "text")
    def run(): Unit = StreamingIndexDedup.processBatch(
      batch, batchId = 0L, indexPath, out,
      threshold = 0.8, n = 3, numHashes = 16, rowsPerBand = 4)
    def sinkRows(): Seq[(Long, Long)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_old")))
        .toSeq.sorted

    run()
    val first = sinkRows()
    assert(first.nonEmpty)
    // crash between parquet commit and checkpoint commit => the
    // engine re-invokes the SAME (batch, batchId); the batch=0
    // partition is overwritten, never double-appended
    run()
    assert(sinkRows() === first,
      "replayed micro-batch changed the sink row set")
  }
}
