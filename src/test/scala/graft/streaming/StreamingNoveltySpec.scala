package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomFunctions
import graft.pipeline.Dedup

/** The online novelty monitor: batch docs scored against the
  * pre-batch Bloom, the filter advancing once per batch — so a doc
  * repeating an EARLIER batch scores zero while its first occurrence
  * scored one, and base-corpus content scores zero from the start.
  */
class StreamingNoveltySpec extends SparkSpec {

  import spark.implicits._

  test("novelty against the advancing filter; earlier batches suppress later repeats") {
    val dirP = Files.createTempDirectory("graft-st18-spec-")
    val bloomPath = dirP.resolve("bloom").toString
    val stage = dirP.resolve("in").toString
    val out = dirP.resolve("out").toString

    val base = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    BloomFunctions.writeBloom(
      Dedup.wordShingles(base).select(col("shingle")).distinct(),
      "shingle", bloomPath, mWords = 1024, k = 4)

    // batch 1: a copy of the base doc + a brand-new doc
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    // batch 2: a copy of batch 1's NEW doc + another fresh doc
    val b2 = Seq(
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven twelve")).toDF("doc_id", "text")

    b1.coalesce(1).write.parquet(stage)
    val q = StreamingNovelty.noveltyWriter(
      spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage),
      bloomPath, out)
      .option("checkpointLocation", dirP.resolve("ckpt").toString).start()
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(stage)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap
    assert(got(1L) === ((4L, 0L)), "base content must score zero novelty")
    assert(got(2L) === ((4L, 4L)), "fresh content must be fully novel")
    assert(got(3L) === ((4L, 0L)),
      "a repeat of an EARLIER batch must be suppressed by the advanced filter")
    assert(got(4L) === ((4L, 4L)))
  }

  test("replaying a batch is idempotent: same rows, same bloom version chain") {
    val dirP = Files.createTempDirectory("graft-st18-replay-")
    val bloomPath = dirP.resolve("bloom").toString
    val out = dirP.resolve("out").toString

    val base = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    BloomFunctions.writeBloom(
      Dedup.wordShingles(base).select(col("shingle")).distinct(),
      "shingle", bloomPath, mWords = 1024, k = 4)

    val b0 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")

    def bits(path: String): Seq[Long] =
      BloomFunctions.readBloom(spark, path)._1.toSeq
    def sinkRows(): Seq[(Long, Long, Long)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
          r.getAs[Long]("n_novel"))).toSeq.sorted

    StreamingNovelty.processBatch(b0, batchId = 0L, bloomPath, out, n = 3)
    val rows1 = sinkRows()
    val seed1 = bits(bloomPath)
    val v0 = bits(StreamingNovelty.versionPath(bloomPath, 0L))
    assert(rows1.nonEmpty)
    assert(v0 !== seed1, "advance must have OR-ed new shingles in")

    // crash AFTER the advance but BEFORE the checkpoint commit: the
    // engine re-invokes batch 0. It must be judged against the SAME
    // pre-batch filter (the untouched seed, not its own v0) and must
    // neither duplicate rows nor re-advance.
    StreamingNovelty.processBatch(b0, batchId = 0L, bloomPath, out, n = 3)
    assert(sinkRows() === rows1, "replayed batch changed the sink row set")
    assert(bits(bloomPath) === seed1, "seed artifact was mutated")
    assert(bits(StreamingNovelty.versionPath(bloomPath, 0L)) === v0)

    // the NEXT batch is judged against v0 (fresh content of batch 0
    // now scores zero novelty)
    val b1 = Seq((3L, "one two three four five six")).toDF("doc_id", "text")
    StreamingNovelty.processBatch(b1, batchId = 1L, bloomPath, out, n = 3)
    val after = sinkRows()
    assert(after.contains((3L, 4L, 0L)),
      s"batch 1 must be judged against the advanced v0 filter: $after")
  }

  test("bloom version chain stays bounded: batchId-2 and older are pruned") {
    val dirP = Files.createTempDirectory("graft-st18-prune-")
    val bloomPath = dirP.resolve("bloom").toString
    val out = dirP.resolve("out").toString
    val base = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    BloomFunctions.writeBloom(
      Dedup.wordShingles(base).select(col("shingle")).distinct(),
      "shingle", bloomPath, mWords = 1024, k = 4)
    (0L to 4L).foreach { b =>
      StreamingNovelty.processBatch(
        Seq((100 + b, s"w$b x$b y$b z$b q$b r$b")).toDF("doc_id", "text"),
        b, bloomPath, out, n = 3)
    }
    val live = (0L to 4L).filter(v => Files.exists(
      java.nio.file.Paths.get(StreamingNovelty.versionPath(bloomPath, v))))
    assert(live === Seq(3L, 4L), s"chain not pruned: $live")
    // the seed itself is never touched
    assert(Files.exists(java.nio.file.Paths.get(bloomPath)))
  }

  test("a stale bloom chain from a previous run is refused, not silently reused") {
    val dirP = Files.createTempDirectory("graft-st18-stale-")
    val bloomPath = dirP.resolve("bloom").toString
    val out = dirP.resolve("out").toString
    val base = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    BloomFunctions.writeBloom(
      Dedup.wordShingles(base).select(col("shingle")).distinct(),
      "shingle", bloomPath, mWords = 1024, k = 4)
    val b0 = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    StreamingNovelty.processBatch(b0, 0L, bloomPath, out, n = 3)
    // a fresh checkpoint restarts batchIds over the SAME bloom chain
    // but a NEW sink: skipping the advance would judge the next batch
    // against the old run's corpus — must refuse instead
    intercept[IllegalStateException] {
      StreamingNovelty.processBatch(b0, 0L, bloomPath,
        dirP.resolve("out_freshrun").toString, n = 3)
    }
  }
}
