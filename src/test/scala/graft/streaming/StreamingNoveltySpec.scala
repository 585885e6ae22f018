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
}
