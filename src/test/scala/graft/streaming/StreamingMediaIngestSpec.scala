package graft.streaming

import graft.SparkSpec
import graft.pipeline.Multimodal
import StreamingMediaIngest.{Config, MediaIn}

/** [[StreamingMediaIngest]] — the composed media chain: quota
  * carry-over (including sources absent from a batch), index-wins
  * content dedup across batches, replay idempotence of a whole
  * micro-batch.
  */
class StreamingMediaIngestSpec extends SparkSpec {

  import spark.implicits._

  private def mkCfg(): Config = Config(quotaPerSource = 2L,
    outPath = java.nio.file.Files.createTempDirectory("smi").toString + "/out")

  private def verdicts(cfg: Config) =
    spark.read.parquet(cfg.outPath).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Boolean]("admitted"), r.getAs[Boolean]("keeper")))
      .toMap

  test("quota carries across batches (and survives a source-absent batch); index denies re-encodes") {
    val cfg = mkCfg()
    // batch 0: source a sends 1 (admitted, keeper), source b sends 2
    // (both admitted; one content -> one keeper)
    val b0 = Seq(
      MediaIn(1L, "a", Multimodal.syntheticPng(7L, 10, 10)),
      MediaIn(2L, "b", Multimodal.syntheticPng(8L, 10, 10)),
      MediaIn(3L, "b", Multimodal.syntheticBmp(8L, 10, 10))).toDS()
    StreamingMediaIngest.processBatch(b0, 0L, cfg)
    // batch 1: only source a (b absent — its counter must survive);
    // one new content + one re-encode of batch-0 content
    val b1 = Seq(
      MediaIn(4L, "a", Multimodal.syntheticBmp(7L, 10, 10)), // known content
      MediaIn(5L, "a", Multimodal.syntheticPng(9L, 10, 10)), // over quota
      MediaIn(6L, "a", Multimodal.syntheticPng(10L, 10, 10))).toDS() // over quota
    StreamingMediaIngest.processBatch(b1, 1L, cfg)
    // batch 2: source b returns — its carried count (2) blocks more
    val b2 = Seq(
      MediaIn(7L, "b", Multimodal.syntheticPng(11L, 10, 10))).toDS()
    StreamingMediaIngest.processBatch(b2, 2L, cfg)

    val v = verdicts(cfg)
    assert(v(1L) === ((true, true)))
    assert(v(2L) === ((true, true)), "min id claims the shared content")
    assert(v(3L) === ((true, false)), "same-batch transcode drops")
    assert(v(4L) === ((true, false)), "cross-batch re-encode denied by index")
    assert(v(5L) === ((false, false)), "source a over quota")
    assert(v(6L) === ((false, false)))
    assert(v(7L) === ((false, false)), "source b's carried count blocks")
  }

  test("a replayed micro-batch rewrites identical verdicts, state and index") {
    val cfg = mkCfg()
    val b0 = Seq(
      MediaIn(1L, "a", Multimodal.syntheticPng(7L, 10, 10)),
      MediaIn(2L, "a", Multimodal.syntheticPng(8L, 10, 10))).toDS()
    StreamingMediaIngest.processBatch(b0, 0L, cfg)
    val before = verdicts(cfg)
    val stateBefore = spark.read.parquet(cfg.statePath + "/batch=0")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay (crash between sink write and checkpoint commit)
    StreamingMediaIngest.processBatch(b0, 0L, cfg)
    assert(verdicts(cfg) === before)
    assert(spark.read.parquet(cfg.statePath + "/batch=0")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === stateBefore)
    assert(spark.read.parquet(cfg.indexPath + "/batch=0")
      .count() === 2L, "index partition rewritten, not appended")
  }
}
