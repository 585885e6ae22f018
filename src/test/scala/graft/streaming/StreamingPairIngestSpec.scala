package graft.streaming

import graft.SparkSpec
import graft.pipeline.Multimodal
import StreamingPairIngest.{Config, PairIn}

/** [[StreamingPairIngest]] — the composed image–text chain: rejected
  * pairs never claim content hashes, alignment/caption verdicts join
  * the quota and index disciplines, replay idempotence.
  */
class StreamingPairIngestSpec extends SparkSpec {

  import spark.implicits._

  private def mkCfg(): Config = Config(quotaPerSource = 3L,
    minCaptionTokens = 3,
    outPath = java.nio.file.Files.createTempDirectory("spi").toString + "/out")

  private def verdicts(cfg: Config) =
    spark.read.parquet(cfg.outPath).collect()
      .map(r => r.getAs[Long]("pair_id") ->
        ((r.getAs[Boolean]("admitted"), r.getAs[Boolean]("aligned"),
          r.getAs[Boolean]("caption_ok"), r.getAs[Boolean]("keeper"))))
      .toMap

  test("a rejected pair never claims a hash; a clean later copy still wins") {
    val cfg = mkCfg()
    // batch 0: pair 1 has content X but a junk caption — rejected, so
    // X stays unclaimed; pair 2 clean with content Y
    val b0 = Seq(
      PairIn(1L, "a", Multimodal.syntheticPng(7L, 10, 10), "10x10"),
      PairIn(2L, "a", Multimodal.syntheticPng(8L, 10, 10),
        "a clean caption sized 10x10")).toDS()
    StreamingPairIngest.processBatch(b0, 0L, cfg)
    // batch 1: pair 3 re-sends content X with a CLEAN caption — must
    // become keeper (the junk pair didn't shadow it); pair 4 re-sends
    // Y (denied by index); pair 5 misaligned
    val b1 = Seq(
      PairIn(3L, "b", Multimodal.syntheticBmp(7L, 10, 10),
        "a clean caption sized 10x10"),
      PairIn(4L, "b", Multimodal.syntheticBmp(8L, 10, 10),
        "another clean caption 10x10 here"),
      PairIn(5L, "b", Multimodal.syntheticPng(9L, 10, 10),
        "claims the wrong size 11x10 alas")).toDS()
    StreamingPairIngest.processBatch(b1, 1L, cfg)

    val v = verdicts(cfg)
    assert(v(1L) === ((true, true, false, false)), "junk caption rejected")
    assert(v(2L) === ((true, true, true, true)))
    assert(v(3L) === ((true, true, true, true)),
      "clean re-send of unclaimed content must win")
    assert(v(4L) === ((true, true, true, false)), "index denies known content")
    assert(v(5L) === ((true, false, true, false)), "dims mismatch")
  }

  test("quota carries across batches; a replayed batch rewrites identical outputs") {
    val cfg = mkCfg()
    val b0 = Seq(
      PairIn(1L, "a", Multimodal.syntheticPng(1L, 8, 8), "first fine pair 8x8"),
      PairIn(2L, "a", Multimodal.syntheticPng(2L, 8, 8), "second fine pair 8x8"),
      PairIn(3L, "a", Multimodal.syntheticPng(3L, 8, 8), "third fine pair 8x8")).toDS()
    StreamingPairIngest.processBatch(b0, 0L, cfg)
    val b1 = Seq(
      PairIn(4L, "a", Multimodal.syntheticPng(4L, 8, 8),
        "over quota however fine 8x8")).toDS()
    StreamingPairIngest.processBatch(b1, 1L, cfg)
    val before = verdicts(cfg)
    assert(before(4L)._1 === false, "carried counter must block")
    // replay batch 1 (crash between sink write and checkpoint commit)
    StreamingPairIngest.processBatch(b1, 1L, cfg)
    assert(verdicts(cfg) === before)
    assert(spark.read.parquet(cfg.statePath + "/batch=1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 3L), "replayed counter snapshot identical")
  }
}
