package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The decode seam is stubbed (no codec libraries in this image); what
  * IS tested is the distributed plumbing: schema, metadata derivation,
  * per-partition decode shape, frame explode.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = Seq(
    (1L, "image", "fake-png-bytes-aaaaaaaaaaaaaaaa".getBytes, "cam-1"),
    (2L, "audio", "fake-wav-bytes".getBytes, "mic-7"),
    (3L, "video", ("x" * 300).getBytes, "cam-2"))
    .toDF("media_id", "media_type", "payload", "source")

  test("resizeStub: code-point cap, multibyte-safe, short payloads untouched") {
    val mb = Seq(
      (1L, "text", ("é" * 300).getBytes("UTF-8"), "src"), // 300 cps, 600 bytes
      (2L, "text", "tiny".getBytes("UTF-8"), "src"))
      .toDF("media_id", "media_type", "payload", "source")
    val out = Multimodal.resizeStub(mb, targetW = 16, targetH = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).width === 16 && out(1L).height === 16)
    // 256 code points kept = 512 bytes (never a split multibyte char)
    assert(out(1L).payload.length === 512)
    assert(new String(out(1L).payload, "UTF-8") === "é" * 256)
    assert(new String(out(2L).payload, "UTF-8") === "tiny")
  }

  test("withMetadata: size/checksum/source derived in-scan") {
    val m = Multimodal.withMetadata(media).select("media_id", "meta.*").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("size_bytes"), r.getAs[String]("checksum"), r.getAs[String]("source"))).toMap
    assert(m(1L)._1 === 31L)
    assert(m(1L)._2.length === 32) // md5 hex
    assert(m(2L)._3 === "mic-7")
  }

  test("decodeFeatures: deterministic, one record per media row, 8-dim features") {
    val feats = Multimodal.decodeFeatures(media, Multimodal.StubDecoder).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.feature.length === 8))
    // determinism: same payload -> same features
    val again = Multimodal.decodeFeatures(media, Multimodal.StubDecoder).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a == b || a.feature.sameElements(b.feature) })
  }

  test("sampleFrames: explode covers the payload in byte-range steps") {
    val frames = Multimodal.sampleFrames(media.where("media_id = 3"), everyNBytes = 64)
    assert(frames.count() === 5) // ceil(300/64) = 5 frames (0..4)
    val lens = frames.select(length(col("frame_bytes")).as("l"))
      .collect().map(_.getInt(0)).sorted
    assert(lens.toSeq === Seq(44, 64, 64, 64, 64)) // last partial frame
  }
}
