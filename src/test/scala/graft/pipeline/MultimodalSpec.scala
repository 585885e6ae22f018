package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two decoder modes behind one seam: the deterministic md5 stub
  * (oracle mode — its output is FROZEN; mm01-mm04 hash against it) and
  * the REAL javax.imageio codec (PNG decode, NN resample, re-encode —
  * mm05/mm06 hash its channel sums). Plus the distributed plumbing:
  * schema, metadata derivation, per-partition decode shape, frame
  * explode.
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

  test("StubDecoder output is frozen (oracle mode must never drift)") {
    // hardcoded from md5("graft-stub-fixture") = ca8c86bf... — if this
    // fails, the mm01-mm04 gates' oracle SQL no longer matches the stub
    val d = Multimodal.StubDecoder.decode(7L, "graft-stub-fixture".getBytes("UTF-8"))
    assert(d.media_id === 7L)
    assert(d.width === 218 && d.height === 156 && d.n_frames === 3)
    val nibs = Seq(8, 6, 11, 15, 10, 11, 11, 14)
    d.feature.zip(nibs).foreach { case (f, n) => assert(f === n / 15.0f) }
  }

  test("ImageIoDecoder: real PNG round trip with exact channel sums") {
    // 3x2 image, hand-set pixels — sums computable by eye
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq( // (x, y, r, g, b)
      (0, 0, 10, 20, 30), (1, 0, 40, 50, 60), (2, 0, 70, 80, 90),
      (0, 1, 5, 6, 7), (1, 1, 255, 0, 128), (2, 1, 1, 2, 3))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.ImageIoDecoder.decode(1L, bos.toByteArray)
    assert(d.width === 3 && d.height === 2 && d.n_frames === 1)
    assert(d.feature.toSeq === Seq[Float](
      px.map(_._3).sum.toFloat, px.map(_._4).sum.toFloat,
      px.map(_._5).sum.toFloat, 6.0f))
  }

  test("ImageIoDecoder: undecodable payloads quarantine instead of throwing") {
    for (bad <- Seq(null, Array.emptyByteArray, "not an image".getBytes,
        Multimodal.syntheticPng(1L, 4, 4).take(10))) { // truncated PNG
      val d = Multimodal.ImageIoDecoder.decode(9L, bad)
      assert(d.width === 0 && d.height === 0 && d.n_frames === 0 &&
        d.feature.isEmpty, s"payload ${Option(bad).map(_.length)} not quarantined")
    }
  }

  test("syntheticPng decodes to its defining formulas (PNG is lossless)") {
    val (seed, w, h) = (42L, 9, 7)
    val d = Multimodal.ImageIoDecoder.decode(seed, Multimodal.syntheticPng(seed, w, h))
    assert(d.width === w && d.height === h)
    def sum(f: (Int, Int) => Long): Long =
      (for (y <- 0 until h; x <- 0 until w) yield f(x, y)).sum
    assert(d.feature(0).toLong === sum((x, y) => (seed * 7 + x * 3 + y * 5) % 256))
    assert(d.feature(1).toLong === sum((x, y) => (seed * 11 + x + y * 2) % 256))
    assert(d.feature(2).toLong === sum((x, y) => (seed * 13 + x * 2 + y) % 256))
  }

  test("resizeImage: nearest-neighbor integer mapping, both directions, quarantine") {
    val spark2 = spark
    import spark2.implicits._
    val (seed, w, h) = (5L, 8, 6)
    val media = Seq((0L, Multimodal.syntheticPng(seed, w, h)),
      (1L, "garbage".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.resizeImage(media, targetW = 3, targetH = 12)
      .collect().map(r => r.media_id -> r).toMap
    // quarantined row
    assert(out(1L).width === 0 && out(1L).payload.isEmpty)
    // re-decode the resized PNG and check every pixel against the
    // mapping src(x*w/W, y*h/H) applied to the synthetic formulas
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0L).payload))
    assert(img.getWidth === 3 && img.getHeight === 12)
    for (y <- 0 until 12; x <- 0 until 3) {
      val sx = x * w / 3; val sy = y * h / 12
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xFF) === ((seed * 7 + sx * 3 + sy * 5) % 256).toInt, s"r@($x,$y)")
      assert(((p >> 8) & 0xFF) === ((seed * 11 + sx + sy * 2) % 256).toInt, s"g@($x,$y)")
      assert((p & 0xFF) === ((seed * 13 + sx * 2 + sy) % 256).toInt, s"b@($x,$y)")
    }
  }

  test("ImageIoDecoder: JPEG round trip — exact dims, lossy channel sums within tolerance") {
    val spark2 = spark
    import spark2.implicits._
    // same fixture, both codec branches; JPEG must preserve the
    // decoded geometry exactly and the pixel content approximately
    val seeds = Seq(1L, 2L, 3L, 9L, 42L)
    val media = seeds.map(id =>
      (id, Multimodal.syntheticJpeg(id, w = 8 + (id % 8).toInt, h = 8 + (id % 5).toInt)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeFeatures(media, Multimodal.ImageIoDecoder)
      .collect().map(d => d.media_id -> d).toMap
    seeds.foreach { id =>
      val d = out(id)
      val (w, h) = (8 + (id % 8).toInt, 8 + (id % 5).toInt)
      assert(d.width === w && d.height === h && d.n_frames === 1,
        s"JPEG geometry drifted for seed $id")
      // exact sums from the generator formulas (what PNG would give)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        er += ((id * 7 + x * 3 + y * 5) % 256).toInt
        eg += ((id * 11 + x + y * 2) % 256).toInt
        eb += ((id * 13 + x * 2 + y) % 256).toInt
      }
      val n = (w * h).toDouble
      // high-frequency noise is JPEG's worst case; the MEAN channel
      // level still survives — bound the per-pixel mean drift
      Seq((d.feature(0), er, "r"), (d.feature(1), eg, "g"),
        (d.feature(2), eb, "b")).foreach { case (got, exact, c) =>
        val drift = math.abs(got - exact) / n
        assert(drift <= 48.0,
          s"JPEG mean $c drift $drift for seed $id (got $got, exact $exact)")
      }
    }
  }

  test("resizeImage jpg: exact dims, channel sums within the double-lossy tolerance") {
    val spark2 = spark
    import spark2.implicits._
    // the mm08 contract: JPEG in -> resample -> JPEG out -> decode.
    // Geometry exact; per-pixel mean drift bounded (two lossy trips,
    // so the bound is looser than the single-trip JPEG test's).
    val seeds = Seq(1L, 2L, 3L, 9L, 42L)
    val media = seeds.map(id =>
      (id, Multimodal.syntheticJpeg(id, w = 8 + (id % 8).toInt, h = 8 + (id % 5).toInt)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeFeatures(
      Multimodal.resizeImage(media, 12, 12, format = "jpg").toDF(),
      Multimodal.ImageIoDecoder)
      .collect().map(d => d.media_id -> d).toMap
    seeds.foreach { id =>
      val d = out(id)
      assert(d.width === 12 && d.height === 12 && d.n_frames === 1,
        s"resized-JPEG geometry drifted for seed $id")
      // exact nearest-neighbor sums from the generator formulas
      val (w, h) = (8 + (id % 8).toInt, 8 + (id % 5).toInt)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until 12; x <- 0 until 12) {
        val sx = x * w / 12; val sy = y * h / 12
        er += ((id * 7 + sx * 3 + sy * 5) % 256).toInt
        eg += ((id * 11 + sx + sy * 2) % 256).toInt
        eb += ((id * 13 + sx * 2 + sy) % 256).toInt
      }
      Seq((d.feature(0), er, "r"), (d.feature(1), eg, "g"),
        (d.feature(2), eb, "b")).foreach { case (got, exact, c) =>
        val drift = math.abs(got - exact) / 144.0
        assert(drift <= 64.0,
          s"resized-JPEG mean $c drift $drift for seed $id (got $got, exact $exact)")
      }
    }
  }

  test("pixelSignatures: PNG/BMP transcodes share pixel_md5 and EXACT dhash; classes separate") {
    val rows = Seq(
      (1L, Multimodal.syntheticPng(7L, 16, 12)),
      (2L, Multimodal.syntheticBmp(7L, 16, 12)), // same pixels, other bytes
      (3L, Multimodal.syntheticPng(8L, 16, 12)), // different pattern
      (4L, Array.empty[Byte]), // undecodable -> quarantine
      (5L, "not an image".getBytes)).toDF("media_id", "payload")
    val sig = Multimodal.pixelSignatures(rows).collect()
      .map(s => s.media_id -> s).toMap
    // transcode pair: different payload bytes, identical content
    assert(!java.util.Arrays.equals(
      Multimodal.syntheticPng(7L, 16, 12), Multimodal.syntheticBmp(7L, 16, 12)))
    assert(sig(1L).pixel_md5 === sig(2L).pixel_md5)
    assert(sig(1L).dhash === sig(2L).dhash)
    // distinct pattern: different content hash (and overwhelmingly
    // a different perceptual hash on these gradient fixtures)
    assert(sig(3L).pixel_md5 !== sig(1L).pixel_md5)
    // quarantine: width 0, empty md5, excluded from dedup
    assert(sig(4L).width === 0 && sig(4L).pixel_md5 === "")
    assert(sig(5L).width === 0)
    val groups = Multimodal.dedupByPixelHash(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("group_rep")).toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("dhash is perceptually stable across a lossy JPEG trip (small Hamming drift)") {
    // the near-dup promise: JPEG noise may flip sign bits only where
    // adjacent luminances nearly tie. Block fixtures with STRUCTURE
    // (4x4 blocks at 0/255, one block per dHash sample cell) pin both
    // halves of the contract: same pattern re-encoded lossily stays
    // within a few bits; a sign-inverted pattern lands ~64 bits away.
    // (The gradient fixtures of the oracle gates are the DEGENERATE
    // case here — monotone rows hash to all-ones for every seed — so
    // perceptual separation needs structured fixtures, not seeds.)
    def block(bits: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(36, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val v = 255 * bits(x / 4, y / 4)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val checker: (Int, Int) => Int = (bx, by) => (bx + by) % 2
    val inverse: (Int, Int) => Int = (bx, by) => 1 - (bx + by) % 2
    val rows = Seq(
      (1L, enc(block(checker), "png")),
      (2L, enc(block(checker), "jpg")),
      (3L, enc(block(inverse), "png")),
      (4L, enc(block(inverse), "jpg"))).toDF("media_id", "payload")
    val sig = Multimodal.pixelSignatures(rows).collect()
      .map(s => s.media_id -> s.dhash).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) <= 6,
      s"checker PNG vs JPEG drifted ${hamming(sig(1L), sig(2L))} bits")
    assert(hamming(sig(3L), sig(4L)) <= 6,
      s"inverse PNG vs JPEG drifted ${hamming(sig(3L), sig(4L))} bits")
    assert(hamming(sig(1L), sig(3L)) >= 48,
      s"inverted pattern too close: ${hamming(sig(1L), sig(3L))} bits")
  }

  test("parseWav: synthetic WAV round-trips to formula-exact statistics") {
    Seq(0L, 7L, 42L, 99L, 12345L).foreach { seed =>
      val f = Multimodal.parseWav(seed, Multimodal.syntheticWav(seed))
      val n = (400 + java.lang.Math.floorMod(seed, 100L)).toInt
      var peak = 0L; var ssq = 0L
      (0 until n).foreach { i =>
        val s = java.lang.Math.floorMod(seed * 31 + i.toLong * 17, 65536L) - 32768L
        peak = math.max(peak, math.abs(s)); ssq += s * s
      }
      assert(f === Multimodal.AudioFeatures(seed, n.toLong, 8000,
        n.toLong * 1000 / 8000, peak, ssq), s"seed $seed")
    }
  }

  test("parseWav: chunk walk survives extra chunks; malformed payloads quarantine") {
    val base = Multimodal.syntheticWav(5L)
    // splice a LIST chunk (9 bytes payload -> word-aligned to 10)
    // between fmt and data: a fixed-offset parser would misread it
    val listChunk = java.nio.ByteBuffer.allocate(8 + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(9)
      .put(Array.fill[Byte](10)(0x55)).array()
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val f = Multimodal.parseWav(5L, spliced)
    assert(f === Multimodal.parseWav(5L, base).copy(media_id = 5L),
      "extra chunk must not change decoded statistics")

    val q = Multimodal.AudioFeatures(9L, 0L, 0, 0L, 0L, 0L)
    assert(Multimodal.parseWav(9L, null) === q)
    assert(Multimodal.parseWav(9L, "RIFFxxxx".getBytes) === q)
    assert(Multimodal.parseWav(9L, base.take(30)) === q, "truncated header")
    // stereo is out of contract -> quarantine, not garbage stats
    val stereo = base.clone()
    java.nio.ByteBuffer.wrap(stereo)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(22, 2)
    assert(Multimodal.parseWav(9L, stereo) === q)
    // non-PCM format code
    val alaw = base.clone()
    java.nio.ByteBuffer.wrap(alaw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(20, 6)
    assert(Multimodal.parseWav(9L, alaw) === q)
  }

  test("audioSegments: hand-derived merge incl. region/window misalignment and partial tail") {
    // seed 0: n=960 (12 windows), regions 0/3/6 silent ->
    // windows {0},{5},{9} fully silent, boundary windows voiced;
    // segments alternate starting silent, 6 total, 10 ms per window
    val m0 = Seq((0L, Multimodal.syntheticSpeechWav(0L)))
      .toDF("media_id", "payload")
    val segs0 = Multimodal.audioSegments(m0).collect().sortBy(_.seg_idx)
    assert(segs0.map(s => (s.seg_idx, s.silent, s.start_ms, s.end_ms)).toSeq ===
      Seq((1, true, 0L, 10L), (2, false, 10L, 50L), (3, true, 50L, 60L),
        (4, false, 60L, 90L), (5, true, 90L, 100L), (6, false, 100L, 120L)))
    assert(segs0.filter(_.silent).forall(_.energy === 0L))
    assert(segs0.map(_.n_windows).sum === 12L)

    // seed 1: n=1080 -> 14 windows, last only 40 samples; region 8
    // ([960,1080)) is silent, so the tail segment is silent and its
    // end time is the TRUE sample end (135 ms), not a window multiple
    val m1 = Seq((1L, Multimodal.syntheticSpeechWav(1L)))
      .toDF("media_id", "payload")
    val segs1 = Multimodal.audioSegments(m1).collect().sortBy(_.seg_idx)
    val last = segs1.last
    assert(last.silent && last.end_ms === 135L && last.energy === 0L)
    assert(segs1.map(_.n_windows).sum === 14L)

    // undecodable payloads emit NO segments (features is the
    // quarantine reporter)
    val junk = Seq((9L, "not audio".getBytes)).toDF("media_id", "payload")
    assert(Multimodal.audioSegments(junk).count() === 0L)
  }

  test("extractFrames: container walk, torn tail keeps leading frames, junk empty") {
    val f0 = Multimodal.syntheticJpeg(1L, 8, 8)
    val f1 = Multimodal.syntheticJpeg(2L, 9, 10)
    def container(frames: Array[Byte]*): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(frames.map(4 + _.length).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array()
    }
    val good = container(f0, f1)
    // torn: second frame's declared length overruns the payload
    val torn = good.take(4 + f0.length + 4 + f1.length / 2)
    val rows = Seq((1L, good), (2L, torn), (3L, "junk".getBytes),
      (4L, Array.empty[Byte]))
      .toDF("media_id", "payload")
    val got = Multimodal.extractFrames(rows).collect()
      .groupBy(_.media_id).map { case (k, v) => k -> v.map(_.frame_idx).sorted.toSeq }
    assert(got === Map(1L -> Seq(0, 1), 2L -> Seq(0)))
    // extracted frames are the original bytes (decodable downstream)
    val frame1 = Multimodal.extractFrames(rows).collect()
      .find(f => f.media_id == 1L && f.frame_idx == 1).get
    assert(java.util.Arrays.equals(frame1.frame_payload, f1))
  }

  test("mediaCurationReport: dedup before resize, exact stage yields") {
    // 6 media, 2 content classes (PNG+BMP transcodes), 1 junk:
    // raw 7, decoded 6, content_deduped 2, resized 2
    val rows = Seq(
      (1L, Multimodal.syntheticPng(7L, 10, 10)),
      (2L, Multimodal.syntheticBmp(7L, 10, 10)),
      (3L, Multimodal.syntheticPng(7L, 10, 10)),
      (4L, Multimodal.syntheticPng(8L, 6, 4)),
      (5L, Multimodal.syntheticBmp(8L, 6, 4)),
      (6L, Multimodal.syntheticBmp(8L, 6, 4)),
      (9L, "junk".getBytes)).toDF("media_id", "payload")
    val rep = Multimodal.mediaCurationReport(rows, 3, 3).collect()
      .map(r => r.getAs[Int]("stage_order") ->
        (r.getAs[String]("stage"), r.getAs[Long]("n_media"),
          Option(r.get(r.fieldIndex("n_pixels"))).map(_.asInstanceOf[Long])))
      .toMap
    assert(rep(1) === (("raw", 7L, None)))
    assert(rep(2) === (("decoded", 6L, Some(100L * 3 + 24L * 3))))
    assert(rep(3) === (("content_deduped", 2L, Some(124L))))
    assert(rep(4) === (("resized", 2L, Some(18L))))
  }

  test("sampleFrames: explode covers the payload in byte-range steps") {
    val frames = Multimodal.sampleFrames(media.where("media_id = 3"), everyNBytes = 64)
    assert(frames.count() === 5) // ceil(300/64) = 5 frames (0..4)
    val lens = frames.select(length(col("frame_bytes")).as("l"))
      .collect().map(_.getInt(0)).sorted
    assert(lens.toSeq === Seq(44, 64, 64, 64, 64)) // last partial frame
  }

  test("pairCuration: alignment, caption quality, dedup, quarantine verdicts") {
    import spark.implicits._
    // 1: clean keeper; 2: same pixels as 1 (PNG vs BMP transcode) →
    // deduped away; 3: caption claims wrong dims; 4: junk caption;
    // 5: undecodable payload; 6: different image, clean → second keeper
    val rows = Seq(
      (1L, Multimodal.syntheticPng(9L, 8, 9), "a photo of thing size 8x9"),
      (2L, Multimodal.syntheticBmp(9L, 8, 9), "the same thing again 8x9 yes"),
      (3L, Multimodal.syntheticPng(9L, 8, 9), "a photo of thing size 9x9"),
      (4L, Multimodal.syntheticPng(9L, 8, 9), "8x9"),
      (5L, Array[Byte](1, 2, 3), "a broken payload claiming 8x9 here"),
      (6L, Multimodal.syntheticPng(7L, 10, 8), "another subject entirely 10x8 ok"))
      .toDF("pair_id", "payload", "caption")
    val got = Multimodal.pairCuration(rows, minCaptionTokens = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    assert(got(1L) === ((8, 9, 6L, true, true, true)))
    assert(got(2L) === ((8, 9, 6L, true, true, false))) // dup content loses
    assert(got(3L) === ((8, 9, 6L, false, true, false))) // claim mismatch
    assert(got(4L) === ((8, 9, 1L, true, false, false))) // junk caption
    assert(got(5L) === ((0, 0, 6L, false, true, false))) // quarantined
    assert(got(6L) === ((10, 8, 5L, true, true, true)))
  }

  test("pairCuration: no caption dims claim fails alignment; keeper is min id") {
    import spark.implicits._
    val rows = Seq(
      (10L, Multimodal.syntheticPng(3L, 9, 8), "no dimensions mentioned at all"),
      (12L, Multimodal.syntheticPng(3L, 9, 8), "duplicate content pair 9x8 v2"),
      (11L, Multimodal.syntheticPng(3L, 9, 8), "duplicate content pair 9x8 v1"))
      .toDF("pair_id", "payload", "caption")
    val got = Multimodal.pairCuration(rows).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(6)))).toMap
    assert(got(10L) === ((false, false))) // no \d+x\d+ token anywhere
    assert(got(11L) === ((true, true))) // min SURVIVING id wins …
    assert(got(12L) === ((true, false))) // … not the min raw id
  }

  test("pairCuration: NULL caption fails quality with a non-null verdict") {
    import spark.implicits._
    val rows = Seq(
      (20L, Multimodal.syntheticPng(5L, 8, 8), Option("fine caption here 8x8")),
      (21L, Multimodal.syntheticPng(6L, 8, 8), Option.empty[String]))
      .toDF("pair_id", "payload", "caption")
    val got = Multimodal.pairCuration(rows).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    assert(got(21L) === ((0L, false, false, false)))
    assert(got(20L) === ((4L, true, true, true)))
  }
}
