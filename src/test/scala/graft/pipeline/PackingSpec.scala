package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma"),            // 3 tokens
    (2L, "one two three four five six"), // 6
    (3L, ""),                            // 0 — zero width
    (4L, "   "),                         // 0 — whitespace-only
    (5L, "a b c d e f g h i j"),         // 10
    (6L, "lone"),                        // 1
    (7L, "w x y z"),                     // 4
    (8L, "p q"),                         // 2
    (9L, "tail end words here now"))     // 5
    .toDF("doc_id", "text")

  private def collectPacked(nShards: Int, seqLen: Int = 8) =
    Packing.packSequences(corpus, seqLen = seqLen, nShards = nShards)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_offset")))
      .toMap

  test("coordinates reconstruct a contiguous, gap-free per-shard token stream") {
    val seqLen = 8
    val packed = collectPacked(nShards = 2, seqLen = seqLen)
    assert(packed.size === 9)
    // group docs by shard, walk in id order, recompute the running
    // offset independently and compare to chunk arithmetic
    packed.toSeq.groupBy(_._2._1).foreach { case (_, docs) =>
      var running = 0L
      docs.sortBy(_._1).foreach { case (id, (_, n, chunk, off)) =>
        assert(chunk === running / seqLen, s"doc $id chunk")
        assert(off === running % seqLen, s"doc $id offset")
        running += n
      }
    }
    // zero-token docs occupy zero width: a zero-n doc and the NEXT
    // doc in its shard share the same absolute position (a phantom
    // token — e.g. tokenizing "" to [""] — would shift every
    // later doc in the shard)
    Seq(3L, 4L).foreach { zid =>
      val (zShard, n, zc, zo) = packed(zid)
      assert(n === 0L, s"doc $zid should have 0 tokens")
      packed.toSeq.filter { case (id, (s, _, _, _)) => s == zShard && id > zid }
        .sortBy(_._1).headOption.foreach { case (nid, (_, _, nc, no)) =>
          assert((zc, zo) === (nc, no),
            s"zero-width doc $zid shifted successor $nid")
        }
    }
  }

  test("deterministic across partitionings and repeated runs") {
    val a = collectPacked(nShards = 4)
    val b = Packing.packSequences(corpus.repartition(7), seqLen = 8, nShards = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_offset")))
      .toMap
    assert(a === b)
  }

  test("chunkManifest accounts for every started token exactly once") {
    val packed = Packing.packSequences(corpus, seqLen = 8, nShards = 2)
    val manifest = Packing.chunkManifest(packed).collect()
    val totalFromManifest = manifest.map(_.getAs[Long]("tokens_started")).sum
    val totalTokens = corpus
      .select(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    assert(totalFromManifest === totalTokens)
    val docsFromManifest = manifest.map(_.getAs[Long]("n_docs")).sum
    assert(docsFromManifest === 9L)
  }

  test("guards: degenerate seqLen/nShards rejected") {
    intercept[IllegalArgumentException](
      Packing.packSequences(corpus, seqLen = 0))
    intercept[IllegalArgumentException](
      Packing.packSequences(corpus, seqLen = 8, nShards = 0))
    intercept[IllegalArgumentException](
      Packing.writeShards(corpus, nShards = 0, path = "/tmp/unused"))
  }

  test("writeShards: read-back manifest accounts for every doc and token") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/export"
    val manifest = Packing.writeShards(corpus, nShards = 3, path = path).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === 9L)
    val totalTokens = corpus
      .select(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    assert(manifest.map(_.getAs[Long]("total_tokens")).sum === totalTokens)
    // shard assignment in the FILES matches shardOf: every written
    // row sits in the directory its id hashes to
    val disk = spark.read.parquet(path)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        Packing.shardOf(col("doc_id"), 3).as("expected"))
      .collect()
    assert(disk.length === 9)
    disk.foreach(r => assert(r.getAs[Long]("shard") === r.getAs[Long]("expected")))
  }

  test("writeShards: xor_h60 checksum detects a content change, overwrite is clean") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/export"
    val before = Packing.writeShards(corpus, nShards = 2, path = path).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("xor_h60")).toMap
    // identical corpus, different partitioning -> identical checksums
    // (XOR is order-independent) and no doubled rows from the overwrite
    val again = Packing.writeShards(corpus.repartition(5), nShards = 2, path = path)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("xor_h60")).toMap
    assert(before === again)
    // flip one doc's text -> exactly that doc's shard checksum changes
    val edited = corpus.withColumn("text",
      when(col("doc_id") === 6L, lit("lone EDITED")).otherwise(col("text")))
    val editedShard = Packing.writeShards(edited, nShards = 2, path = path)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("xor_h60")).toMap
    val shard6 = Packing.shardOf(lit(6L), 2)
    val s6 = corpus.select(shard6).head().getLong(0)
    assert(editedShard(s6) !== before(s6))
    assert(editedShard.filter(_._1 != s6) === before.filter(_._1 != s6))
  }

  test("writeJsonlShards: hostile text round-trips byte-exactly through the JSON escape") {
    val spark2 = spark
    import spark2.implicits._
    // every JSON escaping hazard in one corpus: quotes, backslashes,
    // newlines/tabs, control chars, non-ASCII, surrogate pairs, the
    // empty string
    val hostile = Seq(
      (0L, """he said "hello" and left"""),
      (1L, "back\\slash \\\\ double"),
      (2L, "line one\nline two\ttabbed"),
      (3L, "bell null-ish edge"),
      (4L, "café 日本語 text"),
      (5L, "emoji 😀 pair"),
      (6L, ""),
      (7L, "plain words only here")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/exp"
    val manifest = Packing.writeJsonlShards(hostile, nShards = 2, path = path)
      .collect()
    // read-back checksums equal the ORIGINAL texts' checksums — the
    // escape/decode round trip lost nothing
    val expected = hostile
      .select(Packing.shardOf(col("doc_id"), 2).as("shard"),
        graft.functions.Md5Hash.h60(col("text")).as("h60"))
      .groupBy("shard").agg(org.apache.spark.sql.functions.bit_xor(col("h60")).as("xor_h60"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("xor_h60")).toMap
    manifest.foreach { r =>
      assert(r.getAs[Long]("xor_h60") === expected(r.getAs[Long]("shard")),
        s"shard ${r.getAs[Long]("shard")} checksum drifted through JSON")
    }
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === 8L)
    // the files really are one JSON object per line (a raw newline in
    // doc 2 must have been escaped, not emitted)
    val lines = new java.io.File(path).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles.filter(_.getName.endsWith(".json")))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toList)
    assert(lines.length === 8)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")))
  }
}
