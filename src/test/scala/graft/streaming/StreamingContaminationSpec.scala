package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.{Contamination, Dedup}
import StreamingContamination.{ContDoc, frozenBenchmark, shingles}

/** [[StreamingContamination]] — frozen-benchmark online
  * decontamination: batch parity row-for-row, the clean-doc /
  * short-doc silence contract, micro-batch invariance (stateless),
  * and the shingle mirror.
  */
class StreamingContaminationSpec extends SparkSpec {

  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"))
  private val corpus = Seq(
    (1L, "he saw the quick brown fox jumps away fast"), // 1 shared 4-gram family
    (2L, "pack my box with five dozen liquor jugs thanks"), // heavy overlap
    (3L, "completely unrelated text with no benchmark overlap at all"),
    (4L, "tiny doc"), // < n tokens -> no shingles
    (5L, ""))

  test("stream scores equal the batch operator row-for-row") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")
    val batch = Contamination.overlap(corpusDf, benchDf, n = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_overlap"), r.getAs[Double]("contamination")))
      .sortBy(_._1)

    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val frozen = frozenBenchmark(benchDf, n = 4)
    val mem = MemoryStream[ContDoc]
    val q = StreamingContamination.scoreStream(mem.toDS(), frozen, n = 4)
      .writeStream.format("memory").queryName("cont_parity")
      .outputMode("append").start()
    // two micro-batches — stateless scoring cannot depend on the split
    mem.addData(corpus.take(2).map { case (id, t) => ContDoc(id, t) }: _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(2).map { case (id, t) => ContDoc(id, t) }: _*)
    q.processAllAvailable()
    val got = spark.table("cont_parity").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_overlap"), r.getAs[Double]("contamination")))
      .sortBy(_._1)
    q.stop()

    assert(got === batch)
    // silence contract: clean (3), short (4) and empty (5) docs
    // emitted nothing
    assert(got.map(_._1).toSet.intersect(Set(3L, 4L, 5L)).isEmpty)
    // and the overlapping docs ARE there (the fixture isn't vacuous)
    assert(got.map(_._1).toSet === Set(1L, 2L))
  }

  test("row-side shingles mirror Dedup.wordShingles exactly") {
    val df = corpus.toDF("doc_id", "text")
    val viaSpark = Dedup.wordShingles(df, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("shingle"))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    corpus.foreach { case (id, text) =>
      assert(shingles(text, 4) === viaSpark.getOrElse(id, Set.empty),
        s"doc $id")
    }
    // null text tolerated (tokenize handles it), yields no shingles
    assert(shingles(null, 4) === Set.empty)
  }

  test("exciseStream mirrors the batch excision row-for-row (one row per doc)") {
    val corpusDf = corpus.toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")
    val batch = graft.pipeline.Contamination
      .exciseOverlaps(corpusDf, benchDf, n = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))
      .sortBy(_._1)

    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val frozen = frozenBenchmark(benchDf, n = 4)
    val mem = MemoryStream[ContDoc]
    val q = StreamingContamination.exciseStream(mem.toDS(), frozen, n = 4)
      .writeStream.format("memory").queryName("exc_parity")
      .outputMode("append").start()
    mem.addData(corpus.take(3).map { case (id, t) => ContDoc(id, t) }: _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(3).map { case (id, t) => ContDoc(id, t) }: _*)
    q.processAllAvailable()
    val got = spark.table("exc_parity").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))
      .sortBy(_._1)
    q.stop()

    assert(got === batch)
    // the cleaner emits EVERY doc — including clean, short and empty
    assert(got.map(_._1).toSeq === corpus.map(_._1).sorted)
  }

  test("frozen benchmark is the DISTINCT shingle set") {
    val frozen = frozenBenchmark(bench.toDF("doc_id", "text"), n = 4)
    val expected = bench.flatMap { case (_, t) => shingles(t, 4) }.toSet
    assert(frozen === expected)
  }
}
