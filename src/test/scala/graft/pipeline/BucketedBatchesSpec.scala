package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Packing.bucketedBatches]] — dynamic batching coordinates:
  * bucket boundaries, full-batch structure (every batch full except
  * at most one trailing partial per bucket), window-form rank
  * equivalence, and partitioning determinism.
  */
class BucketedBatchesSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("bucket = n_tokens div width; every doc lands in exactly one slot") {
    val df = docsOf(Seq(1, 5, 9, 10, 15, 19, 20, 25))
    val out = Packing.bucketedBatches(df, bucketWidth = 10, batchSize = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"),
        r.getAs[Long]("batch_id"), r.getAs[Long]("slot")))
    assert(out.length === 8)
    val byId = out.map(x => x._1 -> x._2).toMap
    assert(byId(0L) === 0L && byId(2L) === 0L) // 1, 9 tokens
    assert(byId(3L) === 1L && byId(5L) === 1L) // 10, 19
    assert(byId(6L) === 2L && byId(7L) === 2L) // 20, 25
    assert(out.forall(x => x._4 >= 0 && x._4 < 2))
  }

  test("every batch is full except at most one trailing partial per bucket") {
    val df = docsOf(Seq.fill(23)(7) ++ Seq.fill(10)(30)) // bucket 0: 23, bucket 3: 10
    val sizes = Packing.bucketedBatches(df, bucketWidth = 10, batchSize = 4)
      .groupBy($"bucket", $"batch_id").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    sizes.groupBy(_._1).foreach { case (bucket, batches) =>
      val partials = batches.filter(_._3 < 4)
      assert(partials.length <= 1, s"bucket $bucket: $batches")
      // the partial, if any, is the LAST batch of its bucket
      partials.foreach { p =>
        assert(p._2 === batches.map(_._2).max, s"bucket $bucket: $batches")
      }
    }
    // 23 docs / 4 -> 6 batches in bucket 0; 10 / 4 -> 3 in bucket 3
    assert(sizes.count(_._1 == 0L) === 6)
    assert(sizes.count(_._1 == 3L) === 3)
  }

  test("ranks equal the per-bucket window form; deterministic across partitionings") {
    val df = docsOf((1 to 120).map(i => i % 35 + 1))
    def run(parts: Int) =
      Packing.bucketedBatches(df.repartition(parts), 10, 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id"),
            r.getAs[Long]("slot")))).toMap
    val got = run(1)
    assert(got === run(7))
    import org.apache.spark.sql.expressions.Window
    val base = df.select($"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"))
      .withColumn("bucket", expr("n_tokens div CAST(10 AS BIGINT)"))
      .withColumn("u", Sampling.uniform($"doc_id", "batch"))
    val w = Window.partitionBy($"bucket").orderBy($"u".asc, $"doc_id".asc)
    val expected = base.withColumn("rr", row_number().over(w) - 1)
      .select($"doc_id", $"bucket",
        expr("rr div CAST(4 AS BIGINT)").as("batch_id"),
        ($"rr" % 4).cast("long").as("slot"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id"),
          r.getAs[Long]("slot")))).toMap
    assert(got === expected)
  }

  test("passthrough columns survive; coordinate-name collisions are rejected loudly") {
    // provenance rides through untouched
    val df = Seq((1L, 5L, "web"), (2L, 7L, "book"))
      .toDF("doc_id", "toks", "source")
    val out = Packing.bucketedBatchesFromCounts(df, 10, 2, "doc_id", "toks")
    assert(out.columns.contains("source"))
    assert(out.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      === Map(1L -> "web", 2L -> "book"))
    // an input column named like an output coordinate would be
    // silently overwritten — must throw instead
    for (bad <- Seq("bucket", "batch_id", "slot")) {
      val clash = df.withColumn(bad, lit(9L))
      val e = intercept[IllegalArgumentException] {
        Packing.bucketedBatchesFromCounts(clash, 10, 2, "doc_id", "toks")
      }
      assert(e.getMessage.contains(bad))
    }
    intercept[IllegalArgumentException] {
      Packing.bucketedBatchesFromCounts(
        df.withColumn("__bb_u", lit(1)), 10, 2, "doc_id", "toks")
    }
  }
}
