package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Snapshots

/** Failure semantics of the online drift monitor: replay idempotence
  * (rows AND state chain), convergence to exactly zero when the
  * stream reproduces the reference, version pruning, and the
  * stale-chain refusal.
  */
class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (0 until 30).map { i =>
    (i.toLong, (0 until 8).map(j =>
      Seq("alpha", "beta", "gamma", "delta")((i + j) % 4)).mkString(" "))
  }.toDF("doc_id", "text")

  private def scaffold(tag: String): (String, String, String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-sdrift-$tag").toString
    val ref = s"$d/ref"
    Snapshots.bucketTotals(corpus).write.parquet(ref)
    (ref, s"$d/state", s"$d/out")
  }

  private def outRows(out: String) =
    spark.read.parquet(out)
      .select(col("batch").cast("long"), col("n_cur_feats"),
        col("js_divergence"), col("tv_distance"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet

  test("replaying a committed batch leaves rows and state chain unchanged; full stream converges to exact zero") {
    val (ref, state, out) = scaffold("replay")
    val b0 = corpus.where(col("doc_id") % 2 === 0)
    val b1 = corpus.where(col("doc_id") % 2 === 1)
    StreamingDrift.processBatch(b0, 0L, ref, state, out, 256)
    val afterB0 = outRows(out)
    // crash-replay of batch 0 (version already committed)
    StreamingDrift.processBatch(b0, 0L, ref, state, out, 256)
    assert(outRows(out) === afterB0, "replay changed the sink rows")
    StreamingDrift.processBatch(b1, 1L, ref, state, out, 256)
    val rows = outRows(out).map { case (b, n, js, tv) => b -> ((n, js, tv)) }.toMap
    // cumulative after batch 1 IS the reference: exactly zero drift —
    // a double-counted replay or a leaking accumulator breaks this
    assert(rows(1L)._2 === 0.0 && rows(1L)._3 === 0.0,
      s"convergence not exact: ${rows(1L)}")
    assert(rows(0L)._2 > 0.0 || rows(0L)._3 >= 0.0) // partial prefix measured
  }

  test("version chain stays bounded: batchId-2 and older are pruned") {
    val (ref, state, out) = scaffold("prune")
    (0L to 4L).foreach { b =>
      StreamingDrift.processBatch(
        corpus.where(col("doc_id") % 5 === b), b, ref, state, out, 256)
    }
    val live = (0L to 4L).filter(v =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(StreamingDrift.versionPath(state, v))))
    assert(live === Seq(3L, 4L), s"chain not pruned: $live")
  }

  test("a stale state chain from a previous run is refused, not silently reused") {
    val (ref, state, out) = scaffold("stale")
    StreamingDrift.processBatch(corpus, 0L, ref, state, out, 256)
    // simulate a fresh checkpoint over the same artifacts: new run's
    // batch 0 arrives but this run never wrote out/batch=0
    val out2 = out + "_freshrun"
    intercept[IllegalStateException] {
      StreamingDrift.processBatch(corpus, 0L, ref, state, out2, 256)
    }
  }
}
