package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("hashedFeatureCounts: unigrams + bigrams, short/empty docs") {
    val df = Seq(
      (1L, "alpha beta gamma"), // 3 uni + 2 bi = 5 features
      (2L, "solo"),             // 1 uni, 0 bi
      (3L, "   "),              // no tokens -> no rows
      (4L, "x x x x"))          // repeats collapse into counts
      .toDF("doc_id", "text")
    val counts = Dsir.hashedFeatureCounts(df, buckets = 64)
      .groupBy("doc_id").agg(sum("c").as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) === 5L)
    assert(counts(2L) === 1L)
    assert(!counts.contains(3L))
    assert(counts(4L) === 7L) // 4 unigrams + 3 bigrams
  }

  test("target == raw gives log_weight exactly 0 for every doc") {
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "a a a")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(df, df, buckets = 32).collect()
    assert(w.length === 3)
    // identical counts on both sides -> every bucket ratio is exactly
    // 1 -> ln is exactly 0.0, no float tolerance needed
    assert(w.forall(_.getDouble(2) === 0.0), w.mkString(","))
  }

  test("on-target docs outweigh off-target docs; empty docs score 0") {
    val raw = Seq(
      (1L, "aaa aaa aaa aaa"),
      (2L, "zzz zzz zzz zzz"),
      (3L, "")).toDF("doc_id", "text")
    val target = Seq((100L, "aaa aaa aaa aaa aaa aaa")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, buckets = 128)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._2 > w(2L)._2,
      s"target-matching doc should outweigh off-target: $w")
    assert(w(3L) === ((0L, 0.0)))
    assert(w(1L)._1 === 7L)
  }

  test("weights are partitioning-invariant") {
    val raw = (0L until 200L)
      .map(i => (i, if (i % 3 == 0) "spark shuffle hash join" else "row scan table value"))
      .toDF("doc_id", "text")
    val target = raw.where(col("doc_id") % 3 === 0)
    // compare at 9 dp: the per-doc Σ c·δ is a float sum whose addend
    // order can shift with partitioning (the engine-wide 6-dp note);
    // everything else must match exactly
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    val a = canon(Dsir.importanceWeights(raw, target, buckets = 64))
    val b = canon(Dsir.importanceWeights(
      raw.repartition(13), target.repartition(7), buckets = 64))
    assert(a === b)
  }

  test("resampleTopN: deterministic, exactly n, weight-responsive") {
    val raw = (0L until 300L)
      .map(i => (i, if (i < 10) "needle needle needle needle needle"
                    else s"hay stack row col val num tok ${i % 7} ${i % 11} ${i % 13}"))
      .toDF("doc_id", "text")
    val target = Seq((999L, "needle needle needle")).toDF("doc_id", "text")
    val weighted = Dsir.importanceWeights(raw, target, buckets = 256)
    val picked = Dsir.resampleTopN(weighted, n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size === 10)
    // 19-feature hay docs sit ~60 nats below the 9-feature needle
    // docs; Gumbel noise on the (h+0.5)/2^32 grid is bounded to
    // [-ln(ln(2^33)), ln(2^33)] ~ [-3.2, +22.9], so no draw can
    // close the gap — the selection must be exactly the needles
    assert(picked === (0L until 10L).toSet, s"picked $picked")
    val again = Dsir.resampleTopN(weighted.repartition(11), n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again === picked)
    // a different salt may reorder hay docs but keeps needle dominance
    val salted = Dsir.resampleTopN(weighted, n = 10, salt = "v2")
      .collect().map(_.getLong(0)).toSet
    assert(salted === picked)
  }
}
