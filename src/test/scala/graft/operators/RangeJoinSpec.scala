package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RangeJoin.pointInInterval]]: containment semantics (inclusive
  * bounds), bucket-boundary spanning, key isolation, equivalence to
  * the naive inequality join, and the no-nested-loop plan proof.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 1L, 100L), (2L, 1L, 250L), (3L, 1L, 999L),
    (4L, 2L, 100L)).toDF("pid", "k", "t")

  // intervals: [50,150] and [200,1000] for key 1 (second spans many
  // 100-wide buckets); key 2 has no interval covering t=100
  private def intervals = Seq(
    (10L, 1L, 50L, 150L), (11L, 1L, 200L, 1000L),
    (12L, 2L, 500L, 600L)).toDF("iid", "k", "lo", "hi")

  private def naive = points.join(intervals, Seq("k"))
    .where(col("t") >= col("lo") && col("t") <= col("hi"))
    .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches == naive inequality join, including bucket-spanning intervals") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", bucketMicros = 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("bounds are inclusive on both ends") {
    val p = Seq((1L, 1L, 50L), (2L, 1L, 150L), (3L, 1L, 151L)).toDF("pid", "k", "t")
    val i = Seq((10L, 1L, 50L, 150L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", 7L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("bucket width does not change results (only cost)") {
    val a = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", 3L).select("pid", "iid").collect().toSet
    val b = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", 100000L).select("pid", "iid").collect().toSet
    assert(a === b)
  }

  test("plans as an equi-join — no BroadcastNestedLoopJoin, no cartesian") {
    withNoAqe {
      val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "lo", "hi", 100L).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"nested loop join:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
      val naivePlan = points.join(intervals, Seq("k"))
        .where(col("t") >= col("lo") && col("t") <= col("hi"))
        .queryExecution.executedPlan.toString
      // at this toy scale Spark broadcasts the naive join too, but the
      // binned plan must carry the bucket in its join keys
      assert(plan.contains("__b"), s"bucket not in join keys:\n$plan")
    }
  }

  test("adversarial: one interval spanning the whole axis with a tiny bucket stays correct") {
    import spark.implicits._
    val p = (0L until 50L).map(t => (t, 1L, t * 100L)).toDF("pid", "k", "t")
    val i = Seq((99L, 1L, 0L, 4900L)).toDF("iid", "k", "lo", "hi")
    // bucket 10 -> the single interval replicates into 491 buckets;
    // results must still be exact (every point matches)
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", 10L)
    assert(got.count() === 50L)
  }
}
