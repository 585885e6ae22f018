package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bounded-state approximate grouped quantiles
  * ([[Sampling.sampleQuantiles]]): exactness when the sample covers
  * the group, bounded rank error when it doesn't, and partitioning
  * invariance (the determinism contract).
  */
class SampleQuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("a group smaller than k is sampled whole: quantiles are exact") {
    // values 0..9 in one group; k=64 >> 10 => lower-interpolated
    // exact quantiles of the full data
    val df = (0 until 10).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "key", "v")
    val r = Sampling.sampleQuantiles(df, "grp", "v", "key",
      k = 64, qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)).collect().head
    assert(r.getAs[Long]("n_sample") === 10L)
    assert(r.getAs[Double]("p0") === 0.0) // floor(0*(n-1)) = index 0
    assert(r.getAs[Double]("p25") === 2.0) // floor(0.25*9)=2
    assert(r.getAs[Double]("p50") === 4.0) // floor(0.5*9)=4
    assert(r.getAs[Double]("p90") === 8.0) // floor(0.9*9)=8
    assert(r.getAs[Double]("p100") === 9.0) // floor(1*9)=9
  }

  test("large group: estimates land within the sampling rank-error bound") {
    // 20k uniform values: the k=256 reservoir's median estimate has
    // rank-error sd ~ sqrt(.25/256) ~ 3.1%; assert a generous 5-sd
    // band so the test is deterministic-in-practice (the sample IS
    // deterministic — md5 — so this can only fail if the operator
    // changes)
    val n = 20000
    val df = (0 until n).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "key", "v")
    val r = Sampling.sampleQuantiles(df, "grp", "v", "key",
      k = 256, qs = Seq(0.25, 0.5, 0.9)).collect().head
    assert(r.getAs[Long]("n_sample") === 256L)
    def rankOf(v: Double) = v / n // values ARE their rank here
    assert(math.abs(rankOf(r.getAs[Double]("p25")) - 0.25) < 0.16)
    assert(math.abs(rankOf(r.getAs[Double]("p50")) - 0.5) < 0.16)
    assert(math.abs(rankOf(r.getAs[Double]("p90")) - 0.9) < 0.16)
  }

  test("result is invariant under repartitioning (mergeable reservoir)") {
    val df = (0 until 5000).map(i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, (i * 37 % 1000).toDouble))
      .toDF("grp", "key", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.sampleQuantiles(d, "grp", "v", "key", k = 64,
        qs = Seq(0.5, 0.9)).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    assert(run(df) === run(df.repartition(13)))
    assert(run(df) === run(df.coalesce(1)))
  }

  test("every emitted quantile is an actual data value of its group") {
    val df = (0 until 1000).map(i =>
      ("g" + (i % 4), i.toLong, math.sin(i).abs * 100)).toDF("grp", "key", "v")
    val byGroup = df.collect().map(r => (r.getString(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Sampling.sampleQuantiles(df, "grp", "v", "key", k = 32,
      qs = Seq(0.25, 0.5, 0.9)).collect().foreach { r =>
      val vals = byGroup(r.getString(0))
      Seq("p25", "p50", "p90").foreach(c =>
        assert(vals.contains(r.getAs[Double](c)), s"$c not a data value"))
    }
  }
}
