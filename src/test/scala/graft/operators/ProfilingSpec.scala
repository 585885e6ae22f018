package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Profiling.histogram]]/[[Profiling.profile]]: bin math, edge
  * clamping, null handling, sketch-vs-exact agreement below k,
  * single-aggregate plan.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: bin assignment, clamping at both edges, nulls dropped") {
    val df = Seq[Option[Long]](Some(-50L), Some(0L), Some(5L), Some(10L),
      Some(19L), Some(20L), Some(99L), None).toDF("v")
    val got = Profiling.histogram(df, "v", lo = 0L, hi = 20L, nBins = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // bins: [0,10) and [10,20); -50 clamps to bin 0; 20 and 99 clamp to bin 1
    assert(got(0L) === ((0L, 10L, 3L)))  // -50, 0, 5
    assert(got(1L) === ((10L, 20L, 4L))) // 10, 19, 20, 99
  }

  test("histogram counts conserve non-null rows") {
    val df = (1L to 1000L).map(i => (i * 7919L) % 1000L).toDF("v")
    val total = Profiling.histogram(df, "v", 0L, 1000L, 10)
      .agg(sum("n")).head().getLong(0)
    assert(total === 1000L)
  }

  test("profile: nulls, exact distinct, and estimate == exact below k") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("a")), (4L, None)
    ).toDF("id", "s")
    val got = Profiling.profile(df, Seq("id", "s"), k = 16)
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))
      }.toMap
    assert(got("id") === ((4L, 0L, 4.0, 4L)))
    assert(got("s") === ((4L, 1L, 2.0, 2L))) // null not a distinct value
  }

  test("profile runs as ONE aggregate scan (no per-column jobs)") {
    withNoAqe {
      val df = (1L to 100L).map(i => (i, s"v${i % 7}")).toDF("a", "b")
      val plan = Profiling.profile(df, Seq("a", "b"), k = 8, withExact = false)
        .queryExecution.executedPlan.toString
      // without exact distinct there is no Expand; one aggregate pair
      assert(!plan.contains("Expand ["), s"unexpected Expand:\n$plan")
      val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
      assert(scans === 1, s"expected one scan, plan:\n$plan")
    }
  }
}
