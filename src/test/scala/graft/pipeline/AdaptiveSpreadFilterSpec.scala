package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampling.adaptiveSpreadFilter]] + [[Sampling.topKByStratum]] —
  * the two round-10 selection operators over per-group statistics:
  * exact-bounds regime (group smaller than the reservoir), inclusive
  * boundaries, partitioning determinism, and the quality-cap's
  * window equivalence through the public entry point.
  */
class AdaptiveSpreadFilterSpec extends SparkSpec {

  import spark.implicits._

  test("small groups: bounds are the group's exact quantiles, ends inclusive") {
    // group g: values 10..19 over unique keys; k=64 >= 10 samples all,
    // so lo = p0..? loQ=0.1 -> floor(0.1*9)=0 -> vals[1]=10;
    // hiQ=0.9 -> floor(0.9*9)=8 -> vals[9]=18
    val df = (0 until 10).map(i => ("g", i.toLong, (10 + i).toLong))
      .toDF("grp", "id", "v")
    val kept = Sampling.adaptiveSpreadFilter(df, "grp", "v", "id",
      k = 64, loQ = 0.1, hiQ = 0.9, salt = "t")
    val rows = kept.select($"v", $"lo", $"hi").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, lo, hi) => lo === 10.0 && hi === 18.0 })
    // 10 and 18 themselves survive (inclusive); 19 does not
    val keptVs = rows.map(_._1).toSet
    assert(keptVs === (10L to 18L).toSet)
  }

  test("per-group bounds differ: each group filtered by its own spread") {
    val a = (0 until 10).map(i => ("a", i.toLong, i.toLong))          // 0..9
    val b = (0 until 10).map(i => ("b", 100L + i, 1000L + 10 * i))    // 1000..1090
    val df = (a ++ b).toDF("grp", "id", "v")
    val kept = Sampling.adaptiveSpreadFilter(df, "grp", "v", "id",
      k = 64, loQ = 0.0, hiQ = 1.0, salt = "t")
    // loQ=0/hiQ=1 keeps everything — but through each group's own bounds
    assert(kept.count() === 20)
    val bounds = kept.select($"grp", $"lo", $"hi").distinct().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(bounds("a") === ((0.0, 9.0)))
    assert(bounds("b") === ((1000.0, 1090.0)))
  }

  test("deterministic under repartitioning (reservoir + bounds stable)") {
    val df = (0 until 300).map(i => (s"g${i % 3}", i.toLong, (i * 7 % 101).toLong))
      .toDF("grp", "id", "v")
    def run(parts: Int) =
      Sampling.adaptiveSpreadFilter(df.repartition(parts), "grp", "v", "id",
        k = 16, loQ = 0.05, hiQ = 0.95, salt = "s")
        .select($"grp", $"id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(1) === run(8))
  }

  test("topKByStratum equals the window form and joins back broadcastable") {
    val df = (0 until 200).map { i =>
      (s"s${i % 4}", i.toLong, math.floor((i * 13 % 50) / 5.0) / 10.0)
    }.toDF("source", "doc_id", "q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source").orderBy($"q".desc, $"doc_id".asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .where($"rn" <= 7).select($"source", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Sampling.topKByStratum(df, "source", "q", "doc_id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
  }
}
