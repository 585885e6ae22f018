package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  private def skewed = (1 to 1000).map(i => (1L, i.toLong)) ++ // hot key
    (1 to 10).map(i => (2L, i.toLong))

  test("saltedAgg: two-phase result equals plain groupBy") {
    val df = skewed.toDF("key", "v")
    val plain = df.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val salted = Skew.saltedAgg(df, Seq("key"), saltBuckets = 8,
      aggs = Map("s" -> (col("v"), "sum"), "n" -> (col("v"), "count"),
        "mx" -> (col("v"), "max")))
      .collect().map(r => (r.getAs[Long]("key"),
        (r.getAs[Long]("s"), r.getAs[Long]("n"), r.getAs[Long]("mx")))).toMap
    assert(salted === plain)
  }

  test("saltedJoin: equals plain join result") {
    val probe = skewed.toDF("key", "v")
    val build = Seq((1L, "hot"), (2L, "cold")).toDF("key", "name")
    val plain = probe.join(build, "key").groupBy("key", "name")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(probe, build, "key", saltBuckets = 4)
      .groupBy("key", "name").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedAgg rejects non-algebraic aggregates") {
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(skewed.toDF("key", "v"), Seq("key"), 4,
        Map("m" -> (col("v"), "median")))
        .collect()
    }
  }
}
