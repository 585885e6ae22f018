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

  test("saltedAgg avg: (sum,count) partial pair equals plain avg, nulls skipped") {
    import spark.implicits._
    val df = (skewed.map { case (k, v) => (k, Some(v)) } ++
      Seq((1L, None: Option[Long]), (3L, None: Option[Long]))) // all-null key 3
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(avg("v").as("a"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val salted = Skew.saltedAgg(df, Seq("key"), saltBuckets = 8,
      aggs = Map("a" -> (col("v"), "avg"), "n" -> (col("v"), "count")))
      .collect().map(r => r.getAs[Long]("key") ->
        (if (r.isNullAt(r.fieldIndex("a"))) None
        else Some(r.getAs[Double]("a")))).toMap
    assert(salted === plain) // exact: long sums, one final divide
  }

  test("saltedAgg rejects non-algebraic aggregates") {
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(skewed.toDF("key", "v"), Seq("key"), 4,
        Map("m" -> (col("v"), "median")))
        .collect()
    }
  }
}
