package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediansSpec extends SparkSpec {

  import spark.implicits._

  test("equals builtin median across odd/even/tied/single groups") {
    // deterministic pseudo-random rows with heavy ties, many partitions
    val rows = (0 until 3000).map { i =>
      (i % 7, (i * 2654435761L) % 19)
    } ++ Seq((7, 42L)) // single-row group
    val df = rows.toDF("k", "v").repartition(16)
    val builtin = df.groupBy("k").agg(median(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val counts = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(counts === builtin)
  }

  test("null values skipped; all-null group yields no row (caller left-joins)") {
    val df = Seq(
      (1, Some(10L)), (1, None: Option[Long]), (1, Some(20L)),
      (2, None: Option[Long])).toDF("k", "v")
    val m = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m === Map(1 -> 15.0))
  }

  test("null GROUP KEY keeps its median (the g07 missing-dims shape)") {
    val df = Seq(
      (Some("a"), 10L), (Some("a"), 20L),
      (None: Option[String], 5L), (None: Option[String], 7L))
      .toDF("k", "v")
    val m = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(m === Map(Some("a") -> 15.0, None -> 6.0))
  }
}
