package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalOrderSpec extends SparkSpec {

  import spark.implicits._

  private def rows = (1L to 500L).map(i => (i, (i * 37) % 101, s"d$i"))
    .toDF("id", "key", "payload")

  test("global rank equals the window-function definition") {
    val ranked = GlobalOrder.withGlobalRank(rows, "rank",
      Seq(col("key").asc, col("id").asc))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val expected = rows
      .withColumn("rank", row_number().over(Window.orderBy(col("key").asc, col("id").asc)))
      .select("id", "rank").as[(Long, Int)].collect().toMap
    assert(ranked.size === 500)
    expected.foreach { case (id, r) => assert(ranked(id) === r.toLong, s"id $id") }
  }

  test("rank is independent of input partitioning and spans multiple partitions") {
    val a = GlobalOrder.withGlobalRank(rows.repartition(13), "rank",
      Seq(col("key").asc, col("id").asc))
    val b = GlobalOrder.withGlobalRank(rows.coalesce(1), "rank",
      Seq(col("key").asc, col("id").asc))
    assert(a.select("id", "rank").as[(Long, Long)].collect().toMap ===
      b.select("id", "rank").as[(Long, Long)].collect().toMap)
    // the scale claim: the sort is range-partitioned across tasks —
    // with AQE off (it legitimately coalesces this 500-row shuffle to
    // one partition) the ranked frame must span multiple partitions,
    // i.e. never a SinglePartition global-window sort
    withNoAqe {
      val parts = GlobalOrder.withGlobalRank(rows.repartition(13), "rank",
        Seq(col("key").asc, col("id").asc)).rdd.getNumPartitions
      assert(parts > 1, "ranked frame collapsed to a single partition")
    }
    // payload columns survive the zip untouched
    assert(a.where(col("id") === 7L).select("payload").as[String].head() === "d7")
  }

  test("empty frame and guard") {
    val empty = GlobalOrder.withGlobalRank(rows.where(lit(false)), "rank",
      Seq(col("id").asc))
    assert(empty.count() === 0L)
    intercept[IllegalArgumentException](
      GlobalOrder.withGlobalRank(rows, "rank", Seq.empty))
  }
}
