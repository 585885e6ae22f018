package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TestdataAdapter._

/** Plan-level proof of the bucketing scale story: aggregations and
  * joins on the bucket key run with NO Exchange.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("groupBy on the bucket key has no shuffle") {
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "b_silver", "item_id", buckets = 4)
    val agg = Bucketing.table(spark, "b_silver")
      .groupBy("item_id")
      .agg(sum("quantity").as("q"), max("unit_price").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg still shuffles:\n$plan")
    assert(agg.count() > 0)
  }

  test("join of two equally-bucketed tables has no shuffle") {
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "b_facts", "item_id", buckets = 4)
    Bucketing.writeBucketed(
      dimsFromPart(spark, dir), "b_dims", "item_id", buckets = 4)
    // disable broadcast so the join would otherwise be a shuffle SMJ
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "b_facts")
        .join(Bucketing.table(spark, "b_dims"), "item_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("db-qualified, mixed-case names survive rewrite (stale-location cleanup)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_db")
    // twice: the second write must clean the first's managed location
    // at <warehouse>/bkt_db.db/mixedcase despite the case/qualifier
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "bkt_db.MixedCase", "item_id", buckets = 2)
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "bkt_db.MixedCase", "item_id", buckets = 2)
    assert(Bucketing.table(spark, "bkt_db.MixedCase").count() > 0)
  }

  test("default-db qualified name cleans its stale dir at the WAREHOUSE ROOT") {
    // default-database managed tables live directly at <warehouse>/<t>
    // (not <warehouse>/default.db/<t>); a leftover dir from a previous
    // session's in-memory catalog must be cleaned from there or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS
    val warehouse = java.nio.file.Paths.get(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val staleDir = warehouse.resolve("bkt_stale")
    java.nio.file.Files.createDirectories(staleDir)
    java.nio.file.Files.write(staleDir.resolve("leftover"), Array[Byte](1))
    spark.sql("DROP TABLE IF EXISTS default.bkt_stale")
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "default.bkt_stale", "item_id", buckets = 2)
    assert(Bucketing.table(spark, "default.bkt_stale").count() > 0)
    assert(!java.nio.file.Files.exists(staleDir.resolve("leftover")))
  }

  test("mismatched bucket counts fall back to a correct (shuffling) join") {
    Bucketing.writeBucketed(
      silverFromLineitem(spark, dir), "b_facts8", "item_id", buckets = 8)
    Bucketing.writeBucketed(
      dimsFromPart(spark, dir), "b_dims2", "item_id", buckets = 2)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "b_facts8")
        .join(Bucketing.table(spark, "b_dims2"), "item_id")
      assert(joined.count() > 0) // correctness regardless of bucketing layout
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
