package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AggregateRewriteRule]] — materialized-aggregate navigation:
  * the rewrite fires only when sound, reads the rollup instead of
  * the fact scan, re-emits the original output ids, and refuses
  * every non-derivable shape.
  */
class MvRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.nio.file.Files
    .createTempDirectory("mv_base").resolve("fact.parquet").toString
  private val mvPath = java.nio.file.Files
    .createTempDirectory("mv_roll").resolve("mv.parquet").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    // integral-valued doubles: re-associated sums are bit-exact
    Seq(
      ("A", "x", 10.0, 1.5), ("A", "x", 20.0, 2.5), ("A", "y", 5.0, 0.5),
      ("B", "x", 7.0, 3.5), ("B", "y", 9.0, 4.5), ("B", "y", 11.0, 5.5))
      .toDF("g1", "g2", "qty", "price")
      .write.mode("overwrite").parquet(base)
  }

  override def afterAll(): Unit = {
    MvCatalog.clear()
    super.afterAll()
  }

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  test("subset-group query with derivable aggs reads the rollup, results exact") { withNoAqe {
    MvCatalog.clear()
    MaterializedAggregate.buildAndRegister(spark, base, mvPath,
      groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
    def query = spark.read.parquet(base)
      .where(col("g2") === "x")
      .groupBy(col("g1"))
      .agg(sum("qty").as("s"), count(lit(1)).as("n"),
        min("qty").as("mn"), max("qty").as("mx"), avg("qty").as("a"))
      .orderBy(col("g1")) // an operator ABOVE the agg: exprIds must survive
    val rewritten = query
    val paths = scannedPaths(rewritten)
    assert(paths.exists(_.contains("mv.parquet")),
      s"rollup not read: $paths")
    assert(!paths.exists(_.contains("fact.parquet")),
      s"fact table still scanned: $paths")
    val got = rewritten.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    MvCatalog.clear()
    val direct = query.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(scannedPaths(query).exists(_.contains("fact.parquet")))
    assert(got.toSeq === direct.toSeq)
    assert(got.toSeq === Seq(("A", 30.0, 2L, 10.0, 20.0, 15.0),
      ("B", 7.0, 1L, 7.0, 7.0, 7.0)))
  } }

  test("non-derivable shapes refuse: measure filter, unknown measure, distinct") { withNoAqe {
    MvCatalog.clear()
    MaterializedAggregate.buildAndRegister(spark, base, mvPath,
      groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
    try {
      // filter on a measure does not commute with the rollup
      val f = spark.read.parquet(base).where(col("qty") > 8)
        .groupBy(col("g1")).agg(sum("qty").as("s"))
      assert(scannedPaths(f).exists(_.contains("fact.parquet")), "measure filter")
      // aggregate over an unregistered measure
      val u = spark.read.parquet(base)
        .groupBy(col("g1")).agg(sum("price").as("s"))
      assert(scannedPaths(u).exists(_.contains("fact.parquet")), "unknown measure")
      // DISTINCT aggregates are not derivable from sums
      val d = spark.read.parquet(base)
        .groupBy(col("g1")).agg(countDistinct(col("qty")).as("s"))
      assert(scannedPaths(d).exists(_.contains("fact.parquet")), "distinct")
      // grouping by a column the MV lacks
      val g = spark.read.parquet(base)
        .groupBy(col("qty")).agg(count(lit(1)).as("n"))
      assert(scannedPaths(g).exists(_.contains("fact.parquet")), "non-mv group")
      // and the refused queries still answer correctly
      assert(f.collect().map(r => (r.getString(0), r.getDouble(1))).toMap ===
        Map("A" -> 30.0, "B" -> 20.0))
    } finally MvCatalog.clear()
  } }

  test("incrementally maintained MV: partial fold == one-shot rollup; replay idempotent") { withNoAqe {
    MvCatalog.clear()
    val facts = spark.read.parquet(base)
    val incPath = java.nio.file.Files
      .createTempDirectory("mv_inc").resolve("mv.parquet").toString
    // two "micro-batches" + a REPLAY of batch 1 (must overwrite, not
    // double-count)
    val b0 = facts.where(col("g1") === "A")
    val b1 = facts.where(col("g1") === "B")
    graft.streaming.StreamingMvMaintenance.processBatch(
      b0, 0L, incPath, Seq("g1", "g2"), Seq("qty"))
    graft.streaming.StreamingMvMaintenance.processBatch(
      b1, 1L, incPath, Seq("g1", "g2"), Seq("qty"))
    graft.streaming.StreamingMvMaintenance.processBatch(
      b1, 1L, incPath, Seq("g1", "g2"), Seq("qty"))

    MaterializedAggregate.registerExisting(spark, base, incPath,
      Seq("g1", "g2"), Seq("qty"))
    try {
      val q = spark.read.parquet(base).groupBy(col("g1"), col("g2"))
        .agg(sum("qty").as("s"), count(lit(1)).as("n"),
          min("qty").as("mn"), max("qty").as("mx"))
      assert(scannedPaths(q).exists(_.contains("mv_inc")),
        "maintained layout not navigated")
      val got = q.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      assert(got === Map(
        ("A", "x") -> ((30.0, 2L, 10.0, 20.0)),
        ("A", "y") -> ((5.0, 1L, 5.0, 5.0)),
        ("B", "x") -> ((7.0, 1L, 7.0, 7.0)),
        ("B", "y") -> ((20.0, 2L, 9.0, 11.0))))
    } finally MvCatalog.clear()
  } }

  test("dormant catalog: rule is a no-op when nothing is registered") { withNoAqe {
    MvCatalog.clear()
    val q = spark.read.parquet(base).groupBy(col("g1"))
      .agg(sum("qty").as("s"))
    assert(scannedPaths(q).exists(_.contains("fact.parquet")))
    assert(q.collect().length === 2)
  } }
}
