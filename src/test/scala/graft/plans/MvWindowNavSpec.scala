package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round 15: MV navigation one operator HIGHER than the aggregate —
  * the Window-over-Aggregate dashboard shape (p147's mechanism) —
  * plus the Expand-shape guards the round-14 advice asked to pin:
  * only grouping-sets Expands navigate; the OTHER producers of
  * Expand (multi-DISTINCT-aggregate rewrite, unpivot) must refuse
  * and stay correct.
  */
class MvWindowNavSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.nio.file.Files
    .createTempDirectory("mvwn_base").resolve("fact.parquet").toString
  private val mvPath = java.nio.file.Files
    .createTempDirectory("mvwn_roll").resolve("mv.parquet").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq(
      ("A", "x", 10.0, 2.0), ("A", "x", 20.0, 4.0), ("A", "y", 5.0, 1.0),
      ("B", "x", 7.0, 3.0), ("B", "y", 9.0, 5.0), ("B", "y", 11.0, 7.0))
      .toDF("g1", "g2", "qty", "price")
      .write.mode("overwrite").parquet(base)
    MvCatalog.clear()
    MaterializedAggregate.buildAndRegister(spark, base, mvPath,
      groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
  }

  override def afterAll(): Unit = { MvCatalog.clear(); super.afterAll() }

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  private val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("g1")).orderBy(col("g2"))
    .rowsBetween(Long.MinValue, 0)

  test("window over a DERIVABLE aggregate navigates; results exact") { withNoAqe {
    def query = spark.read.parquet(base)
      .groupBy(col("g1"), col("g2"))
      .agg(avg("qty").as("p"))
      .withColumn("ma", avg(col("p")).over(w))
    val paths = scannedPaths(query)
    assert(paths.exists(_.contains("mv.parquet")), s"rollup not read: $paths")
    assert(!paths.exists(_.contains("fact.parquet")),
      s"fact scanned under the Window: $paths")
    val got = query.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val expected = MvCatalog.withSuspended(query.collect())
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
    assert(got === Set(
      ("A", "x", 15.0, 15.0), ("A", "y", 5.0, 10.0),
      ("B", "x", 7.0, 7.0), ("B", "y", 10.0, 8.5)))
  } }

  test("window over a NON-derivable aggregate (exact median) refuses") { withNoAqe {
    def query = spark.read.parquet(base)
      .groupBy(col("g1"), col("g2"))
      .agg(expr("median(qty)").as("p"))
      .withColumn("ma", avg(col("p")).over(w))
    val paths = scannedPaths(query)
    assert(paths.exists(_.contains("fact.parquet")),
      s"median must not navigate — unsound over sum/min/max partials: $paths")
    assert(!paths.exists(_.contains("mv.parquet")))
  } }

  test("the advisor extracts the aggregate UNDER a window workload and closes the loop") { withNoAqe {
    // a workload consisting solely of the moving-average query: the
    // shape extraction walks the whole plan, so the Aggregate nested
    // under the Window must surface as a candidate; the advised
    // rollup then serves the query with zero manual registration
    val mvDir = java.nio.file.Files.createTempDirectory("mvwn_adv")
    MvCatalog.clear()
    try {
      def query = spark.read.parquet(base)
        .groupBy(col("g1"), col("g2"))
        .agg(avg("qty").as("p"), sum("qty").as("s"))
        .withColumn("ma", avg(col("p")).over(w))
      // minCompression 1: the 6-row fixture can't clear the 10×
      // production gate; grain extraction is what's under test
      val defs = MvAdvisor.advise(spark, Seq(query), mvDir.toString,
        minCompression = 1.0)
      assert(defs.length === 1, s"expected one advised def: $defs")
      assert(defs.head.groupCols.toSet === Set("g1", "g2"),
        s"wrong advised grain: ${defs.head.groupCols}")
      val paths = scannedPaths(query)
      assert(paths.exists(_.contains("/mv_")),
        s"advised rollup not navigated by the window query: $paths")
      assert(!paths.exists(_.contains("fact.parquet")),
        s"fact scanned after advise(): $paths")
    } finally {
      MvCatalog.clear()
      // this suite's OTHER tests rely on the beforeAll registration
      MaterializedAggregate.registerExisting(spark, base, mvPath,
        groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(mvDir).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: java.io.IOException => () }
    }
  } }

  test("multi-DISTINCT-aggregate (its rewrite builds an Expand) refuses and stays correct") { withNoAqe {
    // RewriteDistinctAggregates plans two DISTINCT aggs as
    // Aggregate-over-Expand — the expandChild matcher must not treat
    // that Expand as a grouping-sets shape
    def query = spark.read.parquet(base)
      .groupBy(col("g1"))
      .agg(countDistinct(col("g2")).as("d2"),
        countDistinct(col("qty")).as("dq"))
    val paths = scannedPaths(query)
    assert(paths.exists(_.contains("fact.parquet")),
      s"DISTINCT aggregates must not navigate: $paths")
    val got = query.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("A", 2L, 3L), ("B", 2L, 3L)))
  } }

  test("unpivot-then-aggregate (an Expand that is not grouping sets) refuses and stays correct") { withNoAqe {
    def query = spark.read.parquet(base)
      .unpivot(Array(col("g1")), Array(col("qty"), col("price")),
        "measure", "value")
      .groupBy(col("g1"), col("measure"))
      .agg(sum(col("value")).as("s"))
    val paths = scannedPaths(query)
    assert(paths.exists(_.contains("fact.parquet")),
      s"unpivot Expand must not navigate: $paths")
    val got = query.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(
      ("A", "qty", 35.0), ("A", "price", 7.0),
      ("B", "qty", 27.0), ("B", "price", 15.0)))
  } }
}
