package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[MvAdvisor]] — workload-driven rollup recommendation: shape
  * extraction (keys = groupings ∪ filter columns), per-base merging,
  * compression gating, refusal parity with the rule, and the
  * build-then-navigate loop.
  */
class MvAdvisorSpec extends SparkSpec {

  import spark.implicits._

  private val base = java.nio.file.Files
    .createTempDirectory("adv_base").resolve("fact.parquet").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    // 600 rows, 2x3 grouping combinations: compression 100x
    (0 until 600).map(i =>
      (if (i % 2 == 0) "A" else "B", s"s${i % 3}", (i % 7).toDouble, i.toDouble))
      .toDF("g1", "g2", "qty", "price")
      .write.mode("overwrite").parquet(base)
  }

  private def fact = spark.read.parquet(base)

  test("shapes merge per base: keys = groupings ∪ filter columns, measures union") {
    val workload = Seq(
      fact.where(col("g2") === "s1").groupBy(col("g1")).agg(sum("qty").as("s")),
      fact.groupBy(col("g1"), col("g2")).agg(max("price").as("m")),
      fact.groupBy(col("g2")).agg(count(lit(1)).as("n")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    val c = cands.head
    // the candidate path keeps its scheme (it gets DEREFERENCED)
    assert(c.basePath.endsWith(base) && c.basePath.contains(":"))
    assert(c.groupCols.toSet === Set("g1", "g2"))
    assert(c.measureCols.toSet === Set("qty", "price"))
    assert(c.queriesCovered === 3)
    assert(c.baseRows === 600L)
    // approx-distinct of 6 true combinations: tight at this size
    assert(c.groupRowsApprox >= 5L && c.groupRowsApprox <= 7L)
    assert(c.compression > 50.0)
  }

  test("expression groupings contribute their referenced columns") {
    val workload = Seq(
      fact.groupBy(concat(col("g1"), lit("!")).as("gx"))
        .agg(sum("qty").as("s")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    assert(cands.head.groupCols.toSet === Set("g1"))
  }

  test("alias-defined names never poison the workload: that shape drops, the rest recommend") {
    // unwrapScan walks through alias-bearing Projects, so a query
    // filtering a COMPUTED column records the alias name against the
    // raw base path; col(name) on the base scan would throw
    // AnalysisException — the round-12 finding was that one such
    // query killed recommend() for the whole workload
    val poisoned = fact
      .withColumn("qty2", col("qty") * 2)
      .where(col("qty2") > 1.0)
      .groupBy(col("g1")).agg(sum("qty").as("s"))
    val good = fact.groupBy(col("g1"), col("g2")).agg(sum("qty").as("s"))
    val cands = MvAdvisor.candidates(spark, Seq(poisoned, good))
    assert(cands.length === 1, s"expected the good shape to survive: $cands")
    assert(cands.head.groupCols.toSet === Set("g1", "g2"))
    assert(cands.head.queriesCovered === 1,
      "the alias-poisoned shape must be dropped, not half-extracted")
  }

  test("star workloads extract: join keys become rollup keys, dim attrs constrain nothing") {
    val dimPath = java.nio.file.Files
      .createTempDirectory("adv_dim").resolve("dim.parquet").toString
    Seq(("A", "a"), ("B", "b")).toDF("k", "label")
      .write.mode("overwrite").parquet(dimPath)
    val f = fact
    val dim = spark.read.parquet(dimPath)
    val workload = Seq(
      f.where(col("g2") === "s0").join(dim, f("g1") === dim("k"))
        .groupBy(col("label")).agg(sum("qty").as("s")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    assert(cands.head.basePath.endsWith(base))
    // keys = fact filter col + fact join key; the dim grouping rides
    assert(cands.head.groupCols.toSet === Set("g1", "g2"))
    assert(cands.head.measureCols.toSet === Set("qty"))
  }

  test("star extraction is spelling-independent: dim.join(fact) finds the fact side") {
    val dimPath = java.nio.file.Files
      .createTempDirectory("adv_dim3").resolve("dim.parquet").toString
    Seq(("A", "a"), ("B", "b")).toDF("k", "label")
      .write.mode("overwrite").parquet(dimPath)
    val f = fact
    val dim = spark.read.parquet(dimPath)
    // dim on the LEFT — the dim-as-fact interpretation dies on the
    // measures (qty lives on the other side); the fact-as-fact one
    // must survive
    val workload = Seq(
      dim.join(f, dim("k") === f("g1"))
        .groupBy(col("label")).agg(sum("qty").as("s")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    assert(cands.head.basePath.endsWith(base))
    assert(cands.head.groupCols.toSet === Set("g1"))
    assert(cands.head.measureCols.toSet === Set("qty"))
  }

  test("ROLLUP over a star join extracts and, advised, navigates (advisor/rule symmetry)") { withNoAqe {
    // the rule's Expand replay composes with star joins (p138); the
    // advisor must extract the same shape — fact join keys become
    // rollup keys, dim grouping references ride, measures are fact
    MvCatalog.clear()
    val sdir = java.nio.file.Files.createTempDirectory("adv_gsstar")
    val dimPath = sdir.resolve("dim.parquet").toString
    Seq(("A", "a"), ("B", "b")).toDF("k", "label")
      .write.mode("overwrite").parquet(dimPath)
    val f = fact
    val dim = spark.read.parquet(dimPath)
    def r = f.join(dim, f("g1") === dim("k"))
      .rollup(col("label"), col("g2"))
      .agg(grouping_id().as("gid"), sum("qty").as("s"))
    val cands = MvAdvisor.candidates(spark, Seq(r))
    assert(cands.length === 1, s"expected one candidate: $cands")
    assert(cands.head.basePath.endsWith(base))
    // keys = fact join key + the fact grouping-set column; the dim
    // grouping (label) rides the re-applied join
    assert(cands.head.groupCols.toSet === Set("g1", "g2"))
    assert(cands.head.measureCols.toSet === Set("qty"))
    val defs = MvAdvisor.advise(spark, Seq(r), sdir.resolve("mv").toString)
    assert(defs.length === 1)
    try {
      def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      val paths = scanned(r)
      assert(paths.exists(_.contains("mv_")),
        s"advised star ROLLUP did not navigate: $paths")
      assert(!paths.exists(_.contains("fact.parquet")),
        s"fact still scanned: $paths")
      assert(paths.exists(_.contains("dim.parquet")),
        s"dim scan must survive: $paths")
      val navigated = r.collect().map(_.toSeq).toSet
      MvCatalog.clear()
      val direct = r.collect().map(_.toSeq).toSet
      assert(navigated === direct)
    } finally MvCatalog.clear()
  } }

  test("a column that is both filter key and measure stays in both; query still navigates") { withNoAqe {
    MvCatalog.clear()
    val mvDir = java.nio.file.Files.createTempDirectory("adv_mv2").toString
    def q = fact.where(col("qty") > 3).groupBy(col("g1"))
      .agg(sum("qty").as("s"))
    val cands = MvAdvisor.candidates(spark, Seq(q))
    assert(cands.head.groupCols.toSet === Set("g1", "qty"))
    assert(cands.head.measureCols.toSet === Set("qty"))
    MvAdvisor.buildRecommended(spark, cands, mvDir)
    try {
      val paths = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
      assert(paths.exists(_.contains("mv_")),
        s"key∩measure query did not navigate: $paths")
      assert(!paths.exists(_.contains("fact.parquet")))
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      MvCatalog.clear()
      assert(got === q.collect().map(r => (r.getString(0), r.getDouble(1))).toMap)
    } finally MvCatalog.clear()
  } }

  test("rule-refused shapes extract nothing: distinct agg, self-join, right-outer") {
    val f = fact
    val f2 = fact
    val dimPath = java.nio.file.Files
      .createTempDirectory("adv_dim2").resolve("dim.parquet").toString
    Seq(("A", "a")).toDF("k", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val workload = Seq(
      fact.groupBy(col("g1")).agg(countDistinct(col("g2")).as("d")),
      f.join(f2.select(col("g1").as("k"), col("price").as("p")),
          f("g1") === col("k"))
        .groupBy(col("g1")).agg(sum("qty").as("s")),
      f.join(dim, f("g1") === dim("k"), "right")
        .groupBy(col("label")).agg(sum("qty").as("s")))
    assert(MvAdvisor.candidates(spark, workload).isEmpty)
  }

  test("expression measures extract as exprMeasures (the Q1 revenue shape)") {
    // sum(qty * 2) is navigable since the rule's p122 surface — the
    // advisor extracts it as an expression measure, not a refusal
    val workload = Seq(
      fact.groupBy(col("g1")).agg(sum(col("qty") * 2).as("s")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    val c = cands.head
    assert(c.groupCols.toSet === Set("g1"))
    assert(c.measureCols.isEmpty)
    assert(c.exprMeasures.size === 1)
    assert(c.exprMeasures.keys.forall(_.startsWith("em_")))
    assert(c.exprMeasures.values.head.contains("qty"))
  }

  test("keyless candidates navigate: a shared-slice global aggregate builds a one-row rollup") { withNoAqe {
    // two global aggregates over the same slice: the conjunct becomes
    // the baseFilter and the merged candidate has EMPTY groupCols —
    // the rule must navigate the empty-groupBy Aggregate shape
    // against the keyless (one-row) rollup, or the advisor would be
    // recommending a build it can never use
    MvCatalog.clear()
    val mvDir = java.nio.file.Files.createTempDirectory("adv_mv3").toString
    def q1 = fact.where(col("g2") === "s1").agg(sum("qty").as("s"))
    def q2 = fact.where(col("g2") === "s1").agg(max("price").as("m"))
    val cands = MvAdvisor.candidates(spark, Seq(q1, q2))
    assert(cands.length === 1)
    assert(cands.head.groupCols.isEmpty)
    assert(cands.head.baseFilter.isDefined)
    assert(cands.head.groupRowsApprox === 1L)
    MvAdvisor.buildRecommended(spark, cands, mvDir)
    try {
      def scanned(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      Seq(q1, q2).foreach { q =>
        val paths = scanned(q)
        assert(paths.exists(_.contains("mv_")),
          s"global aggregate did not navigate the keyless rollup: $paths")
        assert(!paths.exists(_.contains("fact.parquet")))
      }
      val navigated = (q1.collect().head.getDouble(0),
        q2.collect().head.getDouble(0))
      MvCatalog.clear()
      val direct = (q1.collect().head.getDouble(0),
        q2.collect().head.getDouble(0))
      assert(navigated === direct)
    } finally MvCatalog.clear()
  } }

  test("compression gate refuses a fact-grain rollup") {
    // price is unique per row: keying on it makes the rollup the fact
    val workload = Seq(
      fact.groupBy(col("price")).agg(sum("qty").as("s")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1)
    assert(cands.head.compression < 2.0)
    assert(MvAdvisor.recommend(spark, workload).isEmpty)
  }

  test("recommend -> build -> every workload query navigates") { withNoAqe {
    MvCatalog.clear()
    val mvDir = java.nio.file.Files.createTempDirectory("adv_mv").toString
    val workload = Seq(
      fact.where(col("g2") === "s1").groupBy(col("g1")).agg(sum("qty").as("s")),
      fact.groupBy(col("g1"), col("g2"))
        .agg(max("price").as("m"), avg("qty").as("a")),
      fact.groupBy(col("g2")).agg(count(lit(1)).as("n")))
    val recs = MvAdvisor.recommend(spark, workload)
    assert(recs.length === 1)
    val defs = MvAdvisor.buildRecommended(spark, recs, mvDir)
    assert(defs.length === 1)
    try {
      def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      // re-issue the SAME workload: every query must now navigate
      val again = Seq(
        fact.where(col("g2") === "s1").groupBy(col("g1")).agg(sum("qty").as("s")),
        fact.groupBy(col("g1"), col("g2"))
          .agg(max("price").as("m"), avg("qty").as("a")),
        fact.groupBy(col("g2")).agg(count(lit(1)).as("n")))
      again.foreach { q =>
        val paths = scanned(q)
        assert(paths.exists(_.contains("mv_")),
          s"workload query did not navigate: $paths")
        assert(!paths.exists(_.contains("fact.parquet")),
          s"fact still scanned: $paths")
      }
      // and answers match the direct plans
      val navigated = again.map(_.collect().map(_.toSeq).toSet)
      MvCatalog.clear()
      val direct = again.map(_.collect().map(_.toSeq).toSet)
      assert(navigated === direct)
    } finally MvCatalog.clear()
  } }

  test("grouping-sets workloads extract the finest grain; advise -> ROLLUP navigates") { withNoAqe {
    MvCatalog.clear()
    val mvDir = java.nio.file.Files.createTempDirectory("adv_gs").toString
    // a ROLLUP query and a flat query over the same base must merge
    // into ONE candidate at the union grain
    val workload = Seq(
      fact.rollup(col("g1"), col("g2"))
        .agg(grouping_id().as("gid"), sum("qty").as("s"),
          count(lit(1)).as("n")),
      fact.groupBy(col("g1")).agg(max("price").as("m")))
    val cands = MvAdvisor.candidates(spark, workload)
    assert(cands.length === 1, s"expected one merged candidate: $cands")
    assert(cands.head.groupCols.toSet === Set("g1", "g2"))
    assert(cands.head.measureCols.toSet === Set("qty", "price"))
    assert(cands.head.queriesCovered === 2)
    val defs = MvAdvisor.advise(spark, workload, mvDir)
    assert(defs.length === 1)
    try {
      def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      def r = fact.rollup(col("g1"), col("g2"))
        .agg(grouping_id().as("gid"), sum("qty").as("s"),
          count(lit(1)).as("n"))
      val paths = scanned(r)
      assert(paths.exists(_.contains("mv_")),
        s"advised ROLLUP did not navigate: $paths")
      assert(!paths.exists(_.contains("fact.parquet")),
        s"fact still scanned: $paths")
      val navigated = r.collect().map(_.toSeq).toSet
      MvCatalog.clear()
      val direct = r.collect().map(_.toSeq).toSet
      assert(navigated === direct)
    } finally MvCatalog.clear()

    // refusal parity: a DISTINCT aggregate under ROLLUP extracts
    // nothing (same contract as the flat extractor) — the flat query
    // alone shapes the candidate
    val mixed = Seq(
      fact.rollup(col("g1")).agg(countDistinct(col("g2")).as("d")),
      fact.groupBy(col("g1")).agg(sum("qty").as("s")))
    val c2 = MvAdvisor.candidates(spark, mixed)
    assert(c2.length === 1 && c2.head.queriesCovered === 1,
      s"rollup-side refusal expected: $c2")
  } }

  test("recommendations persist: save catalog, fresh registration navigates with freshness intact") { withNoAqe {
    MvCatalog.clear()
    // drift happens BETWEEN navigations here — observe it immediately
    // rather than through the production 30 s amortization window
    spark.conf.set("spark.graft.mv.freshnessTtlMs", "0")
    val tmp = java.nio.file.Files.createTempDirectory("adv_cat")
    val mvDir = tmp.resolve("mvs").toString
    val catPath = tmp.resolve("catalog.json").toString
    def q = fact.groupBy(col("g1"), col("g2")).agg(sum("qty").as("s"))
    val recs = MvAdvisor.recommend(spark, Seq(q))
    MvAdvisor.buildRecommended(spark, recs, mvDir)
    MaterializedAggregate.saveCatalog(spark, catPath)
    MvCatalog.clear()
    // a fresh registration from disk (a new driver's startup path)
    MaterializedAggregate.loadCatalog(spark, catPath)
    try {
      def scanned(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
      assert(scanned(q).exists(_.contains("mv_")),
        "loaded recommendation did not navigate")
      // freshness survives the round-trip: drift the base, navigation
      // must refuse and fall back to the fact
      fact.limit(1).write.mode("append").parquet(base)
      assert(scanned(q).exists(_.contains("fact.parquet")),
        "stale recommendation still navigated after base drift")
    } finally {
      spark.conf.unset("spark.graft.mv.freshnessTtlMs")
      MvCatalog.clear()
      // restore the fixture for any later test in this suite
      (0 until 600).map(i =>
        (if (i % 2 == 0) "A" else "B", s"s${i % 3}", (i % 7).toDouble, i.toDouble))
        .toDF("g1", "g2", "qty", "price")
        .write.mode("overwrite").parquet(base)
    }
  } }
}
