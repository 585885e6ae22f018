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

  test("NULL measures: COUNT(x) derives from nnz_x; AVG divides by nnz, not cnt") { withNoAqe {
    MvCatalog.clear()
    val nbase = java.nio.file.Files
      .createTempDirectory("mv_null").resolve("fact.parquet").toString
    val nmv = java.nio.file.Files
      .createTempDirectory("mv_nullr").resolve("mv.parquet").toString
    // group A: values (10, null, 20) → count*=3, count(v)=2, avg=15
    // (an nnz-blind rewrite would claim avg = 30/3 = 10)
    Seq(("A", Some(10.0)), ("A", None), ("A", Some(20.0)),
      ("B", Some(8.0)), ("B", None))
      .toDF("g", "v").write.mode("overwrite").parquet(nbase)
    MaterializedAggregate.buildAndRegister(spark, nbase, nmv,
      groupCols = Seq("g"), measureCols = Seq("v"))
    try {
      val q = spark.read.parquet(nbase).groupBy(col("g"))
        .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_v"),
          sum("v").as("s"), avg("v").as("a"))
      assert(scannedPaths(q).exists(_.contains("mv.parquet")),
        s"rollup not read: ${scannedPaths(q)}")
      val got = q.collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      assert(got === Map(
        "A" -> ((3L, 2L, 30.0, 15.0)),
        "B" -> ((2L, 1L, 8.0, 8.0))))
    } finally MvCatalog.clear()
  } }

  test("legacy rollup without nnz_*: COUNT(x)/AVG(x) on a nullable measure refuse") { withNoAqe {
    MvCatalog.clear()
    val nbase = java.nio.file.Files
      .createTempDirectory("mv_leg").resolve("fact.parquet").toString
    val legacyMv = java.nio.file.Files
      .createTempDirectory("mv_legr").resolve("mv.parquet").toString
    Seq(("A", Some(10.0)), ("A", None), ("B", Some(8.0)))
      .toDF("g", "v").write.mode("overwrite").parquet(nbase)
    // hand-write the pre-nnz layout and register it as-is
    spark.read.parquet(nbase).groupBy(col("g"))
      .agg(sum("v").as("sum_v"), min("v").as("min_v"),
        max("v").as("max_v"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(legacyMv)
    MaterializedAggregate.registerExisting(spark, nbase, legacyMv,
      Seq("g"), Seq("v"))
    try {
      // derivable-without-nnz shapes still navigate
      val ok = spark.read.parquet(nbase).groupBy(col("g"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      assert(scannedPaths(ok).exists(_.contains("mv.parquet")))
      // COUNT(v) and AVG(v) need nnz_v: must fall back to the fact scan
      val cnt = spark.read.parquet(nbase).groupBy(col("g"))
        .agg(count(col("v")).as("n_v"))
      assert(scannedPaths(cnt).exists(_.contains("fact.parquet")),
        "COUNT(x) navigated a rollup that can't answer it")
      val av = spark.read.parquet(nbase).groupBy(col("g"))
        .agg(avg(col("v")).as("a"))
      assert(scannedPaths(av).exists(_.contains("fact.parquet")),
        "AVG(x) navigated an nnz-less rollup over a nullable measure")
      assert(av.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 10.0, "B" -> 8.0))
    } finally MvCatalog.clear()
  } }

  test("several covering rollups: the coarsest wins, deterministically") { withNoAqe {
    MvCatalog.clear()
    val fine = java.nio.file.Files
      .createTempDirectory("mv_fine").resolve("fine.parquet").toString
    val coarse = java.nio.file.Files
      .createTempDirectory("mv_coarse").resolve("coarse.parquet").toString
    MaterializedAggregate.buildAndRegister(spark, base, fine,
      groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
    MaterializedAggregate.buildAndRegister(spark, base, coarse,
      groupCols = Seq("g1"), measureCols = Seq("qty"))
    try {
      // answerable by both → the 1-column rollup must be chosen
      val q = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum("qty").as("s"))
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains("coarse.parquet")),
        s"coarsest rollup not chosen: $paths")
      assert(!paths.exists(_.contains("fine.parquet")))
      // answerable only by the fine one → it still navigates there
      val q2 = spark.read.parquet(base).groupBy(col("g1"), col("g2"))
        .agg(sum("qty").as("s"))
      assert(scannedPaths(q2).exists(_.contains("fine.parquet")))
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 35.0, "B" -> 27.0))
    } finally MvCatalog.clear()
  } }

  test("approx-distinct navigation: register fold bit-identical; wrong p/hash/col refuse") { withNoAqe {
    MvCatalog.clear()
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    val dbase = java.nio.file.Files
      .createTempDirectory("mv_hll").resolve("fact.parquet").toString
    val dmv = java.nio.file.Files
      .createTempDirectory("mv_hllr").resolve("mv.parquet").toString
    Seq(("A", "x", 1.0, 7L), ("A", "y", 2.0, 8L), ("A", "x", 3.0, 7L),
      ("B", "x", 4.0, 7L), ("B", "y", 5.0, 9L))
      .toDF("g1", "g2", "v", "u").write.mode("overwrite").parquet(dbase)
    MaterializedAggregate.buildAndRegister(spark, dbase, dmv,
      groupCols = Seq("g1", "g2"), measureCols = Seq("v"),
      distinctCols = Seq("u"), hllP = 4)
    def digest(p: Int, hash: org.apache.spark.sql.Column) =
      spark.read.parquet(dbase).groupBy(col("g1"))
        .agg(SK.hyperLogLog(hash, p).as("__regs"), sum("v").as("s"))
        .select(col("g1"),
          md5(array_join(transform(col("__regs"), _.cast("string")), ","))
            .as("d"),
          col("s"))
    try {
      val q = digest(4, Md5Hash.h60String(col("u")))
      assert(scannedPaths(q).exists(_.contains("mv.parquet")),
        s"sketch navigation did not fire: ${scannedPaths(q)}")
      val got = q.collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      MvCatalog.clear()
      // fresh plan: a cached QueryExecution would replay the rewrite
      val q2 = digest(4, Md5Hash.h60String(col("u")))
      val direct = q2.collect().map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(scannedPaths(q2).exists(_.contains("fact.parquet")))
      assert(got === direct, "folded registers diverged from one-shot sketch")
      // refusals: wrong precision, wrong hash tree, unregistered column
      MaterializedAggregate.buildAndRegister(spark, dbase, dmv,
        Seq("g1", "g2"), Seq("v"), Seq("u"), hllP = 4)
      assert(scannedPaths(digest(5, Md5Hash.h60String(col("u"))))
        .exists(_.contains("fact.parquet")), "p mismatch must refuse")
      assert(scannedPaths(digest(4,
        Md5Hash.h60(concat(col("u").cast("string"), lit("salt")))))
        .exists(_.contains("fact.parquet")), "hash-tree mismatch must refuse")
      assert(scannedPaths(digest(4, Md5Hash.h60String(col("g2"))))
        .exists(_.contains("fact.parquet")), "unregistered column must refuse")
    } finally MvCatalog.clear()
  } }

  test("incrementally maintained registers fold to the one-shot sketch across batches") { withNoAqe {
    MvCatalog.clear()
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    val dbase = java.nio.file.Files
      .createTempDirectory("mv_hlli").resolve("fact.parquet").toString
    val incPath = java.nio.file.Files
      .createTempDirectory("mv_hllinc").resolve("mv.parquet").toString
    Seq(("A", 1.0, 7L), ("A", 2.0, 8L), ("B", 4.0, 7L), ("B", 5.0, 9L),
      ("A", 3.0, 7L))
      .toDF("g", "v", "u").write.mode("overwrite").parquet(dbase)
    val facts = spark.read.parquet(dbase)
    graft.streaming.StreamingMvMaintenance.processBatch(
      facts.where(col("u") < 9), 0L, incPath, Seq("g"), Seq("v"),
      distinctCols = Seq("u"), hllP = 4)
    graft.streaming.StreamingMvMaintenance.processBatch(
      facts.where(col("u") >= 9), 1L, incPath, Seq("g"), Seq("v"),
      distinctCols = Seq("u"), hllP = 4)
    MaterializedAggregate.registerExisting(spark, dbase, incPath,
      Seq("g"), Seq("v"), Seq("u"), hllP = 4)
    try {
      def q = spark.read.parquet(dbase).groupBy(col("g"))
        .agg(SK.hyperLogLog(Md5Hash.h60String(col("u")), 4).as("__regs"))
        .select(col("g"),
          md5(array_join(transform(col("__regs"), _.cast("string")), ","))
            .as("d"))
      assert(scannedPaths(q).exists(_.contains("mv_hllinc")),
        "maintained registers not navigated")
      val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      MvCatalog.clear()
      val direct = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === direct)
    } finally MvCatalog.clear()
  } }

  test("partial rollup: navigates only queries that repeat its build predicate") { withNoAqe {
    MvCatalog.clear()
    val pmv = java.nio.file.Files
      .createTempDirectory("mv_part").resolve("pmv.parquet").toString
    MaterializedAggregate.buildAndRegister(spark, base, pmv,
      groupCols = Seq("g1"), measureCols = Seq("qty"),
      baseFilter = Some("g2 = 'x'"))
    try {
      // query repeats the predicate → navigates, answers exactly
      def q = spark.read.parquet(base).where(col("g2") === "x")
        .groupBy(col("g1")).agg(sum("qty").as("s"))
      assert(scannedPaths(q).exists(_.contains("pmv.parquet")),
        s"partial rollup not navigated: ${scannedPaths(q)}")
      assert(q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 30.0, "B" -> 7.0))
      // repeats it AND adds a grouping-column conjunct → still
      // navigates, the residual applies over the rollup
      def q2 = spark.read.parquet(base)
        .where(col("g2") === "x" && col("g1") === "A")
        .groupBy(col("g1")).agg(sum("qty").as("s"))
      assert(scannedPaths(q2).exists(_.contains("pmv.parquet")))
      assert(q2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 30.0))
      // no filter at all → must NOT navigate (the rollup is missing
      // the g2 != 'x' rows)
      def q3 = spark.read.parquet(base)
        .groupBy(col("g1")).agg(sum("qty").as("s"))
      assert(scannedPaths(q3).exists(_.contains("fact.parquet")),
        "unfiltered query navigated a partial rollup")
      // a DIFFERENT predicate on the same column → refuse
      def q4 = spark.read.parquet(base).where(col("g2") === "y")
        .groupBy(col("g1")).agg(sum("qty").as("s"))
      assert(scannedPaths(q4).exists(_.contains("fact.parquet")),
        "wrong predicate navigated a partial rollup")
      assert(q4.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 5.0, "B" -> 20.0))
    } finally MvCatalog.clear()
  } }

  test("expression measures: sum/min/max/count/avg over the registered tree navigate") { withNoAqe {
    MvCatalog.clear()
    val emv = java.nio.file.Files
      .createTempDirectory("mv_expr").resolve("emv.parquet").toString
    // "rev" = qty * (10 - price): integral-valued, so re-associated
    // sums are bit-exact
    MaterializedAggregate.buildAndRegister(spark, base, emv,
      groupCols = Seq("g1"), measureCols = Nil,
      exprMeasures = Map("rev" -> "qty * (10 - price)"))
    try {
      def q = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(expr("qty * (10 - price)")).as("s"),
          min(expr("qty * (10 - price)")).as("mn"),
          max(expr("qty * (10 - price)")).as("mx"),
          avg(expr("qty * (10 - price)")).as("a"),
          count(expr("qty * (10 - price)")).as("n"))
      assert(scannedPaths(q).exists(_.contains("emv.parquet")),
        s"expression measure not navigated: ${scannedPaths(q)}")
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      MvCatalog.clear()
      val direct = q.collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      assert(got === direct)
      // A: 10*8.5 + 20*7.5 + 5*9.5 = 282.5 — wait, integral? price
      // values are *.5 so rev is *.0 or *.5; exactness still holds
      // for sums of dyadic rationals (all are k/2) — spot-pin one
      assert(got.exists { case (g, s, _, _, _, _) => g == "A" && s == 282.5 })
      // a DIFFERENT expression refuses
      MaterializedAggregate.buildAndRegister(spark, base, emv,
        Seq("g1"), Nil, exprMeasures = Map("rev" -> "qty * (10 - price)"))
      val other = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum(expr("qty * (11 - price)")).as("s"))
      assert(scannedPaths(other).exists(_.contains("fact.parquet")),
        "different expression navigated")
    } finally MvCatalog.clear()
  } }

  test("catalog save/load: a fresh registration from disk navigates identically") { withNoAqe {
    MvCatalog.clear()
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    val dir = java.nio.file.Files.createTempDirectory("mv_cat")
    val nbase = dir.resolve("fact.parquet").toString
    val plainMv = dir.resolve("plain.parquet").toString
    val partialMv = dir.resolve("partial.parquet").toString
    val catPath = dir.resolve("catalog.json").toString
    Seq(("A", "x", 10.0, 7L), ("A", "y", 20.0, 8L), ("B", "x", 7.0, 7L))
      .toDF("g1", "g2", "v", "u").write.mode("overwrite").parquet(nbase)
    MaterializedAggregate.buildAndRegister(spark, nbase, plainMv,
      Seq("g1"), Seq("v"), distinctCols = Seq("u"), hllP = 4,
      exprMeasures = Map("dv" -> "v * 2"))
    MaterializedAggregate.buildAndRegister(spark, nbase, partialMv,
      Seq("g1"), Seq("v"), baseFilter = Some("g2 = 'x'"))
    MaterializedAggregate.saveCatalog(spark, catPath)
    MvCatalog.clear()
    val loaded = MaterializedAggregate.loadCatalog(spark, catPath)
    try {
      assert(loaded.size === 2)
      // every navigation family works off the reloaded registration
      val q1 = spark.read.parquet(nbase).groupBy(col("g1"))
        .agg(sum("v").as("s"), sum(expr("v * 2")).as("s2"),
          md5(array_join(transform(
            SK.hyperLogLog(Md5Hash.h60String(col("u")), 4),
            _.cast("string")), ",")).as("d"))
      assert(scannedPaths(q1).exists(_.contains("plain.parquet")),
        s"reloaded plain rollup not navigated: ${scannedPaths(q1)}")
      val q2 = spark.read.parquet(nbase).where(col("g2") === "x")
        .groupBy(col("g1")).agg(sum("v").as("s"))
      assert(scannedPaths(q2).exists(_.contains("partial.parquet")),
        s"reloaded partial rollup not navigated: ${scannedPaths(q2)}")
      assert(q2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("A" -> 10.0, "B" -> 7.0))
    } finally MvCatalog.clear()
  } }

  test("two navigations in one plan: fresh relation instances, no shared exprIds") { withNoAqe {
    MvCatalog.clear()
    MaterializedAggregate.buildAndRegister(spark, base, mvPath,
      groupCols = Seq("g1", "g2"), measureCols = Seq("qty"))
    try {
      def half(g2: String) = spark.read.parquet(base)
        .where(col("g2") === g2).groupBy(col("g1"))
        .agg(sum("qty").as("s"))
      val q = half("x").unionAll(half("y"))
      val scans = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
      assert(scans.count(_.contains("mv.parquet")) === 2,
        s"both branches must navigate: $scans")
      // duplicate output exprIds across the two rollup reads would
      // misbind — the two branches must carry DISTINCT relation ids
      val relIds = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.output.map(_.exprId)
      }
      assert(relIds.size === 2 && relIds(0).intersect(relIds(1)).isEmpty,
        s"shared exprIds across navigations: $relIds")
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got === Map(("A", 30.0) -> 1, ("B", 7.0) -> 1,
        ("A", 5.0) -> 1, ("B", 20.0) -> 1))
    } finally MvCatalog.clear()
  } }

  test("all features in ONE rollup: partial + sketch + expression measure navigate together") { withNoAqe {
    MvCatalog.clear()
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    val dir2 = java.nio.file.Files.createTempDirectory("mv_all")
    val nbase = dir2.resolve("fact.parquet").toString
    val amv = dir2.resolve("amv.parquet").toString
    Seq(("A", "x", 10.0, 7L), ("A", "x", 20.0, 8L), ("A", "y", 30.0, 8L),
      ("B", "x", 7.0, 7L), ("B", "y", 9.0, 9L))
      .toDF("g1", "g2", "v", "u").write.mode("overwrite").parquet(nbase)
    MaterializedAggregate.buildAndRegister(spark, nbase, amv,
      groupCols = Seq("g1"), measureCols = Seq("v"),
      distinctCols = Seq("u"), hllP = 4,
      baseFilter = Some("g2 = 'x'"),
      exprMeasures = Map("dv" -> "v * 3"))
    try {
      def q = spark.read.parquet(nbase).where(col("g2") === "x")
        .groupBy(col("g1"))
        .agg(sum("v").as("s"), sum(expr("v * 3")).as("s3"),
          avg(expr("v * 3")).as("a3"),
          md5(array_join(transform(
            SK.hyperLogLog(Md5Hash.h60String(col("u")), 4),
            _.cast("string")), ",")).as("d"))
      assert(scannedPaths(q).exists(_.contains("amv.parquet")),
        s"combined rollup not navigated: ${scannedPaths(q)}")
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getString(4))).toSet
      MvCatalog.clear()
      val q2 = spark.read.parquet(nbase).where(col("g2") === "x")
        .groupBy(col("g1"))
        .agg(sum("v").as("s"), sum(expr("v * 3")).as("s3"),
          avg(expr("v * 3")).as("a3"),
          md5(array_join(transform(
            SK.hyperLogLog(Md5Hash.h60String(col("u")), 4),
            _.cast("string")), ",")).as("d"))
      val direct = q2.collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getString(4))).toSet
      assert(got === direct)
      // the sketch over the PARTIAL rollup sees only g2='x' rows: A's
      // distinct-u set under the filter is {7, 8} but {7, 8} overall
      // too — B's differs: {7} filtered vs {7, 9} overall. Pin that
      // the filtered sketch really was used (digest equality above
      // already proves it; this documents the partial+sketch law).
      assert(got.map(_._1) === Set("A", "B"))
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
