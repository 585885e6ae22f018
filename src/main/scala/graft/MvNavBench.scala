package graft

import org.apache.spark.sql.functions._

/** Micro-bench isolating WHAT MV navigation buys at a given fact
  * scale: the p116-shape query timed (a) navigated — answered from a
  * freshly-built (returnflag, linestatus) rollup — and (b) direct —
  * catalog cleared, same query against the fact scan. The per-round
  * Bench gates time build+query together (the honest gate shape);
  * this main splits them so BASELINE.md can show the query-side cost
  * staying rollup-sized while the direct scan grows with the data —
  * the number a 100 TB deployment actually cares about.
  *
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.MvNavBench"
  * Prints one JSON line: build / navigated (min of 3) / direct
  * (min of 3) seconds plus the fact row count.
  */
object MvNavBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt, "graft-navbench")
    val basePath = s"$dir/lineitem.parquet"
    val mvPath = java.nio.file.Files.createTempDirectory("graft_navbench")
      .resolve("mv.parquet").toString
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def q = spark.read.parquet(basePath)
      .where(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"),
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"),
        avg("l_quantity").as("avg_qty"))

    // round 14: the grouping-sets twin — GROUP BY ROLLUP replays the
    // Expand over the rollup, so the navigated side replicates
    // |groups| × sets rows where the direct side replicates the fact
    def qr = spark.read.parquet(basePath)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"),
        min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))

    val nRows = spark.read.parquet(basePath).count()
    val tBuild = time(graft.plans.MaterializedAggregate.buildAndRegister(
      spark, basePath, mvPath,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity")))
    val nav = (1 to 3).map(_ => time(q.collect())).min
    val navRollup = (1 to 3).map(_ => time(qr.collect())).min
    graft.plans.MvCatalog.clear()
    val direct = (1 to 3).map(_ => time(q.collect())).min
    val directRollup = (1 to 3).map(_ => time(qr.collect())).min
    println(s"""{"metric":"mv_nav","fact_rows":$nRows,"build_sec":${
      f"$tBuild%.3f"},"navigated_sec":${f"$nav%.3f"},"direct_sec":${
      f"$direct%.3f"},"rollup_navigated_sec":${f"$navRollup%.3f"
      },"rollup_direct_sec":${f"$directRollup%.3f"},"sf":"$dir"}""")

    // ---- serve_daily_summary navigated-vs-fact-scan (round 17,
    // verdict ask #5): the reference's core read path (`main.py:36-42`)
    // through the REAL serving function, p134-style decade protocol.
    // The aggregatable G1 slice over the sf-dir's silver fact is
    // answered (a) navigated — from the (item_id, snapshot_date)
    // rollup the st33 maintainer family materializes — and (b) direct
    // — catalog cleared, same serving call against the fact scan. The
    // facts decade (ScaleData facts mode) replicates lineitem over the
    // SAME part population, so the rollup's group count is constant
    // while the fact side grows 10×: navigated serving must stay flat.
    val tmpServe = java.nio.file.Files.createTempDirectory("graft_navbench_serve")
    val stage = tmpServe.resolve("silver_fact").toString
    val mvServe = tmpServe.resolve("mv_serve.parquet").toString
    graft.queries.TestdataAdapter.silverFromLineitem(spark, dir)
      .write.parquet(stage)
    def g1Lite = spark.read.parquet(stage)
      .groupBy(col("item_id"), col("snapshot_date"))
      .agg(min(col("unit_price")).as("min_buyout"),
        max(col("unit_price")).as("max_buyout"),
        sum(col("quantity")).as("quantity_available"),
        sum(col("unit_price") * col("quantity")).as("market_cap"),
        count(lit(1)).as("auction_count"))
    def serveQ = graft.serving.ServingLayer.dailySummary(
      g1Lite, itemId = None, limit = 100)
    val silverRows = spark.read.parquet(stage).count()
    val tBuildServe = time(graft.plans.MaterializedAggregate.buildAndRegister(
      spark, stage, mvServe, Seq("item_id", "snapshot_date"),
      Seq("unit_price", "quantity"),
      exprMeasures = Map("market_cap" -> "unit_price * quantity")))
    val serveNav = (1 to 3).map(_ => time(serveQ.collect())).min
    graft.plans.MvCatalog.clear()
    val serveDirect = (1 to 3).map(_ => time(serveQ.collect())).min
    println(s"""{"metric":"mv_nav_serve","silver_rows":$silverRows,"build_sec":${
      f"$tBuildServe%.3f"},"navigated_sec":${f"$serveNav%.3f"
      },"direct_sec":${f"$serveDirect%.3f"},"sf":"$dir"}""")
    spark.stop()
  }
}
