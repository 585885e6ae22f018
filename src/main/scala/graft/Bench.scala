package graft
import org.apache.spark.sql.SparkSession

/** Perf harness: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Each query is materialized through the `noop` sink — a full
  * computation of every output column. (`df.count()` would let Catalyst
  * prune all projections down to a row count, timing a different,
  * cheaper plan than the query's.)
  *
  * Failures are reported explicitly as -1 (never as elapsed-until-throw,
  * which would fake a fast timing for a broken query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated name filter for isolating single queries
    // (perf triage); the driver never sets it, so driver runs time all.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup: run everything once at the smallest sf so the
    // timed loop measures steady-state plans, not first-query JVM
    // compilation. Skipped if the bench target IS the smallest sf
    // (warming there would pre-fill the session mart caches and make
    // the timed numbers serving-only).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
      // evict the warmup-scale materializations: the timed loop should
      // own the block manager
      graft.queries.TestdataAdapter.clearCache(spark, warmDir)
    }
    var failed = Set.empty[String]
    // Two full timed passes with the mart cache cleared in between
    // (so EVERY pass recomputes marts exactly like a fresh run), then
    // per-query min across passes. A single sample is hostage to
    // transient host load / GC (observed 4-23 s swings on the heavy
    // marts); the min of two equivalent passes is the steady-state
    // cost of the plan, which is what the 2x gate should judge.
    def timedPass(): Map[String, Double] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
            false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue)
      }.toMap
    val pass1 = timedPass()
    graft.queries.TestdataAdapter.clearCache(spark, sfDir)
    val pass2 = timedPass()
    val results = pass1.keys.toSeq.sorted.map { name =>
      val t = math.min(pass1(name), pass2(name))
      name -> (if (t == Double.MaxValue) -1.0 else t)
    }
    failed = failed.filter(n => results.toMap.get(n).contains(-1.0))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
