package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Measured evidence that the native reservoir aggregate WINS over
  * the window formulation exactly where the window's own Scaladoc
  * warns it dies: one stratum owning most of the corpus.
  *
  * Scenario: `rows` synthetic docs (default 8M), ONE stratum holding
  * ~90% of them (the "half the corpus is English" shape), k = 100.
  * Both forms compute the identical kept set (asserted before the
  * timed passes — the comparison is between provably-equal plans);
  * the window form range-shuffles and SORTS the 7.2M-row stratum in
  * one task chain, the aggregate form ships ≤ k pairs per partition.
  *
  * Results go to BASELINE.md's reservoir-evidence note. Run:
  *   sbt "runMain graft.ReservoirBench"   (env: SPARK_GRAFT_CPUS,
  *     SPARK_GRAFT_RESERVOIR_ROWS)
  */
object ReservoirBench {

  private def timeIt(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val rows = sys.env.get("SPARK_GRAFT_RESERVOIR_ROWS")
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .getOrElse(8000000L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(rows).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 9, lit("en"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(10)))).as("lang"))
      .persist()
    docs.count()

    def viaWindow = Sampling.fixedSizeStratified(
      docs, "lang", k = 100, keyCol = "doc_id", salt = "rb")
      .select(col("lang"), col("doc_id"))
    def viaAgg = Sampling.fixedSizeStratifiedAgg(
      docs, "lang", k = 100, keyCol = "doc_id", salt = "rb")

    // equality first: the timed plans compute the same answer
    val a = viaAgg.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = viaWindow.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    require(a == w && a.nonEmpty, s"kept sets differ: agg=${a.size} window=${w.size}")

    def minOf2(body: => Unit): Double = { timeIt(body); math.min(timeIt(body), timeIt(body)) }
    val tWindow = minOf2(materialize(viaWindow))
    val tAgg = minOf2(materialize(viaAgg))
    println(s"""{"bench":"reservoir_hot_stratum","rows":$rows,"k":100,"window_s":${f"$tWindow%.2f"},"agg_s":${f"$tAgg%.2f"},"speedup":${f"${tWindow / tAgg}%.1f"}}""")
    spark.stop()
  }
}
