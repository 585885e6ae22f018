package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property layer for the round-14 MV extensions:
  *
  *  - RETRACTION SOUNDNESS: for random NULL-bearing facts, random
  *    batch splits and a random group-commuting delete predicate,
  *    `retract` + fold answers EXACTLY like re-aggregating the base
  *    with the same rows deleted (NOT-TRUE semantics: NULL-key groups
  *    survive on both sides). This is the law p134 pins once at the
  *    medallion shape, here across draws.
  *  - HAVING NAVIGATION: a Filter above the Aggregate never changes
  *    answers under navigation — navigated == direct for random facts
  *    and thresholds, with the rewrite REQUIRED to fire.
  *  - ROLLUP/CUBE NAVIGATION: the Expand replay answers exactly like
  *    the base across random NULL-bearing facts (real NULL groups vs
  *    super-rows), with the rewrite REQUIRED to fire.
  *
  * Raw ScalaCheck Gen with fixed seeds, as in Round11/12PropertiesSpec.
  */
class Round14PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(1400L + i)).get)

  // facts: nullable grouping key d (the retention column), second key
  // g, integral-valued measure v (re-associated sums bit-exact)
  private val factsGen: Gen[List[(Option[String], String, Double)]] =
    Gen.listOfN(60, Gen.zip(
      Gen.frequency(
        8 -> Gen.oneOf("d1", "d2", "d3", "d4").map(Some(_)),
        1 -> Gen.const(Option.empty[String])),
      Gen.oneOf("x", "y", "z"),
      Gen.chooseNum(-30L, 30L).map(_.toDouble)))

  test("law: retract == delete-then-reaggregate, across random splits and predicates") {
    val cutoffs = Seq("d2", "d3", "d4")
    samples(factsGen, 4).zipWithIndex.foreach { case (rows, i) =>
      val cutoff = cutoffs(i % cutoffs.length)
      val tmp = java.nio.file.Files.createTempDirectory(s"r14p_$i")
      val mvPath = tmp.resolve("mv.parquet").toString
      val df = rows.toDF("d", "g", "v")
      // random 2-way batch split keyed on the measure's parity
      graft.streaming.StreamingMvMaintenance.processBatch(
        df.where(col("v").cast("long") % 2 === 0), 0L, mvPath,
        Seq("d", "g"), Seq("v"))
      graft.streaming.StreamingMvMaintenance.processBatch(
        df.where(col("v").cast("long") % 2 =!= 0), 1L, mvPath,
        Seq("d", "g"), Seq("v"))
      graft.streaming.StreamingMvMaintenance.retract(
        spark, mvPath, s"d < '$cutoff'")
      val folded = spark.read.parquet(mvPath)
        .groupBy(col("d"), col("g"))
        .agg(sum(col("sum_v")).as("s"), sum(col("cnt")).as("n"),
          min(col("min_v")).as("mn"), max(col("max_v")).as("mx"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getString(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      // base side: DELETE WHERE d < cutoff keeps NOT-TRUE rows (NULL
      // d survives), then re-aggregate
      val expected = df.where(!coalesce(col("d") < cutoff, lit(false)))
        .groupBy(col("d"), col("g"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getString(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      assert(folded === expected,
        s"draw $i cutoff $cutoff: retraction diverged from the base delete")
    }
  }

  test("law: ROLLUP/CUBE navigation == direct, across random NULL-bearing facts") { withNoAqe {
    // the Expand-replay soundness law across draws: for random facts
    // (NULL grouping keys included — the exact conflation the
    // round-13 refusal worried about), navigated grouping-sets
    // answers equal the base's, with the rewrite REQUIRED to fire.
    // Draws alternate rollup and cube to cover both projection sets.
    samples(factsGen, 4).zipWithIndex.foreach { case (rows, i) =>
      MvCatalog.clear()
      val tmp = java.nio.file.Files.createTempDirectory(s"r14r_$i")
      val base = tmp.resolve("fact.parquet").toString
      val mv = tmp.resolve("mv.parquet").toString
      rows.toDF("d", "g", "v").write.mode("overwrite").parquet(base)
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        Seq("d", "g"), Seq("v"))
      def q = {
        val grouped =
          if (i % 2 == 0)
            spark.read.parquet(base).rollup(col("d"), col("g"))
          else
            spark.read.parquet(base).cube(col("d"), col("g"))
        grouped.agg(grouping_id().as("gid"), sum("v").as("s"),
          count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"))
      }
      try {
        val paths = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
        assert(paths.exists(_.contains("mv.parquet")),
          s"draw $i: grouping-sets query did not navigate: $paths")
        assert(!paths.exists(_.contains("fact.parquet")),
          s"draw $i: fact still scanned: $paths")
        val navigated = q.collect().map(_.toSeq).toSet
        MvCatalog.clear()
        val direct = q.collect().map(_.toSeq).toSet
        assert(navigated === direct, s"draw $i: grouping-sets diverged")
      } finally MvCatalog.clear()
    }
  } }

  test("law: HAVING above a navigated aggregate — navigated == direct, rewrite required") { withNoAqe {
    samples(factsGen, 3).zipWithIndex.foreach { case (rows, i) =>
      MvCatalog.clear()
      val tmp = java.nio.file.Files.createTempDirectory(s"r14h_$i")
      val base = tmp.resolve("fact.parquet").toString
      val mv = tmp.resolve("mv.parquet").toString
      rows.toDF("d", "g", "v").write.mode("overwrite").parquet(base)
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        Seq("d", "g"), Seq("v"))
      val threshold = i + 1 // varies which groups the HAVING keeps
      def q = spark.read.parquet(base)
        .groupBy(col("d"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .where(col("n") > threshold)
      try {
        val paths = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.relation.location.rootPaths.map(_.toUri.getPath)
        }.flatten
        assert(paths.exists(_.contains("mv.parquet")),
          s"draw $i: HAVING query did not navigate: $paths")
        val navigated = q.collect().map(_.toSeq).toSet
        MvCatalog.clear()
        val direct = q.collect().map(_.toSeq).toSet
        assert(navigated === direct, s"draw $i: HAVING answers diverged")
      } finally MvCatalog.clear()
    }
  } }
}
