package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property layer for the round-12 MV extensions: the star-join
  * soundness law (navigated == direct over random NULL-bearing facts
  * and adversarial dims — duplicate keys, missing keys, unmatched
  * keys — under both INNER and LEFT OUTER), the expression-grouping
  * law (f(grouping col) re-aggregates exactly), and the compaction
  * identity (random partial splits fold to the one-shot answers).
  * Raw ScalaCheck `Gen` with fixed seeds, as in Round11PropertiesSpec.
  */
class Round12PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(100L + i)).get)

  // fact: nullable join/grouping key g1 (NULL keys stress the
  // INNER-drops / LEFT-keeps symmetry), second key g2, nullable
  // integral-valued measure v
  private val factsGen: Gen[List[(Option[String], String, Option[Double])]] =
    Gen.listOfN(40, Gen.zip(
      Gen.frequency(
        6 -> Gen.oneOf("A", "B", "C").map(Some(_)),
        1 -> Gen.const(Option.empty[String])),
      Gen.oneOf("x", "y"),
      Gen.frequency(
        4 -> Gen.chooseNum(-20L, 20L).map(n => Some(n.toDouble)),
        1 -> Gen.const(Option.empty[Double]))))

  // dim: duplicate keys allowed, keys the fact lacks ("D"), and
  // fact keys the dim lacks (random subsets)
  private val dimGen: Gen[List[(String, String)]] =
    Gen.listOfN(5, Gen.zip(
      Gen.oneOf("A", "B", "C", "D"),
      Gen.oneOf("a1", "a2", "a3")))

  private def writeFacts(rows: List[(Option[String], String, Option[Double])])
      : (String, String, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("r12prop")
    rows.toDF("g1", "g2", "v").write.mode("overwrite")
      .parquet(dir.resolve("fact.parquet").toString)
    (dir.resolve("fact.parquet").toString,
      dir.resolve("mv.parquet").toString, dir)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) null else r.get(i)).toList)
      .groupBy(identity).view.mapValues(_.size).toMap // multiset

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toUri.getPath)
    }.flatten

  test("star-join soundness: navigated == direct over random facts x dims x join type (6 samples)") { withNoAqe {
    val dims = samples(dimGen, 6)
    for ((rows, i) <- samples(factsGen, 6).zipWithIndex) {
      val (base, mv, dir) = writeFacts(rows)
      val dimPath = dir.resolve("dim.parquet").toString
      dims(i).toDF("k", "label").write.mode("overwrite").parquet(dimPath)
      MvCatalog.clear()
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        groupCols = Seq("g1", "g2"), measureCols = Seq("v"))
      val joinType = if (i % 2 == 0) "inner" else "left"
      def q = {
        val fact = spark.read.parquet(base)
        val dim = spark.read.parquet(dimPath)
        fact.join(dim, fact("g1") === dim("k"), joinType)
          .groupBy(col("label"), col("g2"))
          .agg(sum("v").as("s"), count(lit(1)).as("n"),
            count(col("v")).as("nv"), min("v").as("mn"),
            max("v").as("mx"), avg("v").as("a"))
      }
      val navigated = q
      val scans = scansOf(navigated)
      assert(scans.exists(_.contains("mv.parquet")),
        s"sample $i ($joinType): no navigation: $scans")
      assert(!scans.exists(_.contains("fact.parquet")),
        s"sample $i ($joinType): fact still scanned")
      val got = rowsOf(navigated)
      MvCatalog.clear()
      assert(got === rowsOf(q),
        s"sample $i ($joinType): navigated != direct\nfacts=$rows\ndim=${dims(i)}")
    }
  } }

  test("expression-grouping soundness: f(grouping cols) navigated == direct (5 samples)") { withNoAqe {
    for ((rows, i) <- samples(factsGen, 5).zipWithIndex) {
      val (base, mv, _) = writeFacts(rows)
      MvCatalog.clear()
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        groupCols = Seq("g1", "g2"), measureCols = Seq("v"))
      // an expression mixing BOTH grouping columns, null-sensitive
      def q = spark.read.parquet(base)
        .groupBy(concat_ws("|", col("g1"), col("g2")).as("gx"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"), avg("v").as("a"))
      val navigated = q
      assert(scansOf(navigated).exists(_.contains("mv.parquet")),
        s"sample $i: no navigation")
      val got = rowsOf(navigated)
      MvCatalog.clear()
      assert(got === rowsOf(q), s"sample $i: navigated != direct on $rows")
    }
  } }

  test("compaction identity: random partial splits fold to the one-shot rollup (4 samples)") { withNoAqe {
    for ((rows, i) <- samples(factsGen, 4).zipWithIndex) {
      val (base, mv, dir) = writeFacts(rows)
      val incPath = dir.resolve("inc.parquet").toString
      val facts = spark.read.parquet(base)
      // split into 1 + (i % 3) random batches by row hash
      val nBatches = 1 + (i % 3 + 1)
      (0 until nBatches).foreach { b =>
        graft.streaming.StreamingMvMaintenance.processBatch(
          facts.where(pmod(xxhash64(col("g1"), col("g2"), col("v")),
            lit(nBatches)) === b),
          b.toLong, incPath, Seq("g1", "g2"), Seq("v"))
      }
      assert(graft.streaming.StreamingMvMaintenance.compact(spark, incPath)
        === nBatches)
      MvCatalog.clear()
      MaterializedAggregate.registerExisting(spark, base, incPath,
        Seq("g1", "g2"), Seq("v"), maintained = true)
      def q = spark.read.parquet(base).groupBy(col("g1"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          count(col("v")).as("nv"), min("v").as("mn"), max("v").as("mx"))
      val navigated = q
      assert(scansOf(navigated).exists(_.contains("inc.parquet")),
        s"sample $i: compacted rollup not navigated")
      val got = rowsOf(navigated)
      MvCatalog.clear()
      assert(got === rowsOf(q),
        s"sample $i: compacted-navigated != direct on $rows")
    }
  } }

  test("advisor/rule parity: every recommendation navigates its own workload, answers exact (5 samples)") { withNoAqe {
    // random workload shapes over random facts: whatever the advisor
    // recommends, the rule must then USE for the very queries it was
    // extracted from — the advisor's core invariant
    for ((rows, i) <- samples(factsGen, 5).zipWithIndex) {
      val (base, _, dir) = writeFacts(rows)
      MvCatalog.clear()
      def fact = spark.read.parquet(base)
      val workload: Seq[() => org.apache.spark.sql.DataFrame] = Seq(
        () => fact.groupBy(col("g1")).agg(sum("v").as("s")),
        () => fact.where(col("g2") === "x").groupBy(col("g1"))
          .agg(count(lit(1)).as("n"), avg("v").as("a")),
        () => fact.groupBy(col("g1"), col("g2"))
          .agg(min("v").as("mn"), max("v").as("mx")),
        () => fact.groupBy(concat_ws("|", col("g1"), col("g2")).as("gx"))
          .agg(count(col("v")).as("nv"))).take(2 + i % 3)
      val recs = MvAdvisor.recommend(spark, workload.map(_()),
        minCompression = 1.0) // parity law, not sizing: accept all
      assert(recs.nonEmpty, s"sample $i: nothing recommended")
      MvAdvisor.buildRecommended(spark, recs,
        dir.resolve("advised").toString)
      workload.zipWithIndex.foreach { case (mk, qi) =>
        val q = mk()
        val scans = scansOf(q)
        assert(scans.exists(_.contains("advised")),
          s"sample $i query $qi: recommendation not navigated: $scans")
        assert(!scans.exists(_.contains("fact.parquet")),
          s"sample $i query $qi: fact still scanned")
        val got = rowsOf(q)
        MvCatalog.clear()
        assert(got === rowsOf(mk()),
          s"sample $i query $qi: navigated != direct on $rows")
        // re-register for the next workload member
        MvAdvisor.buildRecommended(spark, recs,
          dir.resolve("advised").toString)
      }
      MvCatalog.clear()
    }
  } }
}
