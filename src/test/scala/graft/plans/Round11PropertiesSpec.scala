package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property layer for the round-11 session operators: randomized
  * inputs asserting the invariants that hold by construction —
  * above all the MV-navigation SOUNDNESS law (navigated == direct on
  * arbitrary data, the one law every rewrite case must obey), the
  * integer-PageRank reference equality, the register-fold identity
  * and the pair-curation reference. Raw ScalaCheck `Gen` with fixed
  * seeds (the scalatest-plus bridge isn't in the offline cache).
  */
class Round11PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (1 to n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  // (g1, g2, v: nullable integral-valued double, u: small-domain long)
  private val factsGen: Gen[List[(String, String, Option[Double], Long)]] =
    Gen.listOfN(40, Gen.zip(
      Gen.oneOf("A", "B", "C"),
      Gen.oneOf("x", "y"),
      Gen.frequency(
        4 -> Gen.chooseNum(-20L, 20L).map(n => Some(n.toDouble)),
        1 -> Gen.const(Option.empty[Double])),
      Gen.chooseNum(0L, 9L)))

  private def writeFacts(rows: List[(String, String, Option[Double], Long)]): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("r11prop")
    val base = dir.resolve("fact.parquet").toString
    rows.toDF("g1", "g2", "v", "u").write.mode("overwrite").parquet(base)
    (base, dir.resolve("mv.parquet").toString)
  }

  test("MV navigation soundness: navigated == direct on random NULL-bearing frames (6 samples)") { withNoAqe {
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    for (rows <- samples(factsGen, 6)) {
      val (base, mv) = writeFacts(rows)
      MvCatalog.clear()
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        groupCols = Seq("g1", "g2"), measureCols = Seq("v"),
        distinctCols = Seq("u"), hllP = 4)
      def q = spark.read.parquet(base)
        .where(col("g2") === "x")
        .groupBy(col("g1"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          count(col("v")).as("nv"), min("v").as("mn"), max("v").as("mx"),
          avg("v").as("a"),
          md5(array_join(transform(
            SK.hyperLogLog(Md5Hash.h60String(col("u")), 4),
            _.cast("string")), ",")).as("d"))
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) null else r.get(i)).toList).toSet
      val navigated = q
      assert(rowsOf(navigated).nonEmpty || rows.forall(_._2 != "x"))
      // plan really navigated (when any 'x' rows exist the rollup has
      // content; either way the scan must be the rollup)
      val scans = navigated.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
      assert(scans.exists(_.contains("mv.parquet")), s"no navigation: $scans")
      val got = rowsOf(navigated)
      MvCatalog.clear()
      assert(got === rowsOf(q), s"navigated != direct on $rows")
    }
  } }

  test("partial-MV soundness: navigated == direct under the repeated predicate (5 samples)") { withNoAqe {
    for (rows <- samples(factsGen, 5)) {
      val (base, mv) = writeFacts(rows)
      MvCatalog.clear()
      MaterializedAggregate.buildAndRegister(spark, base, mv,
        groupCols = Seq("g1"), measureCols = Seq("v"),
        baseFilter = Some("g2 = 'x'"))
      def q = spark.read.parquet(base).where(col("g2") === "x")
        .groupBy(col("g1"))
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"))
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) null else r.get(i)).toList).toSet
      val nav = q
      val scans = nav.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
      assert(scans.exists(_.contains("mv.parquet")), s"no navigation: $scans")
      val got = rowsOf(nav)
      MvCatalog.clear()
      assert(got === rowsOf(q), s"partial navigation diverged on $rows")
    }
  } }

  test("integer PageRank equals an in-memory reference on random multigraphs (8 samples)") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(24, Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
    for (edges <- samples(edgesGen, 8)) {
      val got = graft.pipeline.LinkGraph.pageRankUnits(
        edges.toDF("src", "dst"), iterations = 3, scale = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain Scala maps, same integer recurrence
      val vertices = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var rank = vertices.map(_ -> 1000000L).toMap
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        edges.foreach { case (s, d) =>
          contrib(d) += (rank(s) * 85L) / (100L * outdeg(s))
        }
        rank = vertices.map(v => v -> (150000L + contrib(v))).toMap
      }
      assert(got === rank, s"diverged on $edges")
    }
  }

  test("HllMergeAgg fold over random splits == one-shot sketch (6 samples)") {
    import graft.functions.{SketchFunctions => SK, Md5Hash}
    val valsGen: Gen[List[(Long, Int)]] =
      Gen.listOfN(50, Gen.zip(Gen.chooseNum(0L, 200L), Gen.chooseNum(0, 2)))
    for (rows <- samples(valsGen, 6)) {
      val df = rows.toDF("u", "part")
      val oneShot = df.agg(SK.hyperLogLog(Md5Hash.h60String(col("u")), 4)
        .as("r")).collect().head.getSeq[Long](0)
      val folded = df.groupBy(col("part"))
        .agg(SK.hyperLogLog(Md5Hash.h60String(col("u")), 4).as("r"))
        .agg(SK.hllMergeAgg(col("r"), 4).as("m"))
        .collect().head.getSeq[Long](0)
      assert(folded === oneShot, s"fold diverged on $rows")
    }
  }

  test("pairCuration equals a reference verdict computation (5 samples)") {
    import graft.pipeline.Multimodal
    // pool of 4 distinct image contents; captions claim true or false
    // dims; quality toggles via token count
    val pairGen: Gen[List[(Long, Int, Boolean, Boolean)]] =
      Gen.listOfN(18, Gen.zip(
        Gen.chooseNum(0, 3), Gen.oneOf(true, false), Gen.oneOf(true, false)))
        .map(_.zipWithIndex.map { case ((img, ok, good), i) =>
          (i.toLong, img, ok, good) })
    val dims = Array((8, 9), (10, 8), (9, 9), (12, 10))
    for (rows <- samples(pairGen, 5)) {
      val df = rows.map { case (id, img, aligned, goodCap) =>
        val (w, h) = dims(img)
        val (cw, ch) = if (aligned) (w, h) else (w + 1, h)
        val caption =
          if (goodCap) s"a longer caption with size ${cw}x$ch inside"
          else s"${cw}x$ch"
        (id, Multimodal.syntheticPng(img.toLong * 37, w, h), caption)
      }.toDF("pair_id", "payload", "caption")
      val got = Multimodal.pairCuration(df, minCaptionTokens = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
      // reference: keeper = min id per image among aligned+good pairs
      val pass = rows.filter(r => r._3 && r._4)
      val keeper = pass.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
      rows.foreach { case (id, img, aligned, goodCap) =>
        val expect = (aligned, goodCap,
          aligned && goodCap && keeper.get(img).contains(id))
        assert(got(id) === expect, s"pair $id diverged on $rows")
      }
    }
  }
}
