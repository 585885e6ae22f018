package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediansSpec extends SparkSpec {

  import spark.implicits._

  test("equals builtin median across odd/even/tied/single groups") {
    // deterministic pseudo-random rows with heavy ties, many partitions
    val rows = (0 until 3000).map { i =>
      (i % 7, (i * 2654435761L) % 19)
    } ++ Seq((7, 42L)) // single-row group
    val df = rows.toDF("k", "v").repartition(16)
    val builtin = df.groupBy("k").agg(median(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val counts = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(counts === builtin)
  }

  test("null values skipped; all-null group yields no row (caller left-joins)") {
    val df = Seq(
      (1, Some(10L)), (1, None: Option[Long]), (1, Some(20L)),
      (2, None: Option[Long])).toDF("k", "v")
    val m = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m === Map(1 -> 15.0))
  }

  test("null GROUP KEY keeps its median (the g07 missing-dims shape)") {
    val df = Seq(
      (Some("a"), 10L), (Some("a"), 20L),
      (None: Option[String], 5L), (None: Option[String], 7L))
      .toDF("k", "v")
    val m = Medians.exactMedianByCounts(df, Seq("k"), "v", out = "m")
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(m === Map(Some("a") -> 15.0, None -> 6.0))
  }

  test("exactQuantilesByCounts: discrete ranks vs brute force, duplicates, p0/p100") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (if (g == "a") 101 else 40) // odd and even sizes
    } yield (g, rnd.nextInt(50).toLong)     // heavy duplicates
    val df = rows.toDF("g", "v")
    val got = graft.operators.Medians.exactQuantilesByCounts(
      df, Seq("g"), "v",
      Seq(("p0", 0, 1), ("p25", 1, 4), ("p50", 1, 2),
        ("p75", 3, 4), ("p100", 1, 1)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    for (g <- Seq("a", "b", "c")) {
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      val n = sorted.length
      def rank(num: Int, den: Int) = sorted(((n - 1).toLong * num / den).toInt)
      val (p0, p25, p50, p75, p100, nv) = got(g)
      assert(p0 === rank(0, 1), s"$g p0")
      assert(p25 === rank(1, 4), s"$g p25")
      assert(p50 === rank(1, 2), s"$g p50")
      assert(p75 === rank(3, 4), s"$g p75")
      assert(p100 === rank(1, 1), s"$g p100")
      assert(nv === n.toLong)
    }
  }

  test("exactQuantilesByCounts p50 == exactMedianByCounts on odd-sized groups") {
    import spark.implicits._
    val df = Seq(("g", 5L), ("g", 1L), ("g", 9L)).toDF("k", "v")
    val q = graft.operators.Medians.exactQuantilesByCounts(
      df, Seq("k"), "v", Seq(("p50", 1, 2))).collect().head.getLong(1)
    val m = graft.operators.Medians.exactMedianByCounts(
      df, Seq("k"), "v").collect().head.getDouble(1)
    assert(q.toDouble === m)
  }

  test("filterAtOrAboveQuantile: global P75 vs brute force, ties at the threshold kept, nulls dropped") {
    import spark.implicits._
    // 0..99 plus five extra copies of 75 (ties AT the P75 boundary)
    // and nulls that must not count toward ranks
    val vals = (0L to 99L) ++ Seq.fill(5)(75L)
    val df = (vals.map(Option(_)) ++ Seq.fill(7)(Option.empty[Long]))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val kept = graft.operators.Medians.filterAtOrAboveQuantile(df, "v", 3, 4)
      .collect().map(_.getLong(1))
    // brute: sorted non-nulls, 0-based rank floor((105-1)*3/4) = 78 -> value 74
    val sorted = vals.sorted
    val thr = sorted(((sorted.size - 1) * 3) / 4)
    assert(kept.min === thr)
    assert(kept.length === sorted.count(_ >= thr))
    assert(kept.count(_ == 75L) === 6) // all boundary ties survive

    // per-group: each group filters by its OWN quantile
    val g = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 20L))
      .toDF("k", "v")
    val byKey = graft.operators.Medians.filterAtOrAboveQuantile(
      g, "v", 1, 2, keys = Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: n=3 rank 1 -> 2; b: n=2 rank 0 -> 10
    assert(byKey === Set(("a", 2L), ("a", 3L), ("b", 10L), ("b", 20L)))
  }
}
