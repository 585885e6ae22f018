package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import SketchFunctions.{cmEstimate, countMin}

/** [[CountMin]] / [[SketchFunctions.cmEstimate]]: grid shape,
  * order/partition invariance, never-underestimate, exactness without
  * collisions, null skipping, SQL registration.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 32

  test("collision-free values estimate exactly; estimate never underestimates") {
    // h2 = 0 (h < 2^30) and h1 < width: every depth row maps value h
    // to bucket h — all distinct, so the min counter IS the count
    val rows = Seq.fill(3)(5L) ++ Seq.fill(7)(9L) ++ Seq(11L)
    val sk = rows.toDF("h").agg(countMin(col("h"), depth, width).as("s"))
    val got = sk.select(
      cmEstimate(col("s"), lit(5L), depth, width).as("e5"),
      cmEstimate(col("s"), lit(9L), depth, width).as("e9"),
      cmEstimate(col("s"), lit(11L), depth, width).as("e11"),
      cmEstimate(col("s"), lit(12L), depth, width).as("absent"))
      .collect().head
    assert(got.getLong(0) === 3L)
    assert(got.getLong(1) === 7L)
    assert(got.getLong(2) === 1L)
    assert(got.getLong(3) === 0L) // bucket 12 untouched
  }

  test("sketch is invariant under partitioning and row order") {
    val hashed = (1L to 5000L).map(_.toString).toDF("s")
      .select(Md5Hash.h60(col("s")).as("h"))
    val one = hashed.coalesce(1)
      .agg(countMin(col("h"), depth, width)).collect().head.getSeq[Long](0)
    val many = hashed.repartition(13, col("h"))
      .agg(countMin(col("h"), depth, width)).collect().head.getSeq[Long](0)
    assert(one === many)
    assert(one.length === depth * width)
    // every depth row saw every occurrence once
    val perRow = one.grouped(width).map(_.sum).toSeq
    assert(perRow === Seq.fill(depth)(5000L))
  }

  test("estimates dominate exact counts on a real token stream") {
    val toks = Seq("a b a c", "b a d d", "a e").toDF("text")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(col("tok"), Md5Hash.h60(col("tok")).as("h"))
    val sk = toks.agg(countMin(col("h"), depth, width).as("s"))
    val bad = toks.groupBy(col("tok"), col("h")).agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .where(cmEstimate(col("s"), col("h"), depth, width) < col("exact"))
    assert(bad.count() === 0L)
  }

  test("null hashes are skipped; empty group evaluates to a zero grid") {
    val sk = Seq[Option[Long]](Some(5L), None, Some(5L)).toDF("h")
      .agg(countMin(col("h"), depth, width).as("s"))
      .select(cmEstimate(col("s"), lit(5L), depth, width))
      .collect().head.getLong(0)
    assert(sk === 2L)
    val empty = Seq.empty[Long].toDF("h")
      .agg(countMin(col("h"), depth, width)).collect().head.getSeq[Long](0)
    assert(empty === Seq.fill(depth * width)(0L))
  }

  test("count_min is SQL-registered") {
    Seq(1L, 1L, 2L).toDF("h").createOrReplaceTempView("cms_in")
    val grid = spark.sql(s"SELECT count_min(h, $depth, $width) AS s FROM cms_in")
      .collect().head.getSeq[Long](0)
    assert(grid.grouped(width).map(_.sum).toSeq === Seq.fill(depth)(3L))
  }
}
