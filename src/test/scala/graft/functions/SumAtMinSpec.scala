package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SumAtMin]] semantics, checked against the equivalent (and more
  * expensive) window-min formulation on a many-partition frame so the
  * partial/merge path is actually exercised.
  */
class SumAtMinSpec extends SparkSpec {

  import spark.implicits._

  test("equals the window-min formulation across shuffled partitions") {
    // deterministic pseudo-random rows: 8 keys x ~500 rows, ords with
    // heavy floor ties, spread over 16 partitions so map-side partials
    // merge in every task
    val rows = (0 until 4000).map { i =>
      val k = i % 8
      val ord = (i * 2654435761L) % 7 // 0..6, many ties
      val v = (i % 13).toLong
      (k, ord, v)
    }
    val df = rows.toDF("k", "ord", "v").repartition(16)

    val got = df.groupBy("k")
      .agg(AggregateFunctions.sumAtMin(col("v"), col("ord")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    val expect = rows.groupBy(_._1).map { case (k, rs) =>
      val floor = rs.map(_._2).min
      k -> rs.filter(_._2 == floor).map(_._3).sum
    }
    assert(got === expect)
  }

  test("null ords are skipped; null values count 0; all-null group is NULL") {
    val df = Seq(
      (1, Some(5L), Some(10L)),
      (1, Some(5L), None: Option[Long]), // null v at floor: counts 0
      (1, Some(7L), Some(99L)),
      (1, None: Option[Long], Some(50L)), // null ord: never at floor
      (2, None: Option[Long], Some(3L))) // all-null ord group
      .toDF("k", "ord", "v")
    val got = df.groupBy("k")
      .agg(AggregateFunctions.sumAtMin(col("v"), col("ord")).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1) === Some(10L))
    assert(got(2) === None)
  }

  test("sum_at_min is callable from SQL (extensions registration)") {
    Seq((1L, 5L, 2L), (1L, 5L, 3L), (1L, 9L, 100L))
      .toDF("k", "ord", "v").createOrReplaceTempView("sam_t")
    val r = spark.sql(
      "SELECT sum_at_min(v, ord) AS s FROM sam_t GROUP BY k").head()
    assert(r.getLong(0) === 5L)
  }
}
