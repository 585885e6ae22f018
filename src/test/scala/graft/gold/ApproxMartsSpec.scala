package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TestdataAdapter._

/** The 100 TB approx variant of G1 must be a drop-in: same schema,
  * identical non-median columns, and a median whose rank error honors
  * the percentile_approx contract (<= n/accuracy, +1 rank slop) —
  * verified against the group's actual price multiset, not just
  * eyeballed bounds.
  */
class ApproxMartsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx G1: same schema, exact non-median columns, bounded median rank error") {
    val silver = silverFromLineitem(spark, dir)
    val dims = dimsFromPart(spark, dir)
    val exact = Marts.dailyMarketSummary(silver, dims)
    val approx = Marts.dailyMarketSummaryApprox(silver, dims, accuracy = 10000)

    assert(approx.schema === exact.schema)

    val keys = Seq("item_id", "snapshot_date")
    val joined = exact.select(col("item_id"), col("snapshot_date"),
        col("min_buyout").as("e_min"), col("max_buyout").as("e_max"),
        col("quantity_available").as("e_q"), col("market_cap").as("e_cap"),
        col("auction_count").as("e_n"))
      .join(approx.select(col("item_id"), col("snapshot_date"),
        col("min_buyout").as("a_min"), col("max_buyout").as("a_max"),
        col("quantity_available").as("a_q"), col("market_cap").as("a_cap"),
        col("median_buyout").as("a_med")), keys)
    assert(joined.where(
      col("e_min") =!= col("a_min") || col("e_max") =!= col("a_max") ||
        col("e_q") =!= col("a_q") || col("e_cap") =!= col("a_cap")).count() === 0)

    // rank contract per group: #(price < approxMedian) and
    // #(price <= approxMedian) must bracket rank n/2 within
    // n/accuracy (+1 slop for the sketch's returned-sample rounding)
    val prices = silver.select(col("item_id"), col("snapshot_date"), col("unit_price"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getDate(1).toString))
      .view.mapValues(_.map(_.getLong(2)).sorted).toMap
    val meds = joined.select(col("item_id"), col("snapshot_date"), col("a_med"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(meds.nonEmpty)
    meds.foreach { case (k, med) =>
      val ps = prices(k)
      val n = ps.length
      // the sketch returns an actual observed value
      assert(ps.contains(med.toLong), s"$k: $med not an observed price")
      val tol = n.toDouble / 10000 + 1
      val below = ps.count(_ < med)
      val atOrBelow = ps.count(_ <= med)
      assert(below <= n / 2.0 + tol, s"$k: rank too high ($below of $n)")
      assert(atOrBelow >= n / 2.0 - tol, s"$k: rank too low ($atOrBelow of $n)")
    }
  }
}
