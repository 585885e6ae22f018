package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Data-profiling operators — the "what is in this 100 TB table"
  * pass that precedes every pipeline decision.
  *
  * Everything is one-pass, map-side-combinable aggregation:
  * histograms are a (bin)-keyed count after a pure-integer bin
  * assignment; column profiles compute null counts and KMV
  * distinct sketches for EVERY column in a single scan (one
  * aggregate row, melted to long format) — no per-column re-scan,
  * no value-map state. Exact distinct counts ride along here for
  * gate evidence; at corpus scale you drop them and keep the
  * bounded-state sketch estimate (the point of [[SketchFunctions]]).
  */
object Profiling {

  /** Equi-width histogram of a numeric column: `nBins` bins of width
    * `(hi - lo) / nBins` over [lo, hi); out-of-range values CLAMP
    * into the edge bins (profiling convention — outliers are visible
    * at the edges, never silently dropped). Pure integer bin
    * arithmetic (micros/cents-style integral domains), exact counts.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need hi > lo and nBins > 0")
    require((hi - lo) % nBins == 0,
      s"bin width must be integral: (hi - lo) = ${hi - lo}, nBins = $nBins")
    val width = (hi - lo) / nBins
    val v = col(valueCol).cast("long")
    val bin = least(greatest(
      ZOrder.intDiv(v - lo, lit(width)), lit(0L)), lit(nBins - 1L))
    df.where(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("n"))
  }

  /** Per-column profile in ONE scan: rows (column, n_rows, n_nulls,
    * distinct_est, distinct_exact). Distinct estimation hashes each
    * column's canonical string form into the engine's 60-bit md5
    * family and sketches with `kmin_values(k)`; `distinct_exact`
    * (count distinct) is gate evidence — omit via
    * `withExact = false` at corpus scale, where the Expand it needs
    * is the expensive part.
    */
  def profile(df: DataFrame, columns: Seq[String], k: Int = 128,
      withExact: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        SketchFunctions.kminValues(
          when(col(c).isNotNull, graft.functions.Md5Hash.h60String(col(c))), k).as(s"__sk_$c")) ++
        (if (withExact) Seq(count_distinct(col(c)).as(s"__ex_$c")) else Nil)
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        SketchFunctions.kmvEstimate(col(s"__sk_$c"), k).as("distinct_est"),
        (if (withExact) col(s"__ex_$c") else lit(null).cast("long"))
          .as("distinct_exact"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
