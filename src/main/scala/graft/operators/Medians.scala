package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact group medians without per-group value maps.
  *
  * Spark's builtin `median`/`percentile` is a TypedImperativeAggregate
  * whose buffer is an OpenHashMap of every distinct value in the
  * group — the map is built in memory, serialized into the shuffle,
  * and merged on the reducer. A hot group's distinct-value set lives
  * in one task's heap: the classic scale cliff, and measured 2.5x
  * slower than this plan at sf0.1 even without memory pressure.
  *
  * This operator computes the same exact median as a SORT-based plan:
  * pre-aggregate to (keys, value) grain with map-side combine, rank
  * values with a windowed running count, select the row(s) covering
  * the two middle ranks, average them. Every stage is standard
  * hash-agg / sort machinery — sorts spill gracefully, no per-group
  * in-memory structure, and the only rows that survive past the
  * window are <= 2 per group. Verified bit-identical to builtin
  * `median` on all 596k sf0.1 (item,date) groups.
  *
  * Null values are skipped (like builtin median); groups whose values
  * are ALL null simply produce no row — callers LEFT-join and read
  * the absent median as null.
  */
object Medians {

  def exactMedianByCounts(df: DataFrame, keys: Seq[String], valueCol: String,
      out: String = "median"): DataFrame = {
    val v = col(valueCol)
    val keyCols: Seq[Column] = keys.map(col)
    val pg = df.where(v.isNotNull)
      .groupBy((keyCols :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keyCols: _*)
    // 0-based target ranks: lo = (n-1)/2, hi = n/2 (equal when n odd);
    // a value row covers ranks [cum - c, cum - 1]
    val ranked = pg
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lo", floor((col("__n") - 1) / 2))
      .withColumn("__hi", floor(col("__n") / 2))
    def covers(rank: Column): Column =
      col("__cum") - col("__c") <= rank && col("__cum") - 1 >= rank
    ranked
      .where(covers(col("__hi")) || covers(col("__lo")))
      .groupBy(keyCols: _*)
      .agg((sum(col("__v") * (
        when(covers(col("__lo")), 1).otherwise(0) +
          when(covers(col("__hi")), 1).otherwise(0))) / 2.0).as(out))
  }

  /** Exact DISCRETE quantiles (no interpolation) at arbitrary ranks,
    * several per pass — same sort-based counts plan as
    * [[exactMedianByCounts]], same no-per-group-value-map scale
    * story; one extra output column per requested quantile, zero
    * extra passes.
    *
    * Contract: quantile (num, den) selects the value at 0-based rank
    * `floor((n - 1) * num / den)` of the group's non-null values in
    * ascending order — exact integer arithmetic end to end
    * (cross-engine deterministic; interpolating definitions would
    * average doubles).
    */
  def exactQuantilesByCounts(df: DataFrame, keys: Seq[String],
      valueCol: String, quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (_, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $num/$den")
    }
    val v = col(valueCol)
    val keyCols: Seq[Column] = keys.map(col)
    val pg = df.where(v.isNotNull)
      .groupBy((keyCols :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keyCols: _*)
    val ranked = pg
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    def rankOf(num: Int, den: Int): Column =
      ZOrder.intDiv((col("__n") - 1) * num, lit(den.toLong))
    def covers(rank: Column): Column =
      col("__cum") - col("__c") <= rank && col("__cum") - 1 >= rank
    val anyCover = quantiles.map { case (_, n_, d) => covers(rankOf(n_, d)) }
      .reduce(_ || _)
    val aggs = quantiles.map { case (name, n_, d) =>
      max(when(covers(rankOf(n_, d)), col("__v"))).as(name)
    } :+ max(col("__n")).as("n_values")
    ranked
      .where(anyCover)
      .groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Keep rows whose value is at or above the exact (num/den)
    * quantile of the (group's) non-null values — the quality-gate
    * shape: "train only on the top quartile by score". The threshold
    * is [[exactQuantilesByCounts]]'s discrete quantile (a value that
    * OCCURS, never an interpolated double), broadcast back and
    * compared — two scans of the input, no row-level shuffle of the
    * corpus in either (the quantile pass shuffles the (value, count)
    * grid only). Rows with a null value are dropped (they can't
    * compare); a group whose values are all null disappears.
    *
    * Scale note: with `keys = Nil` the quantile pass ranks the GLOBAL
    * distinct-value grid in one sort partition. Scores on a bounded
    * grid (ratios, grades) are fine at any corpus size; for
    * near-unique doubles quantize first (`round(v, 6)` changes the
    * threshold by <= 1e-6 and bounds the grid at den*10^6 rows).
    */
  def filterAtOrAboveQuantile(df: DataFrame, valueCol: String,
      num: Int, den: Int, keys: Seq[String] = Nil): DataFrame = {
    val q = exactQuantilesByCounts(df, keys, valueCol,
      Seq(("__q", num, den)))
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(q.select(col("__q"))))
      else df.join(broadcast(q.select((keys.map(col) :+ col("__q")): _*)), keys)
    joined.where(col(valueCol) >= col("__q")).drop("__q")
  }
}
