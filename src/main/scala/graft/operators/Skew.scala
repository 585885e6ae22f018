package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for hot keys (SURVEY §4: hot trade-good
  * item_ids skew every `groupBy item_id`).
  *
  * First line of defense is AQE (`skewJoin.enabled` in
  * [[graft.Engine]]) — it re-splits skewed SHUFFLE partitions at
  * runtime. These helpers cover the case AQE can't fix: a single KEY
  * whose group state is too large for one task (AQE can split a
  * partition, not a key). Two-phase salted aggregation spreads one
  * key over `saltBuckets` tasks, then combines the partials — valid
  * for any algebraic aggregate (sum/count/min/max), the same partial/
  * final split Spark's own map-side combine uses.
  */
object Skew {

  /** deterministic per-row salt in [0, saltBuckets) */
  def salt(saltBuckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltBuckets))

  /** Two-phase salted sum/count aggregation:
    * phase 1 groups by (keys, salt) — the hot key spreads over
    * `saltBuckets` reducers; phase 2 re-aggregates the (at most
    * saltBuckets x |keys|) partials on the natural key.
    *
    * `aggs` maps output column name -> (valueCol, "sum" | "count" |
    * "min" | "max" | "avg") — the algebraic aggregates whose partials
    * combine by the same function (count partials combine by SUM; avg
    * carries a (sum, count) partial pair and divides at the end).
    *
    * Floating-point note: salting changes the SUMMATION ORDER of
    * double columns, so sums differ from the unsalted plan in the
    * last ulps (~1e-15 relative, measured) — exactly as any
    * repartitioning does with Spark's own partial aggregation.
    * Integer/decimal aggregates are bit-identical.
    */
  /** Salt determinism: the default salt hashes EVERY column of the
    * row. A nondeterministic salt (`monotonically_increasing_id`,
    * `rand`) is a correctness hazard on a real cluster: when a shuffle
    * map task re-executes after a fetch failure, recomputed rows can
    * draw different salts than the copies already consumed by finished
    * reducers — partials get lost or double-counted. A content hash
    * re-derives the same salt on replay. (Fully identical rows share a
    * salt, so a key whose skew is millions of BYTE-IDENTICAL rows
    * spreads less evenly — pass `saltBy` with a finer deterministic
    * source if that's the shape.)
    */
  /** The `spread` flag and the subset-satisfies pitfall: Spark inserts
    * the phase-1 exchange only when the child's partitioning does NOT
    * already satisfy `ClusteredDistribution(keys :+ salt)` — and
    * `HashPartitioning(keys)` DOES satisfy it (partitioning expressions
    * are a subset of the clustering, so equal (keys, salt) tuples are
    * trivially co-located). Consequence: on an input that is already
    * hash-partitioned by `keys` — the post-join / post-repartition
    * shape, which is exactly where a hot key is physically concentrated
    * — the default plan adds NO exchange and the salt never spreads
    * anything. `spread = true` forces an explicit raw-row
    * `repartition(keys :+ salt)` so the hot key's rows physically move
    * to `saltBuckets` tasks before any per-row work in the aggregate.
    * Leave it false for raw scans: there the phase-1 exchange happens
    * anyway and runs AFTER map-side partial aggregation (shuffles tiny
    * partials, not rows), which the explicit repartition would forfeit.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: Map[String, (Column, String)],
      saltBy: Seq[Column] = Nil,
      spread: Boolean = false): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val saltSrc = if (saltBy.nonEmpty) saltBy else df.columns.toSeq.map(col)
    val saltedRaw = df.withColumn("__salt", salt(saltBuckets, saltSrc: _*))
    val salted =
      if (spread) saltedRaw.repartition((keys :+ "__salt").map(col): _*)
      else saltedRaw
    // avg is algebraic only as a (sum, count) PAIR of partials — it
    // expands to two phase-1 columns and a final divide (null-skipping
    // matches Spark's avg: sum skips nulls, count(c) counts non-null,
    // all-null group -> null/0 -> null with ANSI off)
    val partials: Seq[Column] = aggs.toSeq.flatMap {
      case (name, (c, "avg" | "mean")) =>
        Seq(sum(c).as(s"__${name}_sum"), count(c).as(s"__${name}_cnt"))
      case (name, (c, f)) => Seq(partialOf(f, c).as(name))
    }
    val finals: Seq[Column] = aggs.toSeq.map {
      case (name, (_, "avg" | "mean")) =>
        (sum(col(s"__${name}_sum")) / sum(col(s"__${name}_cnt"))).as(name)
      case (name, (_, f)) => finalOf(f, col(name)).as(name)
    }
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  private def partialOf(f: String, c: Column): Column = f match {
    case "sum" => sum(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(
      s"saltedAgg supports algebraic sum/count/min/max/avg, got $other")
  }

  private def finalOf(f: String, partial: Column): Column = f match {
    case "sum" | "count" => sum(partial) // count partials combine by sum
    case "min" => min(partial)
    case "max" => max(partial)
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  /** Salted broadcast-side replication for a skewed JOIN where the
    * build side is small but one probe key is hot: replicate each
    * build row `saltBuckets` times with an explicit salt column, salt
    * the probe side, join on (key, salt). Spreads the hot key's probe
    * rows over saltBuckets tasks. (Prefer plain `broadcast()` when the
    * build side fits — this is for the sort-merge case.)
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    // content-hash salt for the same replay-determinism reason as
    // saltedAgg (the join result must not depend on task re-execution)
    val saltedProbe = probe.withColumn("__salt",
      salt(saltBuckets, probe.columns.toSeq.map(col): _*))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
