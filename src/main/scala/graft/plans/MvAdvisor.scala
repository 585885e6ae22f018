package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Workload-driven rollup advisor — the missing half of
  * [[MaterializedAggregate]]: the rule answers "can THIS query use
  * THAT rollup?"; the advisor answers "which rollups should exist for
  * THIS workload?" (the BigQuery/Redshift recommender shape).
  *
  * [[candidates]] walks each workload query's ANALYZED plan for
  * aggregates over a single parquet scan and extracts the rollup that
  * would navigate it: grouping key = the query's grouping columns ∪
  * every column its filters reference (a filter must commute with the
  * rollup, so its columns must be grouping keys), measures = the
  * plain columns under derivable aggregate functions. Queries over
  * the same base table MERGE into one candidate (union of keys and
  * measures — one rollup serving N queries beats N rollups: the rule
  * re-aggregates, so a coarser query still navigates the merged
  * grain).
  *
  * [[recommend]] keeps candidates whose measured compression —
  * base rows / approx-distinct grouping combinations (one
  * HLL-sketch scan per candidate, never a shuffle-heavy exact
  * distinct) — clears `minCompression`. A rollup near the fact's own
  * cardinality would navigate correctly but buy nothing; the
  * recommender's job is to refuse it.
  *
  * V1 scope, stated plainly: fact-only shapes (the star/snowflake
  * navigation the rule supports still APPLIES to a recommended
  * rollup — a fact-side candidate extracted from Aggregate(Join(...))
  * is future work); grouping expressions contribute their referenced
  * columns (a trunc(day,'month') query yields a `day`-keyed daily
  * candidate — exactly the grain the rule's coarser-time derivation
  * wants).
  */
object MvAdvisor {

  /** One recommended rollup: where, its grain, what it can answer,
    * and the measured size evidence.
    */
  case class Candidate(basePath: String, groupCols: Seq[String],
      measureCols: Seq[String], queriesCovered: Int,
      baseRows: Long, groupRowsApprox: Long) {
    def compression: Double =
      if (groupRowsApprox == 0L) Double.PositiveInfinity
      else baseRows.toDouble / groupRowsApprox
  }

  private case class Shape(basePath: String, keys: Set[String],
      measures: Set[String])

  /** Extract the aggregate shapes a rollup could serve, one per
    * navigable Aggregate node found in the workload's analyzed plans.
    * Shapes the RULE would refuse (distinct/filtered aggregates,
    * non-column measures, non-parquet scans, joins) extract nothing —
    * the advisor must never recommend a rollup the rule cannot use.
    */
  private def shapes(df: DataFrame): Seq[Shape] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Shape]
    df.queryExecution.analyzed.foreach {
      case agg: Aggregate =>
        unwrapScan(agg.child).foreach { case (filterCols, path) =>
          val keyCols = scala.collection.mutable.LinkedHashSet.empty[String]
          keyCols ++= filterCols
          var ok = true
          agg.groupingExpressions.foreach { g =>
            if (!g.deterministic) ok = false
            else g.references.foreach(a => keyCols += a.name)
          }
          val measures = scala.collection.mutable.LinkedHashSet.empty[String]
          agg.aggregateExpressions.foreach(_.foreach {
            case ae: AggregateExpression
                if ae.isDistinct || ae.filter.isDefined => ok = false
            case ae: AggregateExpression =>
              ae.aggregateFunction match {
                case Sum(a: AttributeReference, _) => measures += a.name
                case Min(a: AttributeReference) => measures += a.name
                case Max(a: AttributeReference) => measures += a.name
                case Average(a: AttributeReference, _) => measures += a.name
                case Count(Seq(a: AttributeReference)) => measures += a.name
                case Count(seq) if seq.forall(_.foldable) => () // COUNT(*)
                case _ => ok = false // not derivable — recommend nothing
              }
            case _ => ()
          })
          // a grouping column under an aggregate is fine; a measure
          // used as a key would force the rollup to fact grain —
          // leave it: compression gating will refuse it honestly
          if (ok && keyCols.nonEmpty)
            out += Shape(path, keyCols.toSet, measures.toSet -- keyCols)
        }
      case _ => ()
    }
    out.toSeq
  }

  /** (columns referenced by filters along the chain, parquet path)
    * for a bare Filter/Project chain over ONE single-root parquet
    * scan; None disqualifies (join, union, non-parquet).
    */
  private def unwrapScan(p: LogicalPlan): Option[(Set[String], String)] =
    p match {
      case r: LogicalRelation => r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.location.rootPaths.length == 1 =>
          Some((Set.empty, fs.location.rootPaths.head.toUri.getPath))
        case _ => None
      }
      case Project(pl, child) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.deterministic
          case _ => false
        } => unwrapScan(child)
      case Filter(cond: Expression, child) =>
        unwrapScan(child).map { case (cols, path) =>
          (cols ++ cond.references.map(_.name), path)
        }
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        unwrapScan(s.child)
      case _ => None
    }

  /** Merge the workload's shapes per base table and measure each
    * candidate's compression (one count + one approx-distinct scan
    * per table).
    */
  def candidates(spark: SparkSession, workload: Seq[DataFrame]): Seq[Candidate] = {
    val byBase = workload.flatMap(shapes).groupBy(_.basePath)
    byBase.toSeq.sortBy(_._1).map { case (path, ss) =>
      val keys = ss.flatMap(_.keys).distinct
      val measures = ss.flatMap(_.measures).distinct.filterNot(keys.contains)
      val base = spark.read.parquet(path)
      val stats = base.agg(
        count(lit(1)).as("n"),
        approx_count_distinct(struct(keys.map(col): _*)).as("g")).head()
      Candidate(path, keys, measures, ss.size,
        stats.getLong(0), stats.getLong(1))
    }
  }

  /** Candidates worth materializing: compression >= `minCompression`
    * (default 10× — below that the rollup scan is within an order of
    * magnitude of the fact scan and the build is rarely worth it).
    */
  def recommend(spark: SparkSession, workload: Seq[DataFrame],
      minCompression: Double = 10.0): Seq[Candidate] =
    candidates(spark, workload).filter(_.compression >= minCompression)

  /** Build + register every recommendation under `mvDir` (one parquet
    * per base table, named by a digest of the base path). Returns the
    * registered defs; every workload query then navigates via the
    * session's [[AggregateRewriteRule]].
    */
  def buildRecommended(spark: SparkSession, recs: Seq[Candidate],
      mvDir: String): Seq[MaterializedAggregate.MvDef] =
    recs.map { c =>
      val name = java.security.MessageDigest.getInstance("MD5")
        .digest(c.basePath.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(12)
      MaterializedAggregate.buildAndRegister(spark, c.basePath,
        s"$mvDir/mv_$name.parquet", c.groupCols, c.measureCols)
    }
}
