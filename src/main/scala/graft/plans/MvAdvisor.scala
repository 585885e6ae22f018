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
  * Star-join workloads extract too — the reference's own mart shape:
  * for Aggregate(fact ⋈ dims), the candidate's keys are the FACT
  * side's grouping + filter columns PLUS its join-key columns (the
  * rule rewrites to Join(rollup, dim), so the join keys must be
  * rollup columns), measures the fact columns under aggregates; dim
  * attributes ride the re-applied join and constrain nothing.
  * Grouping expressions contribute their referenced columns (a
  * trunc(day,'month') query yields a `day`-keyed daily candidate —
  * exactly the grain the rule's coarser-time derivation wants).
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
        // an INNER star join unwraps from either side (the roles are
        // symmetric); keep every interpretation that yields a
        // derivable shape — a useless small-side candidate dies at
        // the compression gate, never at soundness
        unwrapStar(agg.child).foreach {
          case (filterCols, path, factSet, dimSet) =>
            val keyCols = scala.collection.mutable.LinkedHashSet.empty[String]
            keyCols ++= filterCols
            var ok = true
            agg.groupingExpressions.foreach { g =>
              if (!g.deterministic) ok = false
              else g.references.foreach { a =>
                // fact columns become rollup keys; dim attributes
                // ride the re-applied join and constrain nothing
                if (factSet.contains(a)) keyCols += a.name
                else if (!dimSet.contains(a)) ok = false
              }
            }
            val measures = scala.collection.mutable.LinkedHashSet.empty[String]
            agg.aggregateExpressions.foreach(_.foreach {
              case ae: AggregateExpression
                  if ae.isDistinct || ae.filter.isDefined => ok = false
              case ae: AggregateExpression =>
                def factAttr(x: Expression): Option[String] = x match {
                  case a: AttributeReference if factSet.contains(a) =>
                    Some(a.name)
                  case _ => None
                }
                ae.aggregateFunction match {
                  case Sum(x, _) if factAttr(x).isDefined =>
                    measures += factAttr(x).get
                  case Min(x) if factAttr(x).isDefined =>
                    measures += factAttr(x).get
                  case Max(x) if factAttr(x).isDefined =>
                    measures += factAttr(x).get
                  case Average(x, _) if factAttr(x).isDefined =>
                    measures += factAttr(x).get
                  case Count(Seq(x)) if factAttr(x).isDefined =>
                    measures += factAttr(x).get
                  case Count(seq) if seq.forall(_.foldable) => () // COUNT(*)
                  case _ => ok = false // not derivable — recommend nothing
                }
              case _ => ()
            })
            // a column that is BOTH key and measure stays in both:
            // the rollup groups by it AND materializes its partials
            // (sum_x over a single-valued group is x*cnt — sound),
            // so a query that filters on the column it aggregates
            // still navigates; dropping it from measures would
            // recommend a rollup the rule then refuses
            if (ok && keyCols.nonEmpty)
              out += Shape(path, keyCols.toSet, measures.toSet)
        }
      case _ => ()
    }
    out.toSeq
  }

  /** Generalizes [[unwrapScan]] through a star-join chain, mirroring
    * the rule's unwrapShape in advisory (name-level) form:
    * (fact filter+join-key columns, fact path, fact-side attrs,
    * dim-side attrs). Each join must be INNER or LEFT OUTER with the
    * fact side reachable, conditions pure attr-equality conjunctions;
    * the fact side's join keys join the candidate's key set (the
    * rewrite makes them rollup columns). A shape the rule would
    * refuse returns None.
    */
  private def unwrapStar(p: LogicalPlan): Seq[(Set[String], String,
      org.apache.spark.sql.catalyst.expressions.AttributeSet,
      org.apache.spark.sql.catalyst.expressions.AttributeSet)] =
    p match {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isDefined =>
        def scansPath(pl: LogicalPlan, path: String): Boolean =
          pl.collectFirst {
            case lr: LogicalRelation if (lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(_.toString == path)
              case _ => false
            }) => ()
          }.isDefined
        // EITHER side can be the fact (for INNER the roles are fully
        // symmetric; dim.join(fact, ...) is as common as the other
        // spelling) — emit every interpretation that validates; a
        // useless small-side candidate dies at the compression gate,
        // never at soundness
        val interpretations =
          unwrapStar(j.left).map(r => (r, j.right, true)) ++
            unwrapStar(j.right).map(r => (r, j.left, false))
        interpretations.flatMap {
          case ((cols, path, factSet, dimSet), dimP, factLeft) =>
            val okType = j.joinType match {
              case org.apache.spark.sql.catalyst.plans.Inner => true
              case org.apache.spark.sql.catalyst.plans.LeftOuter => factLeft
              case _ => false
            }
            // a dim side reading the fact path is a self-join — the
            // rule refuses those, so the advisor must too
            if (!okType || scansPath(dimP, path)) Nil
            else {
              val chainOut = factSet ++ dimSet
              val dimOut = dimP.outputSet
              val keys = scala.collection.mutable.LinkedHashSet.empty[String]
              val ok = graft.plans.MaterializedAggregate
                .splitConjuncts(j.condition.get).forall {
                  case org.apache.spark.sql.catalyst.expressions.EqualTo(
                      a: AttributeReference, b: AttributeReference) =>
                    val chainSide =
                      if (chainOut.contains(a) && dimOut.contains(b)) Some(a)
                      else if (chainOut.contains(b) && dimOut.contains(a)) Some(b)
                      else None
                    chainSide.exists { f =>
                      if (factSet.contains(f)) { keys += f.name; true }
                      else dimSet.contains(f) // snowflake arm: no key needed
                    }
                  case _ => false
                }
              if (!ok) Nil
              else Seq((cols ++ keys, path, factSet, dimSet ++ dimOut))
            }
        }
      case other =>
        unwrapScan(other).toSeq.map { case (cols, path) =>
          // factSet = the scan subtree's output
          (cols, path, other.outputSet,
            org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)
        }
    }

  /** (columns referenced by filters along the chain, parquet path)
    * for a bare Filter/Project chain over ONE single-root parquet
    * scan; None disqualifies (join, union, non-parquet). The path
    * keeps its scheme/authority — unlike the rule's comparison-only
    * normalize, the advisor DEREFERENCES it (stats scan + rollup
    * build), and a stripped 's3a://...' would resolve against the
    * wrong filesystem.
    */
  private def unwrapScan(p: LogicalPlan): Option[(Set[String], String)] =
    p match {
      case r: LogicalRelation => r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.location.rootPaths.length == 1 =>
          Some((Set.empty, fs.location.rootPaths.head.toString))
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
      // keep key∩measure overlaps: a column one query filters on and
      // another aggregates must be a rollup key AND carry partials
      val measures = ss.flatMap(_.measures).distinct
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
