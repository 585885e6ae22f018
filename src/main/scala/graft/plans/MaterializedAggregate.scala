package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Materialized-aggregate navigation — the classic warehouse
  * optimization, here as the engine's first Catalyst OPTIMIZER rule
  * (everything else in `functions/` is expression-level): when a
  * query aggregates the fact table on a SUBSET of a registered
  * rollup's grouping columns with derivable aggregates, rewrite the
  * plan to read the tiny rollup instead of the fact scan. At 100 TB
  * this is not a micro-optimization — it replaces the dominant scan
  * with one over a table ~|group combinations| rows long.
  *
  * Derivability (the standard re-aggregation algebra):
  *   SUM(x)   → SUM(mv.sum_x)
  *   COUNT(*) → SUM(mv.cnt)
  *   MIN(x)   → MIN(mv.min_x),  MAX(x) → MAX(mv.max_x)
  *   AVG(x)   → SUM(mv.sum_x) / SUM(mv.cnt)  (cast to double)
  * plus filters that reference GROUPING columns only (they commute
  * with the rollup). Anything else — DISTINCT aggregates, filters on
  * measures, expressions over measures, a grouping column the MV
  * lacks — leaves the plan untouched; the rule must be sound, never
  * clever.
  *
  * Exactness contract: rewritten SUM/AVG re-associate the addition.
  * Over integers (and integral-valued doubles, e.g. TPC-H
  * quantities) results are bit-identical; over fractional doubles
  * they agree only to float tolerance — the deployment decides which
  * measures to register, same as every warehouse's MV admission
  * policy.
  *
  * Output-attribute discipline: the rewritten Aggregate re-emits the
  * ORIGINAL output exprIds (via aliases), so operators above the
  * aggregate — sorts, projections, joins — resolve unchanged.
  *
  * Registration is process-local ([[MvCatalog]]); the rule is
  * injected by [[graft.functions.GraftExtensions]] and dormant while
  * the catalog is empty.
  */
object MaterializedAggregate {

  final case class MvDef(
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      measureCols: Seq[String],
      plan: LogicalPlan) {
    def sumCol(c: String): String = s"sum_$c"
    def minCol(c: String): String = s"min_$c"
    def maxCol(c: String): String = s"max_$c"
    val countCol: String = "cnt"
  }

  /** Compute and write the rollup parquet for `basePath`:
    * one row per grouping combination with sum/min/max per measure
    * plus the row count.
    */
  def build(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String]): Unit = {
    val base = spark.read.parquet(basePath)
    val aggs =
      measureCols.flatMap(c => Seq(
        sum(col(c)).as(s"sum_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))) :+ count(lit(1)).as("cnt")
    base.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
  }

  /** Build + register in one step (the normal flow). */
  def buildAndRegister(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String]): MvDef = {
    build(spark, basePath, mvPath, groupCols, measureCols)
    registerExisting(spark, basePath, mvPath, groupCols, measureCols)
  }

  /** Register an ALREADY-MATERIALIZED rollup — e.g. one maintained
    * incrementally by [[graft.streaming.StreamingMvMaintenance]]
    * (its `batch=` partial layout is navigable as-is: the rule
    * re-aggregates, so per-batch partial rows fold back exactly).
    */
  def registerExisting(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String]): MvDef = {
    val plan = spark.read.parquet(mvPath).queryExecution.analyzed
    val d = MvDef(normalize(basePath), mvPath, groupCols, measureCols, plan)
    MvCatalog.register(d)
    d
  }

  private[plans] def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath
}

/** Process-local registry of materialized rollups. */
object MvCatalog {
  import MaterializedAggregate.MvDef
  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def register(d: MvDef): Unit = defs.put(d.basePath + "->" + d.mvPath, d)
  def clear(): Unit = defs.clear()
  def isEmpty: Boolean = defs.isEmpty
  def all: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }
}

class AggregateRewriteRule extends Rule[LogicalPlan] {
  import MaterializedAggregate.MvDef

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate =>
        MvCatalog.all.view.flatMap(mv => rewrite(agg, mv)).headOption
          .getOrElse(agg)
    }

  /** (combined filter, relation) under attrs-only projections. */
  private def unwrap(p: LogicalPlan): Option[(Option[Expression], LogicalRelation)] =
    p match {
      case r: LogicalRelation => Some((None, r))
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child)
      case Filter(cond, child) =>
        unwrap(child).map { case (c0, r) =>
          (Some(c0.map(And(_, cond)).getOrElse(cond)), r)
        }
      case _ => None
    }

  private def relationPaths(r: LogicalRelation): Seq[String] = r.relation match {
    case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      fs.location.rootPaths.map(p => p.toUri.getPath)
    case _ => Seq.empty
  }

  private def rewrite(agg: Aggregate, mv: MvDef): Option[LogicalPlan] = {
    val (condOpt, rel) = unwrap(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    if (!relationPaths(rel).contains(mv.basePath)) return None

    val mvAttrs: Map[String, Attribute] =
      mv.plan.output.map(a => a.name -> a).toMap

    // grouping: plain columns the MV groups by
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => a.name
      case _ => return None
    }
    // filters: grouping columns only (they commute with the rollup)
    val newCond = condOpt.map { cond =>
      val ok = cond.references.forall(a => mv.groupCols.contains(a.name))
      if (!ok) return None
      cond.transform {
        case a: AttributeReference => mvAttrs(a.name)
      }
    }

    def cAgg(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction) =
      AggregateExpression(fn, Complete, isDistinct = false)

    def derive(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(mvAttrs(a.name))
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Sum(x: AttributeReference, _) if mv.measureCols.contains(x.name) =>
            Some(cAgg(Sum(mvAttrs(mv.sumCol(x.name)))))
          case Min(x: AttributeReference) if mv.measureCols.contains(x.name) =>
            Some(cAgg(Min(mvAttrs(mv.minCol(x.name)))))
          case Max(x: AttributeReference) if mv.measureCols.contains(x.name) =>
            Some(cAgg(Max(mvAttrs(mv.maxCol(x.name)))))
          case Count(Seq(Literal(_, _))) =>
            Some(cAgg(Sum(mvAttrs(mv.countCol))))
          case Average(x: AttributeReference, _) if mv.measureCols.contains(x.name) =>
            Some(Divide(
              Cast(cAgg(Sum(mvAttrs(mv.sumCol(x.name)))), DoubleType),
              Cast(cAgg(Sum(mvAttrs(mv.countCol))), DoubleType)))
          case _ => None
        }
      case _ => None
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        derive(a) match {
          case Some(e) => Alias(e, a.name)(exprId = a.exprId)
          case None => return None
        }
      case al @ Alias(child, name) =>
        derive(child) match {
          case Some(e) => Alias(e, name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }

    val newGroupings: Seq[Expression] = groupNames.map(mvAttrs(_))
    val filtered = newCond.map(Filter(_, mv.plan)).getOrElse(mv.plan)
    val rewritten = Aggregate(newGroupings, newAggExprs, filtered)

    // soundness gate: identical schema (names, types, nullability-
    // compatible) and identical output ids — else refuse
    val same = rewritten.output.length == agg.output.length &&
      rewritten.output.zip(agg.output).forall { case (n, o) =>
        n.name == o.name && n.dataType == o.dataType && n.exprId == o.exprId
      }
    if (same) Some(rewritten) else None
  }
}
