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
  *   COUNT(x) → SUM(mv.nnz_x)  (per-measure non-null count)
  *   MIN(x)   → MIN(mv.min_x),  MAX(x) → MAX(mv.max_x)
  *   AVG(x)   → SUM(mv.sum_x) / SUM(mv.nnz_x)  (cast to double) —
  *     NULLs make AVG's denominator the non-null count, NOT the row
  *     count; on a rollup lacking nnz_x the rule divides by cnt only
  *     when the measure attribute is provably non-nullable, else it
  *     refuses (dividing by cnt under NULLs is the classic unsound
  *     MV rewrite)
  *   HLL(hash(d), p) → HLL-MERGE(mv.hll_d)  (elementwise register
  *     max — BIT-identical to the one-shot sketch, so digests and
  *     estimates projected above the aggregate are unchanged; fires
  *     only when the query's hash expression tree matches the one
  *     the rollup registered, name-normalized, and p matches)
  * plus filters that reference GROUPING columns only (they commute
  * with the rollup). Anything else — DISTINCT aggregates, filters on
  * measures, expressions over measures, a grouping column the MV
  * lacks — leaves the plan untouched; the rule must be sound, never
  * clever. Derivability is SCHEMA-DRIVEN: a rollup registered from
  * an older layout without nnz_* columns still navigates every shape
  * that doesn't need them.
  *
  * PARTIAL rollups (`baseFilter`): a rollup built over a filtered
  * base ("only linestatus 'F'", "only this year's partition")
  * navigates only queries that repeat every one of its build
  * predicate's conjuncts — syntactic subsumption on the
  * name-normalized conjunct set, never implication guessing (`x > 5`
  * does not satisfy a rollup built with `x > 0`; exactness beats
  * cleverness). Residual query conjuncts beyond the rollup's must
  * reference grouping columns, as before.
  *
  * When several registered rollups can answer the same query, the
  * rule navigates to the COARSEST one (fewest grouping columns —
  * the standard smallest-covering-MV heuristic; group count is the
  * rollup's row-count driver), tie-broken by path so plan choice is
  * deterministic, never hash-map iteration order.
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
      plan: LogicalPlan,
      distinctCols: Seq[String] = Nil,
      hllP: Int = 12,
      hashSql: Map[String, String] = Map.empty,
      filterConjuncts: Seq[String] = Nil,
      filterNotNullCols: Set[String] = Set.empty,
      exprMeasureKeys: Map[String, String] = Map.empty,
      // registration INPUTS, retained so the catalog can persist and
      // re-register in a fresh session (the derived fields above are
      // recomputed from these at load)
      baseFilter: Option[String] = None,
      exprMeasures: Map[String, String] = Map.empty) {
    def sumCol(c: String): String = s"sum_$c"
    def minCol(c: String): String = s"min_$c"
    def maxCol(c: String): String = s"max_$c"
    def nnzCol(c: String): String = s"nnz_$c"
    def hllCol(c: String): String = s"hll_$c"
    val countCol: String = "cnt"
  }

  /** Compute and write the rollup parquet for `basePath`:
    * one row per grouping combination with sum/min/max/non-null
    * count per measure, the row count, and — per distinct column —
    * the [[graft.functions.HyperLogLog]] register array of the
    * engine's 60-bit canonical-string hash at precision `hllP`
    * (2^hllP longs per group: the partial state that makes
    * approximate COUNT DISTINCT navigable, the BigQuery/Druid MV
    * trick).
    */
  def build(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String],
      distinctCols: Seq[String] = Nil, hllP: Int = 12,
      baseFilter: Option[String] = None,
      exprMeasures: Map[String, String] = Map.empty): Unit = {
    require(exprMeasures.keySet.intersect(
      (measureCols ++ groupCols ++ distinctCols).toSet).isEmpty,
      "exprMeasures names collide with registered columns")
    val base = baseFilter.foldLeft(spark.read.parquet(basePath))(
      (df, f) => df.where(org.apache.spark.sql.functions.expr(f)))
    val aggs =
      measureCols.flatMap(c => Seq(
        sum(col(c)).as(s"sum_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        count(col(c)).as(s"nnz_$c"))) ++
      exprMeasures.toSeq.sortBy(_._1).flatMap { case (name, e) =>
        val x = org.apache.spark.sql.functions.expr(e)
        Seq(sum(x).as(s"sum_$name"), min(x).as(s"min_$name"),
          max(x).as(s"max_$name"), count(x).as(s"nnz_$name"))
      } ++
      distinctCols.map(d => graft.functions.SketchFunctions.hyperLogLog(
        graft.functions.Md5Hash.h60String(col(d)), hllP).as(s"hll_$d")) :+
      count(lit(1)).as("cnt")
    base.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
  }

  /** Build + register in one step (the normal flow). */
  def buildAndRegister(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String],
      distinctCols: Seq[String] = Nil, hllP: Int = 12,
      baseFilter: Option[String] = None,
      exprMeasures: Map[String, String] = Map.empty): MvDef = {
    build(spark, basePath, mvPath, groupCols, measureCols, distinctCols,
      hllP, baseFilter, exprMeasures)
    registerExisting(spark, basePath, mvPath, groupCols, measureCols,
      distinctCols, hllP, baseFilter, exprMeasures)
  }

  /** Register an ALREADY-MATERIALIZED rollup — e.g. one maintained
    * incrementally by [[graft.streaming.StreamingMvMaintenance]]
    * (its `batch=` partial layout is navigable as-is: the rule
    * re-aggregates, so per-batch partial rows fold back exactly —
    * including the register arrays, whose fold is an elementwise
    * max).
    */
  def registerExisting(spark: SparkSession, basePath: String, mvPath: String,
      groupCols: Seq[String], measureCols: Seq[String],
      distinctCols: Seq[String] = Nil, hllP: Int = 12,
      baseFilter: Option[String] = None,
      exprMeasures: Map[String, String] = Map.empty): MvDef = {
    val plan = spark.read.parquet(mvPath).queryExecution.analyzed
    // pin the EXACT hash-expression shape the rollup's registers were
    // built from (name-normalized); a query sketching any other
    // expression must not navigate
    val hashSql = distinctCols.map { d =>
      val analyzed = spark.read.parquet(basePath)
        .select(graft.functions.Md5Hash.h60String(col(d)).as("__h"))
        .queryExecution.analyzed
      val e = analyzed.expressions.collectFirst {
        case al: Alias if al.name == "__h" => al.child
      }.getOrElse(sys.error(s"could not resolve hash expression for $d"))
      d -> normalizeExpr(e)
    }.toMap
    // a PARTIAL rollup pins its build predicate as name-normalized
    // conjuncts; navigation requires the query to repeat every one.
    // Also record which columns that predicate null-rejects (the
    // plan's own constraint set): the optimizer infers IsNotNull
    // conjuncts from null-intolerant predicates, and when the rule
    // runs after that inference the query side carries them — they
    // are vacuously true of every row the rollup aggregated, so the
    // rewrite may drop them.
    val (filterConjuncts, filterNotNullCols) = baseFilter match {
      case None => (Nil, Set.empty[String])
      case Some(f) =>
        val analyzed = spark.read.parquet(basePath)
          .where(org.apache.spark.sql.functions.expr(f))
          .queryExecution.analyzed
        val cond = analyzed.collectFirst { case Filter(c, _) => c }
          .getOrElse(sys.error(s"could not resolve baseFilter '$f'"))
        val nn = analyzed.constraints.collect {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            a: AttributeReference) => a.name
        }
        (splitConjuncts(cond).map(normalizeExpr), nn.toSet)
    }
    // EXPRESSION measures ("revenue" → price arithmetic) register by
    // their name-normalized resolved tree: a query summing the exact
    // same expression navigates to sum_<name> and friends
    val exprMeasureKeys = exprMeasures.map { case (name, e) =>
      val analyzed = spark.read.parquet(basePath)
        .select(org.apache.spark.sql.functions.expr(e).as("__m"))
        .queryExecution.analyzed
      val resolved = analyzed.expressions.collectFirst {
        case al: Alias if al.name == "__m" => al.child
      }.getOrElse(sys.error(s"could not resolve exprMeasure '$name'"))
      normalizeExpr(resolved) -> name
    }
    val d = MvDef(normalize(basePath), mvPath, groupCols, measureCols, plan,
      distinctCols, hllP, hashSql, filterConjuncts, filterNotNullCols,
      exprMeasureKeys, baseFilter, exprMeasures)
    MvCatalog.register(d)
    d
  }

  /** Persist every registered rollup's REGISTRATION INPUTS as one
    * JSON file under `path` — the durable half of the process-local
    * catalog: a fresh session (a new driver, the next day's job)
    * calls [[loadCatalog]] and navigates the same rollups without
    * rebuilding anything. Derived match state (normalized hash/
    * filter/measure trees) is recomputed at load, so a Spark upgrade
    * that changes expression printing re-normalizes both sides
    * consistently instead of matching against stale strings.
    */
  def saveCatalog(spark: SparkSession, path: String): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def arr(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")
    def obj(m: Map[String, String]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
    val lines = MvCatalog.all.sortBy(d => (d.basePath, d.mvPath)).map { d =>
      s"""{"basePath": ${q(d.basePath)}, "mvPath": ${q(d.mvPath)},
         | "groupCols": ${arr(d.groupCols)},
         | "measureCols": ${arr(d.measureCols)},
         | "distinctCols": ${arr(d.distinctCols)},
         | "hllP": ${d.hllP},
         | "baseFilter": ${d.baseFilter.map(q).getOrElse("null")},
         | "exprMeasures": ${obj(d.exprMeasures)}}""".stripMargin
        .replace("\n", "")
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Re-register every rollup saved by [[saveCatalog]]. Returns the
    * defs in file order. Fails loudly on an unreadable entry — a
    * silently skipped rollup would be a silent performance cliff.
    */
  def loadCatalog(spark: SparkSession, path: String): Seq[MvDef] = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("basePath", StringType), StructField("mvPath", StringType),
      StructField("groupCols", ArrayType(StringType)),
      StructField("measureCols", ArrayType(StringType)),
      StructField("distinctCols", ArrayType(StringType)),
      StructField("hllP", IntegerType),
      StructField("baseFilter", StringType),
      StructField("exprMeasures", MapType(StringType, StringType)),
      StructField("_corrupt", StringType)))
    val rows = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt").json(path).collect()
    rows.toSeq.map { r =>
      require(r.isNullAt(r.fieldIndex("_corrupt")),
        s"corrupt catalog entry in $path: ${r.getString(r.fieldIndex("_corrupt"))}")
      registerExisting(spark,
        r.getString(0), r.getString(1),
        r.getSeq[String](2), r.getSeq[String](3), r.getSeq[String](4),
        r.getInt(5), Option(r.getString(6)),
        Option(r.getMap[String, String](7)).map(_.toMap)
          .getOrElse(Map.empty))
    }
  }

  private[plans] def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private[plans] def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Name-normalized SQL form for expression matching: attribute
    * identity (exprIds, qualifiers) is plan-local, so compare trees
    * with attributes reduced to bare names. Foldable subtrees fold
    * to literals FIRST — the optimizer constant-folds the query side
    * (`CAST(10 AS DOUBLE)` → `10.0`) but registration sees the
    * analyzed tree, and the match must not depend on which optimizer
    * stage this rule happens to run at.
    */
  private[plans] def normalizeExpr(e: Expression): String =
    e.transform {
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    }.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    }.sql
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
        // all candidates, then the coarsest rollup (fewest grouping
        // columns ≈ fewest rows); path tie-break for determinism. A
        // throwing candidate refuses instead of failing the query —
        // an optimization must never be the reason a plan errors.
        MvCatalog.all
          .flatMap(mv => scala.util.Try(rewrite(agg, mv)).toOption.flatten
            .map((mv.groupCols.size, mv.mvPath, _)))
          .sortBy { case (n, p, _) => (n, p) }
          .headOption.map(_._3)
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

    // fresh relation instance per rewrite: two navigations in one
    // query plan (a union of two rollup-bound aggregates, a self
    // join) must not share output exprIds — the analyzer's relation
    // dedup has already run by the time this rule fires
    val freshPlan = mv.plan.transformUp {
      case lr: LogicalRelation => lr.newInstance()
    }
    val mvAttrs: Map[String, Attribute] =
      freshPlan.output.map(a => a.name -> a).toMap

    // grouping: plain columns the MV groups by
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => a.name
      case _ => return None
    }
    // filters: a PARTIAL rollup's build predicate must be repeated by
    // the query, conjunct for conjunct (syntactic subsumption on the
    // name-normalized form — never implication guessing); whatever
    // remains must reference grouping columns only (those commute
    // with the rollup and apply over it)
    val queryConj = condOpt
      .map(MaterializedAggregate.splitConjuncts).getOrElse(Nil)
      .map(c => (c, MaterializedAggregate.normalizeExpr(c)))
    if (!mv.filterConjuncts.forall(fc => queryConj.exists(_._2 == fc)))
      return None
    val residual = queryConj
      .filterNot(p => mv.filterConjuncts.contains(p._2)).map(_._1)
      // IsNotNull on a column the rollup's build predicate already
      // null-rejects is vacuously true over the rollup — the
      // optimizer infers these from null-intolerant predicates when
      // this rule runs late in the pipeline
      .filterNot {
        case org.apache.spark.sql.catalyst.expressions.IsNotNull(
          a: AttributeReference) => mv.filterNotNullCols.contains(a.name)
        case _ => false
      }
    val newCond = residual.reduceOption(And(_, _)).map { cond =>
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
        // a measure is a registered plain column OR a registered
        // expression measure (matched by name-normalized tree —
        // "revenue" can be price arithmetic, not just a column)
        def measureKey(x: Expression): Option[String] = x match {
          case a: AttributeReference =>
            Some(a.name).filter(mv.measureCols.contains)
          case e =>
            mv.exprMeasureKeys.get(MaterializedAggregate.normalizeExpr(e))
        }
        ae.aggregateFunction match {
          case Sum(x, _) if measureKey(x).exists(k =>
              mvAttrs.contains(mv.sumCol(k))) =>
            Some(cAgg(Sum(mvAttrs(mv.sumCol(measureKey(x).get)))))
          case Min(x) if measureKey(x).exists(k =>
              mvAttrs.contains(mv.minCol(k))) =>
            Some(cAgg(Min(mvAttrs(mv.minCol(measureKey(x).get)))))
          case Max(x) if measureKey(x).exists(k =>
              mvAttrs.contains(mv.maxCol(k))) =>
            Some(cAgg(Max(mvAttrs(mv.maxCol(measureKey(x).get)))))
          case Count(Seq(Literal(_, _))) =>
            Some(cAgg(Sum(mvAttrs(mv.countCol))))
          case Count(Seq(x)) if measureKey(x).exists(k =>
              mvAttrs.contains(mv.nnzCol(k))) =>
            Some(cAgg(Sum(mvAttrs(mv.nnzCol(measureKey(x).get)))))
          case h: graft.functions.HyperLogLog
              if h.pExpr.foldable &&
                Option(h.pExpr.eval())
                  .collect { case n: Number => n.intValue() }
                  .contains(mv.hllP) =>
            // the sketch navigates iff the query hashes EXACTLY what
            // the rollup's registers were built from (name-normalized
            // tree match) — then the register fold is bit-identical
            val norm = MaterializedAggregate.normalizeExpr(h.child)
            mv.distinctCols
              .find(d => mv.hashSql.get(d).contains(norm) &&
                mvAttrs.contains(mv.hllCol(d)))
              .map(d => cAgg(graft.functions.HllMergeAgg(
                mvAttrs(mv.hllCol(d)), Literal(mv.hllP))))
          case Average(x, _) if measureKey(x).exists(k =>
              mvAttrs.contains(mv.sumCol(k))) =>
            // AVG = sum / COUNT(x): use nnz; a legacy rollup without
            // it may only divide by cnt when x can't be NULL
            val k = measureKey(x).get
            val denom =
              if (mvAttrs.contains(mv.nnzCol(k)))
                Some(mvAttrs(mv.nnzCol(k)))
              else if (!x.nullable) Some(mvAttrs(mv.countCol))
              else None
            denom.map(d => Divide(
              Cast(cAgg(Sum(mvAttrs(mv.sumCol(k)))), DoubleType),
              Cast(cAgg(Sum(d)), DoubleType)))
          case _ => None
        }
      // an aggregate that fell through the derivable guard above
      // (DISTINCT, FILTER, unknown function) must refuse HERE — the
      // generic rebuild below would otherwise reconstruct it over
      // rollup columns, silently unsound
      case _: AggregateExpression => None
      // scalar expression over derivable parts: rebuild the tree
      // (CollapseProject folds projections INTO aggregateExpressions,
      // so md5(array_join(transform(<sketch agg>, …))) is the normal
      // shape by the time this rule runs, not an exception). Any
      // non-derivable leaf — an attribute that is neither a grouping
      // column nor inside a derivable aggregate — fails the whole
      // expression and with it the rewrite.
      case a: AttributeReference => None
      // non-deterministic expressions (rand() over the group output)
      // would re-draw under the rewrite — refuse, same as every rule
      // Spark ships
      case nd if !nd.deterministic => None
      case other =>
        val kids = other.children.map(derive)
        if (kids.nonEmpty && kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else if (kids.isEmpty) Some(other) // literal / leaf function
        else None
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
    val filtered = newCond.map(Filter(_, freshPlan)).getOrElse(freshPlan)
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
