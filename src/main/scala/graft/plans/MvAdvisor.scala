package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, LogicalPlan, Project}
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
  * every column its non-shared filters reference (a filter must
  * commute with the rollup, so its columns must be grouping keys),
  * measures = the plain columns under derivable aggregate functions.
  * Queries over the same base table MERGE into one candidate (union
  * of keys and measures — one rollup serving N queries beats N
  * rollups: the rule re-aggregates, so a coarser query still
  * navigates the merged grain).
  *
  * Round-13 parity with the rule's FULL navigation surface:
  *  - EXPRESSION measures (the TPC-H Q1 revenue shape): an aggregate
  *    over a deterministic expression of fact columns becomes an
  *    `exprMeasures` entry, keyed by the same name-normalized tree
  *    the rule matches on; the recommended name is a digest of that
  *    tree so identical expressions across queries merge. Candidates
  *    whose normalized form does not survive a print→parse→normalize
  *    round-trip are dropped (the built rollup could never match).
  *  - APPROX-DISTINCT sketch columns: a `hyper_log_log(hash, p)`
  *    aggregate whose hash tree is EXACTLY the engine's canonical
  *    60-bit string hash of one fact column becomes a `distinctCols`
  *    entry at that precision (any other hash tree could never
  *    navigate — the rule pins the registered tree — so the shape
  *    drops instead of recommending a dead register array). A rollup
  *    carries ONE precision; under mixed-`p` workloads the majority
  *    precision wins and minority shapes drop, loudly.
  *  - PARTIAL (filtered) rollups: a filter conjunct repeated by EVERY
  *    query of a base (two or more — a single query is no evidence
  *    the predicate is workload-invariant, and folding its columns
  *    into the keys serves it just as well) becomes the candidate's
  *    `baseFilter` instead of forcing its columns into the grouping
  *    key — the dashboard-slice shape ("always this year", "always
  *    shipped lines"), where keying on a high-cardinality filter
  *    column would destroy compression.
  *
  * [[recommend]] keeps candidates whose measured compression —
  * (filtered) base rows / approx-distinct grouping combinations (one
  * HLL-sketch scan per candidate, never a shuffle-heavy exact
  * distinct) — clears `minCompression`. A rollup near the fact's own
  * cardinality would navigate correctly but buy nothing; the
  * recommender's job is to refuse it.
  *
  * [[advise]] closes the loop — recommend, build, register, persist
  * nothing the caller didn't ask for — so a serving layer can hand
  * its workload over and have every subsequent query navigate with
  * zero manual registration.
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
  *
  * Grouping-sets workloads (ROLLUP / CUBE / GROUPING SETS) extract
  * too (round 14, with the rule's Expand-replay navigation): the
  * candidate is the finest grain the grouping sets touch — see
  * [[groupingSetShape]].
  */
object MvAdvisor extends org.apache.spark.internal.Logging {

  /** One recommended rollup: where, its grain, what it can answer,
    * and the measured size evidence.
    */
  case class Candidate(basePath: String, groupCols: Seq[String],
      measureCols: Seq[String], queriesCovered: Int,
      baseRows: Long, groupRowsApprox: Long,
      exprMeasures: Map[String, String] = Map.empty,
      distinctCols: Seq[String] = Nil, hllP: Int = 12,
      baseFilter: Option[String] = None) {
    def compression: Double =
      if (groupRowsApprox == 0L) Double.PositiveInfinity
      else baseRows.toDouble / groupRowsApprox
  }

  /** One filter conjunct in normalized-SQL form plus the column names
    * it references (normalized SQL doubles as the re-parseable form —
    * registration re-resolves it against the base scan).
    */
  private case class Conjunct(sql: String, refs: Set[String])

  private case class Shape(basePath: String, keys: Set[String],
      measures: Set[String],
      exprMeasures: Map[String, Set[String]], // normalized sql -> refs
      sketches: Seq[(String, Int, String)], // (col, p, normalized hash tree)
      conjuncts: Seq[Conjunct])

  /** Extract the aggregate shapes a rollup could serve, one per
    * navigable Aggregate node found in the workload's analyzed plans.
    * Shapes the RULE would refuse (distinct/filtered aggregates,
    * non-fact measures, non-parquet scans, non-star joins) extract
    * nothing — the advisor must never recommend a rollup the rule
    * cannot use.
    */
  private def shapes(df: DataFrame): Seq[Shape] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Shape]
    df.queryExecution.analyzed.foreach {
      case agg: Aggregate if agg.child.isInstanceOf[Expand] =>
        // ROLLUP/CUBE/GROUPING SETS: the rule navigates this shape by
        // replaying the Expand over the rollup, so the candidate is
        // the FINEST grain the grouping sets touch
        groupingSetShape(agg, agg.child.asInstanceOf[Expand])
          .foreach(out += _)
      case agg: Aggregate =>
        // an INNER star join unwraps from either side (the roles are
        // symmetric); keep every interpretation that yields a
        // derivable shape — a useless small-side candidate dies at
        // the compression gate, never at soundness
        unwrapStar(agg.child).foreach {
          case (conjuncts, joinKeys, path, factSet, dimSet) =>
            val keyCols = scala.collection.mutable.LinkedHashSet.empty[String]
            keyCols ++= joinKeys
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
            val exprMs = scala.collection.mutable.LinkedHashMap
              .empty[String, Set[String]]
            val sketches = scala.collection.mutable.ArrayBuffer
              .empty[(String, Int, String)]
            // a measure is a plain FACT column or a deterministic
            // expression over fact columns (the rule's p122 surface);
            // anything else refuses the whole shape
            def addMeasure(x: Expression): Unit = x match {
              case a: AttributeReference if factSet.contains(a) =>
                measures += a.name
              case e if e.deterministic && e.references.nonEmpty &&
                  e.references.forall(factSet.contains) =>
                exprMs(MaterializedAggregate.normalizeExpr(e)) =
                  e.references.map(_.name).toSet
              case _ => ok = false
            }
            agg.aggregateExpressions.foreach(_.foreach {
              case ae: AggregateExpression
                  if ae.isDistinct || ae.filter.isDefined => ok = false
              case ae: AggregateExpression =>
                ae.aggregateFunction match {
                  case h: graft.functions.HyperLogLog =>
                    // only the engine's canonical hash of ONE fact
                    // column can ever navigate (validated against the
                    // base scan in candidates()); record the tree
                    val refs = h.child.references.toSeq
                    val p = if (h.pExpr.foldable)
                      Option(h.pExpr.eval())
                        .collect { case n: Number => n.intValue() }
                    else None
                    if (refs.length == 1 && factSet.contains(refs.head) &&
                        h.child.deterministic && p.isDefined)
                      sketches += ((refs.head.name, p.get,
                        MaterializedAggregate.normalizeExpr(h.child)))
                    else ok = false
                  case Count(seq) if seq.forall(_.foldable) =>
                    // COUNT(*) / COUNT(lit) derive via cnt — but only
                    // for a NON-NULL literal (COUNT(NULL) is 0 per
                    // group; the rule refuses it, so must the advisor)
                    if (seq.exists(_.eval() == null)) ok = false
                  case Sum(x, _) => addMeasure(x)
                  case Min(x) => addMeasure(x)
                  case Max(x) => addMeasure(x)
                  case Average(x, _) => addMeasure(x)
                  case Count(Seq(x)) => addMeasure(x)
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
            if (ok && (keyCols.nonEmpty || conjuncts.nonEmpty))
              out += Shape(path, keyCols.toSet, measures.toSet,
                exprMs.toMap, sketches.toSeq, conjuncts)
        }
      case _ => ()
    }
    out.toSeq
  }

  /** Grouping-sets workloads (ROLLUP / CUBE / GROUPING SETS) extract
    * a candidate too: the analyzed plan is Aggregate over Expand, and
    * since [[AggregateRewriteRule]] navigates that shape by replaying
    * the Expand over the rollup, the right recommendation is simply
    * the FINEST grain — every grouping-set slot's base columns as
    * keys, the measure passthroughs as measures. gid and grouping()/
    * grouping_id() expressions ride the replay and constrain nothing.
    * Anything the rule's replay would refuse (distinct aggregates,
    * non-fact measures, aggregates over a nulled grouping copy)
    * extracts nothing, same contract as the flat/star extractor.
    */
  private def groupingSetShape(agg: Aggregate, ex: Expand): Seq[Shape] = {
    // the analyzer parks grouping expressions as aliases in a Project
    // directly under the Expand (above the join in star shapes);
    // peel that layer — collecting substitutions — before unwrapping
    // the scan-or-star chain below it
    val subst =
      scala.collection.mutable.Map.empty[
        org.apache.spark.sql.catalyst.expressions.ExprId, Expression]
    var core: LogicalPlan = ex.child
    var peeling = true
    while (peeling) core match {
      case Project(pl, c) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.deterministic
          case _ => false
        } =>
        pl.foreach {
          case al: Alias => subst(al.exprId) = al.child
          case _ => ()
        }
        core = c
      case _ => peeling = false
    }
    def resolve(e: Expression): Expression = e.transformDown {
      case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
    }
    // rollup over a star join extracts like the flat star path: fact
    // join keys become rollup keys, dim references constrain nothing
    unwrapStar(core).flatMap {
      case (conjuncts, joinKeys, path, factSet, dimSet) =>
        groupingSetShapeFor(agg, ex, resolve, conjuncts, joinKeys, path,
          factSet, dimSet)
    }
  }

  private def groupingSetShapeFor(agg: Aggregate, ex: Expand,
      resolve: Expression => Expression, conjuncts: Seq[Conjunct],
      joinKeys: Set[String], path: String,
      factSet: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      dimSet: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[Shape] = {
    val n = ex.output.length
    if (ex.projections.isEmpty || ex.projections.exists(_.length != n))
      return None
    var ok = true
    val keyCols = scala.collection.mutable.LinkedHashSet.empty[String]
    keyCols ++= joinKeys
    // never-NULLed shared expr per slot (the measure feed); None for
    // literal slots (gid) and for grouping-set slots
    val slotExpr = new Array[Option[Expression]](n)
    (0 until n).foreach { i =>
      val elems = ex.projections.map(_(i))
      if (elems.forall(_.foldable)) slotExpr(i) = None // gid rides
      else {
        val nonNull = elems.filter {
          case Literal(null, _) => false
          case _ => true
        }
        val head = nonNull.head
        val uniform = elems.forall {
          case Literal(null, _) => true
          case e => e.semanticEquals(head)
        }
        val res = resolve(head)
        if (!uniform || !res.deterministic ||
          !res.references.forall(a =>
            factSet.contains(a) || dimSet.contains(a))) {
          ok = false; slotExpr(i) = None
        } else if (nonNull.length != elems.length) {
          // retired in some set → a grouping-set slot: its FACT
          // columns key the rollup; dim references ride the join
          slotExpr(i) = None
          res.references.foreach(a =>
            if (factSet.contains(a)) keyCols += a.name)
        } else slotExpr(i) = Some(res)
      }
    }
    if (!ok) return None
    val outIdx = ex.output.map(_.exprId).zipWithIndex.toMap
    // groupings reference Expand outputs: grouping-set slots already
    // keyed; a never-NULLed slot grouped on (a set keeping it in
    // every projection) keys its fact columns too
    agg.groupingExpressions.foreach {
      case a: AttributeReference if outIdx.contains(a.exprId) =>
        slotExpr(outIdx(a.exprId)).foreach(_.references.foreach(r =>
          if (factSet.contains(r)) keyCols += r.name))
      case _ => ok = false
    }
    // aggregate children reference measure passthroughs — map them
    // back to fact expressions (a nulled copy under an aggregate is
    // a shape the rule's replay refuses: extract nothing)
    def substAgg(x: Expression): Expression = x.transform {
      case a: AttributeReference if outIdx.contains(a.exprId) =>
        slotExpr(outIdx(a.exprId)) match {
          case Some(e) => e
          case None => ok = false; a
        }
    }
    val measures = scala.collection.mutable.LinkedHashSet.empty[String]
    val exprMs = scala.collection.mutable.LinkedHashMap.empty[String, Set[String]]
    val sketches = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
    def addMeasure(x0: Expression): Unit = substAgg(x0) match {
      case a: AttributeReference if factSet.contains(a) => measures += a.name
      case e if e.deterministic && e.references.nonEmpty &&
          e.references.forall(factSet.contains) =>
        exprMs(MaterializedAggregate.normalizeExpr(e)) =
          e.references.map(_.name).toSet
      case _ => ok = false
    }
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression
          if ae.isDistinct || ae.filter.isDefined => ok = false
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case h: graft.functions.HyperLogLog =>
            val hc = substAgg(h.child)
            val refs = hc.references.toSeq
            val p = if (h.pExpr.foldable)
              Option(h.pExpr.eval())
                .collect { case num: Number => num.intValue() }
            else None
            if (refs.length == 1 && factSet.contains(refs.head) &&
                hc.deterministic && p.isDefined)
              sketches += ((refs.head.name, p.get,
                MaterializedAggregate.normalizeExpr(hc)))
            else ok = false
          case Count(seq) if seq.forall(_.foldable) =>
            // non-null literals only — rule parity (see the flat path)
            if (seq.exists(_.eval() == null)) ok = false
          case Sum(x, _) => addMeasure(x)
          case Min(x) => addMeasure(x)
          case Max(x) => addMeasure(x)
          case Average(x, _) => addMeasure(x)
          case Count(Seq(x)) => addMeasure(x)
          case _ => ok = false
        }
      case _ => ()
    })
    if (ok && (keyCols.nonEmpty || conjuncts.nonEmpty))
      Some(Shape(path, keyCols.toSet, measures.toSet,
        exprMs.toMap, sketches.toSeq, conjuncts))
    else None
  }

  /** Generalizes [[unwrapScan]] through a star-join chain, mirroring
    * the rule's unwrapShape in advisory (name-level) form:
    * (fact filter conjuncts, fact join-key columns, fact path,
    * fact-side attrs, dim-side attrs). Each join must be INNER or
    * LEFT OUTER with the fact side reachable, conditions pure
    * attr-equality conjunctions; the fact side's join keys join the
    * candidate's key set (the rewrite makes them rollup columns). A
    * shape the rule would refuse returns None.
    */
  private def unwrapStar(p: LogicalPlan): Seq[(Seq[Conjunct], Set[String],
      String,
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
          case ((conjuncts, jks, path, factSet, dimSet), dimP, factLeft) =>
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
              else Seq((conjuncts, jks ++ keys, path, factSet, dimSet ++ dimOut))
            }
        }
      case other =>
        unwrapScan(other).toSeq.map { case (conjuncts, path) =>
          // factSet = the scan subtree's output
          (conjuncts, Set.empty[String], path, other.outputSet,
            org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)
        }
    }

  /** (filter conjuncts along the chain, parquet path) for a bare
    * Filter/Project chain over ONE single-root parquet scan; None
    * disqualifies (join, union, non-parquet). The path keeps its
    * scheme/authority — unlike the rule's comparison-only normalize,
    * the advisor DEREFERENCES it (stats scan + rollup build), and a
    * stripped 's3a://...' would resolve against the wrong filesystem.
    */
  private def unwrapScan(p: LogicalPlan): Option[(Seq[Conjunct], String)] =
    p match {
      case r: LogicalRelation => r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.location.rootPaths.length == 1 =>
          Some((Nil, fs.location.rootPaths.head.toString))
        case _ => None
      }
      case Project(pl, child) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => al.child.deterministic
          case _ => false
        } => unwrapScan(child)
      case Filter(cond: Expression, child) =>
        unwrapScan(child).map { case (cs, path) =>
          val more = MaterializedAggregate.splitConjuncts(cond).map(c =>
            Conjunct(MaterializedAggregate.normalizeExpr(c),
              c.references.map(_.name).toSet))
          (cs ++ more, path)
        }
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        unwrapScan(s.child)
      case _ => None
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The engine's canonical hash tree for `d` on this base, in the
    * same normalized form [[MaterializedAggregate.registerExisting]]
    * pins — a workload sketch navigates iff it hashed exactly this.
    */
  private def canonicalHashSql(spark: SparkSession, path: String,
      d: String): Option[String] =
    scala.util.Try {
      val analyzed = spark.read.parquet(path)
        .select(graft.functions.Md5Hash.h60String(col(d)).as("__h"))
        .queryExecution.analyzed
      val e = analyzed.expressions.collectFirst {
        case al: Alias if al.name == "__h" => al.child
      }.get
      MaterializedAggregate.normalizeExpr(e)
    }.toOption

  /** Does the normalized-SQL form survive print → parse → resolve →
    * normalize against this base unchanged? Registration re-resolves
    * from the SQL string while the rule matches the query's tree —
    * only round-trip-stable forms can ever navigate.
    */
  private def exprRoundTrips(spark: SparkSession, path: String,
      sql: String): Boolean =
    scala.util.Try {
      val analyzed = spark.read.parquet(path).select(expr(sql).as("__m"))
        .queryExecution.analyzed
      val e = analyzed.expressions.collectFirst {
        case al: Alias if al.name == "__m" => al.child
      }.get
      MaterializedAggregate.normalizeExpr(e) == sql
    }.getOrElse(false)

  private def filterRoundTrips(spark: SparkSession, path: String,
      sql: String, expected: Set[String]): Boolean =
    scala.util.Try {
      val analyzed = spark.read.parquet(path)
        .where(expr(sql)).queryExecution.analyzed
      val cond = analyzed.collectFirst {
        case f: Filter => f.condition
      }.get
      MaterializedAggregate.splitConjuncts(cond)
        .map(MaterializedAggregate.normalizeExpr).toSet == expected
    }.getOrElse(false)

  /** Merge the workload's shapes per base table and measure each
    * candidate's compression (one count + one approx-distinct scan
    * per table, over the FILTERED base when a shared conjunct became
    * the candidate's baseFilter — that is what the rollup would hold).
    *
    * Per-shape schema guard: [[unwrapScan]] walks through
    * alias-bearing Projects, so a query filtering or aggregating a
    * COMPUTED column records the alias name against the raw base path
    * — a name the base scan cannot resolve. Such shapes are DROPPED
    * (with a logWarning), not resolved: recommending a rollup keyed
    * on a derived column the rule's own unwrap would then refuse
    * (the rule requires attrs-only projections under the aggregate)
    * buys nothing, and one such query must never poison the
    * recommendation for the rest of the workload (round-12 advisory
    * finding: `col(name)` on the base threw AnalysisException out of
    * the whole `recommend()` call).
    */
  def candidates(spark: SparkSession, workload: Seq[DataFrame]): Seq[Candidate] = {
    val byBase = workload.flatMap(shapes).groupBy(_.basePath)
    byBase.toSeq.sortBy(_._1).flatMap { case (path, ss0) =>
      val baseCols = spark.read.parquet(path).schema.fieldNames.toSet
      val ss1 = ss0.filter { sh =>
        val names = sh.keys ++ sh.measures ++ sh.conjuncts.flatMap(_.refs) ++
          sh.exprMeasures.values.flatten ++ sh.sketches.map(_._1)
        val missing = names.filterNot(baseCols)
        if (missing.nonEmpty)
          logWarning(s"MV advisor: dropping a workload shape over $path " +
            s"— name(s) ${missing.mkString(", ")} are alias-defined " +
            "(not base columns); the navigation rule could not serve it")
        missing.isEmpty
      }
      // sketch validation: the rule pins the registered hash tree, so
      // a sketch over any OTHER tree could never navigate — drop the
      // shape rather than recommend a dead register array
      val ss2 = ss1.filter { sh =>
        val bad = sh.sketches.filterNot { case (d, _, norm) =>
          canonicalHashSql(spark, path, d).contains(norm)
        }
        if (bad.nonEmpty)
          logWarning(s"MV advisor: dropping a workload shape over $path " +
            s"— sketch over ${bad.map(_._1).mkString(", ")} does not use " +
            "the engine's canonical column hash; it could never navigate")
        bad.isEmpty
      }
      // one precision per rollup: majority p wins (ties -> larger),
      // minority-precision shapes drop loudly
      val ps = ss2.flatMap(_.sketches.map(_._2))
      val hllP =
        if (ps.isEmpty) 12
        else ps.groupBy(identity).toSeq
          .map { case (p, g) => (g.size, p) }
          .sortBy { case (n, p) => (-n, -p) }.head._2
      val ss3 = ss2.filter { sh =>
        val off = sh.sketches.filter(_._2 != hllP)
        if (off.nonEmpty)
          logWarning(s"MV advisor: dropping a workload shape over $path " +
            s"— sketch precision ${off.map(_._2).distinct.mkString(",")} " +
            s"conflicts with the candidate's p=$hllP (one precision per " +
            "rollup); re-issue at the majority precision to cover it")
        off.isEmpty
      }
      // expression measures must survive the print/parse round-trip
      val ss4 = ss3.filter { sh =>
        val bad = sh.exprMeasures.keys.filterNot(exprRoundTrips(spark, path, _))
        if (bad.nonEmpty)
          logWarning(s"MV advisor: dropping a workload shape over $path " +
            "— an expression measure does not round-trip through SQL; " +
            "the built rollup could never match the query's tree")
        bad.isEmpty
      }
      if (ss4.isEmpty) None
      else {
        // a conjunct repeated by EVERY shape (>= 2 of them) becomes
        // the candidate's baseFilter — the workload-invariant slice;
        // everything else contributes its columns to the keys
        val conjSets = ss4.map(_.conjuncts.map(_.sql).toSet)
        val common0: Set[String] =
          if (ss4.length >= 2 && conjSets.forall(_.nonEmpty))
            conjSets.reduce(_ intersect _)
          else Set.empty[String]
        val common =
          if (common0.nonEmpty &&
              filterRoundTrips(spark, path,
                common0.toSeq.sorted.mkString(" AND "), common0))
            common0
          else Set.empty[String] // degrade: its columns key instead
        val baseFilter =
          if (common.isEmpty) None
          else Some(common.toSeq.sorted.mkString(" AND "))
        val keys = (ss4.flatMap(_.keys) ++
          ss4.flatMap(_.conjuncts.filterNot(c => common(c.sql))
            .flatMap(_.refs))).distinct
        val measures = ss4.flatMap(_.measures).distinct
        val exprMeasures = ss4.flatMap(_.exprMeasures.keys).distinct
          .map(sql => s"em_${md5hex(sql).take(10)}" -> sql).toMap
        val distinctCols = ss4.flatMap(_.sketches.map(_._1)).distinct
        val base = baseFilter.foldLeft(spark.read.parquet(path))(
          (df, f) => df.where(expr(f)))
        val stats =
          if (keys.isEmpty) base.agg(count(lit(1)).as("n")).head()
          else base.agg(
            count(lit(1)).as("n"),
            approx_count_distinct(struct(keys.map(col): _*)).as("g")).head()
        Some(Candidate(path, keys, measures, ss4.size,
          stats.getLong(0), if (keys.isEmpty) 1L else stats.getLong(1),
          exprMeasures, distinctCols, hllP, baseFilter))
      }
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
      val name = md5hex(c.basePath).take(12)
      MaterializedAggregate.buildAndRegister(spark, c.basePath,
        s"$mvDir/mv_$name.parquet", c.groupCols, c.measureCols,
        c.distinctCols, c.hllP, c.baseFilter, c.exprMeasures)
    }

  /** The closed advisor loop (round-12 verdict ask #4): analyze the
    * workload, keep what clears the compression gate, build and
    * register under `mvDir` — after this returns, re-issuing any
    * covered workload query navigates with zero manual registration.
    * Persist across drivers with
    * [[MaterializedAggregate.saveCatalog]] if wanted — this method
    * deliberately writes no catalog file of its own.
    */
  def advise(spark: SparkSession, workload: Seq[DataFrame], mvDir: String,
      minCompression: Double = 10.0): Seq[MaterializedAggregate.MvDef] =
    buildRecommended(spark, recommend(spark, workload, minCompression), mvDir)
}
