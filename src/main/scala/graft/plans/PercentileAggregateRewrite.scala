package graft.plans

import org.apache.spark.sql.{Column, SparkSession, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.operators.PercentileOps

/** Optimizer rule: route the built-in exact-percentile aggregates —
  * `percentile(c, q)`, `percentile_disc(q) WITHIN GROUP (ORDER BY c)`,
  * and (via their analysis-time replacement into `Percentile`)
  * `percentile_cont` and `median` — onto the fully-distributed
  * histogram-selection plan of
  * [[graft.operators.PercentileOps.exactQuantilesSelect]].
  *
  * Spark plans these as `TypedImperativeAggregate`s (ObjectHashAggregate):
  * every group buffers its full value→count map in ONE executor hash map
  * per aggregate expression. At 100 TB a popular group holds ~10⁸ map
  * entries and OOMs; even at bench scale the per-row map churn made the
  * SQL-standard syntax the slowest query in the inventory (q67). The
  * substituted plan computes the identical result from shuffle-friendly
  * pieces — an occupied-bucket histogram (map-side combined; the shuffle
  * never carries the value set), rank math over buckets, and a
  * candidates-only ranking window — with no per-group buffering and no
  * driver collects, so the SQL syntax a user actually writes gets the
  * plan that survives scale.
  *
  * Two shapes rewrite. (1) A logical `Aggregate` over percentile calls
  * — the grouped report. (2) The same calls as WINDOW functions over a
  * whole partition (`percentile(v, q) OVER (PARTITION BY k)`, no ORDER
  * BY in the OVER clause): WindowExec buffers the identical value map
  * per window partition, and since every row of a partition receives
  * the same scalar, the node becomes the grouped plan joined back on
  * the partition keys (null-safe). Ordered specs — running percentiles
  * — are never touched.
  *
  * Matched narrowly (the rewrite must be a pure win, never a risk): a
  * logical `Aggregate` in which EVERY aggregate function is a
  * `Percentile`/`PercentileDisc` over a numeric value expression with
  * foldable fraction(s) in [0,1] — a scalar, or for `percentile` the
  * array form `percentile(c, array(0.25, 0.5, 0.9))` (each fraction
  * becomes one histogram-plan column and the final Project re-assembles
  * the array, preserving the built-in's NULL-array-on-empty-group
  * shape) — `frequency = 1`, either within-group direction (`ORDER BY
  * ... DESC` maps to mirrored pick ranks in the substituted plan),
  * non-legacy disc calculation, no DISTINCT and no FILTER clause.
  * `percentile_disc` array forms and any mix with other aggregate
  * functions (the negative plan test pins one) are left untouched.
  * Non-aggregate parts of the
  * output — grouping columns, arithmetic around the percentile like
  * `p50 + 1` — are re-evaluated over the substituted plan's output, and
  * the final Project pins the original names, exprIds and order, so
  * parent operators keep resolving unchanged.
  *
  * Semantics parity (pinned by sbt tests + the q67 DuckDB oracle):
  * identical values incl. ties/interpolation edges, NULL values excluded
  * per measure, all-NULL groups kept with NULL output, NULL group keys
  * kept as their own group, empty input → no rows (with grouping) / one
  * NULL row (global aggregate — preserved by the grand-total count row).
  */
object PercentileAggregateRewrite extends Rule[LogicalPlan] {

  /** One rewritable percentile call: value expression, the requested
    * fractions (one for the scalar forms; several for
    * `percentile(c, array(...))`, which returns them as one array),
    * disc/cont, and the within-group direction (`rev = true` ⇔
    * `ORDER BY c DESC`).
    */
  private case class PctCall(value: Expression, qs: Seq[Double],
      disc: Boolean, rev: Boolean, array: Boolean)

  /** Literal fraction(s) in [0,1] — a scalar double, or a non-empty
    * double array for the multi-quantile reporting form (`(fractions,
    * isArray)`). By the time this rule runs the operator-optimization
    * batch has folded the analyzer's implicit casts, but `foldable`
    * also catches the first fixed-point pass. An array containing a
    * NULL element is refused (the built-in raises its own error).
    */
  private def fractions(e: Expression): Option[(Seq[Double], Boolean)] = e match {
    case f if f.foldable && f.dataType == DoubleType =>
      f.eval() match {
        case d: java.lang.Double if d >= 0.0 && d <= 1.0 => Some((Seq(d), false))
        case _ => None
      }
    case f if f.foldable && (f.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) =>
      f.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData if a.numElements() > 0 =>
          val vs = (0 until a.numElements()).map { i =>
            if (a.isNullAt(i)) Double.NaN else a.getDouble(i) // NaN fails the range check
          }
          if (vs.forall(v => v >= 0.0 && v <= 1.0)) Some((vs, true)) else None
        case _ => None
      }
    case _ => None
  }

  private def pctCall(fn: AggregateFunction): Option[PctCall] = fn match {
    case Percentile(c, pct, Literal(1L, LongType), _, _, rev)
        if c.dataType.isInstanceOf[NumericType] =>
      fractions(pct).map { case (qs, arr) => PctCall(c, qs, disc = false, rev, arr) }
    // scalar only: the WITHIN GROUP syntax gives percentile_disc one
    // fraction; an array percentage (only constructible programmatically)
    // is refused rather than guessed at. Output typing is safe for ANY
    // numeric child: in this Spark version PercentileDisc returns DOUBLE
    // (pinned by a type-parity test), and ranking double-CAST values
    // cannot diverge the double-valued result even where distinct
    // child values collide in double (>2^53 longs): colliding values
    // share one output double, and a merged bucket's cume_dist is its
    // largest member's — the picked double is identical either way.
    case PercentileDisc(c, pct, rev, _, _, false)
        if c.dataType.isInstanceOf[NumericType] =>
      fractions(pct).collect { case (qs, false) => PctCall(c, qs, disc = true, rev, array = false) }
    case _ => None
  }

  /** Every AggregateExpression in `aggExprs`, or None if any is not a
    * rewritable percentile (mixed aggregates disable the whole rewrite).
    */
  private def collectCalls(aggExprs: Seq[NamedExpression])
      : Option[Map[ExprId, PctCall]] = {
    val all = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (all.isEmpty) return None
    val calls = all.map { ae =>
      if (ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty)
        pctCall(ae.aggregateFunction).map(ae.resultId -> _)
      else None
    }
    if (calls.exists(_.isEmpty)) None
    else Some(calls.flatten.toMap)
  }

  /** Both rewrite shapes re-embed the child subtree (the histogram scan
    * plus, for windows, the row leg), so the child runs MORE THAN ONCE.
    * That is only sound when every expression in the subtree is
    * deterministic — a rand()/UDF child could disagree between the two
    * evaluations and the join would pair rows against quantiles from a
    * different draw. Same guard Spark's own subtree-duplicating rules
    * apply. (Re-reading a stable source twice is the normal self-join
    * contract and is fine.)
    */
  private def deterministic(p: LogicalPlan): Boolean =
    p.expressions.forall(_.deterministic) && p.children.forall(deterministic)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
      collectCalls(aggExprs) match {
        case Some(calls) if aggExprs.forall(substitutable(_, groupingExprs, calls)) &&
            aggExprs.forall(_.deterministic) && deterministic(child) &&
            // same re-embedding guard as the window path: if the child
            // subtree still holds an eligible percentile node, rewriting
            // HERE would embed that child ~3× (hist, sentinel, candidate
            // scans) and each copy would then rewrite again —
            // multiplicative scans. Let the inner node rewrite first;
            // this node matches on the next fixed-point pass.
            !child.exists {
              case a: Aggregate => collectCalls(a.aggregateExpressions).isDefined
              case ww: Window => windowCalls(ww.windowExpressions).isDefined
              case _ => false
            } =>
          rewrite(agg, groupingExprs, aggExprs, child, calls)
        case _ => agg
      }
    // percentile aggregates used as WINDOW functions over a whole
    // partition — `percentile(v, q) OVER (PARTITION BY k)` — buffer the
    // partition's full value map inside WindowExec: the same OOM cliff,
    // per window partition. Every row of a partition receives the same
    // group scalar, so the node rewrites to the grouped histogram-
    // selection plan joined back onto the child on the partition keys
    // (null-safe, matching window partitioning of NULL keys). Matched
    // only when the OVER clause has no ORDER BY and every frame is the
    // whole partition — an ordered spec means a RUNNING percentile,
    // which this substitution must never touch.
    //
    // A query with SEVERAL whole-partition percentile specs analyzes to
    // a STACK of Window nodes (one per spec). The stack is peeled and
    // rewritten as one replacement over the SHARED base child — one
    // quantile subplan per spec, chained joins — so the base is scanned
    // once per spec plus once for the row leg (linear), never
    // duplicated per level (which would be exponential: each level
    // embedding its child twice).
    case w @ Window(_, _, Nil, _, _) =>
      peelStack(w) match {
        // every layer must be computable from the BASE alone (a layer
        // referencing an inner window's output cannot ride the shared-
        // base quantile plan) and fully deterministic — the value
        // expressions run once per histogram scan. If the base still
        // holds an eligible percentile Window the analyzer shaped in a
        // way the peel cannot flatten — or an eligible percentile
        // Aggregate (a window over a grouped percentile subquery) —
        // DEFER: rewriting above it would re-embed (and so re-execute)
        // that subtree once per scan, the multiplicative blowup this
        // stack handling exists to avoid. The inner node rewrites first
        // (its replacement holds no percentile calls), and this node
        // matches on the next fixed-point pass.
        case Some((layers, base)) if deterministic(base) &&
            !base.exists {
              case ww: Window => windowCalls(ww.windowExpressions).isDefined
              case a: Aggregate => collectCalls(a.aggregateExpressions).isDefined
              case _ => false
            } &&
            layers.forall { case (wes, ps, _) =>
              wes.forall(_.deterministic) &&
                AttributeSet(wes.flatMap(_.references) ++ ps.flatMap(_.references))
                  .subsetOf(base.outputSet)
            } =>
          rewriteWindowStack(w, layers, base)
        case _ => w
      }
  }

  /** Peel consecutive eligible whole-partition percentile Window nodes,
    * stepping through the attribute-only pruning Projects the analyzer
    * interposes between stacked Window nodes. Returns the eligible
    * layers outermost-first and the shared base, or None if the
    * outermost node itself is ineligible.
    */
  private def peelStack(w: Window)
      : Option[(Seq[(Seq[NamedExpression], Seq[Expression], Seq[PctCall])], LogicalPlan)] = {
    def through(p: LogicalPlan): LogicalPlan = p match {
      case Project(projList, inner: Window) if projList.forall(_.isInstanceOf[Attribute]) =>
        inner
      case other => other
    }
    w match {
      case Window(windowExprs, partitionSpec, Nil, child, _) =>
        windowCalls(windowExprs) match {
          case Some(calls) =>
            val layer = (windowExprs, partitionSpec, calls)
            through(child) match {
              case cw: Window => peelStack(cw) match {
                case Some((innerLayers, base)) => Some((layer +: innerLayers, base))
                case None => Some((Seq(layer), child))
              }
              case _ => Some((Seq(layer), child))
            }
          case None => None
        }
      case _ => None
    }
  }

  private def rewriteWindowStack(outer: Window,
      layers: Seq[(Seq[NamedExpression], Seq[Expression], Seq[PctCall])],
      base: LogicalPlan): LogicalPlan = {
    // chain: each layer joins its quantiles (computed over the SHARED
    // base) onto the accumulated plan
    val (joined, cols) = layers.foldLeft((base: LogicalPlan, Seq.empty[NamedExpression])) {
      case ((acc, cs), (windowExprs, partitionSpec, calls)) =>
        val (j, restored) = joinQuantiles(acc, base, partitionSpec, windowExprs, calls)
        (j, restored ++ cs)
    }
    // the replacement must reproduce the ORIGINAL outer node's output
    // (names, exprIds, order) exactly — the peeled-through pruning
    // Projects mean base.output is wider than what the parent expects.
    // Each output attribute is either a base column (flows through the
    // joins untouched) or one of the restored percentile aliases.
    val byId = cols.map(a => a.exprId -> a).toMap
    Project(outer.output.map(a => byId.getOrElse(a.exprId, a)), joined)
  }

  /** Build the quantile subplan for one (partitionSpec, calls) layer
    * over `base` and join it onto `acc`. Returns the join and the
    * restored output aliases (original names + exprIds).
    */
  private def joinQuantiles(acc: LogicalPlan, base: LogicalPlan,
      partitionSpec: Seq[Expression], windowExprs: Seq[NamedExpression],
      calls: Seq[PctCall]): (LogicalPlan, Seq[NamedExpression]) = {
    val spark = SparkSession.active
    val valueExprs = scala.collection.mutable.ArrayBuffer[Expression]()
    def measureIdx(v: Expression): Int = {
      val i = valueExprs.indexWhere(_.semanticEquals(v))
      if (i >= 0) i else { valueExprs += v; valueExprs.length - 1 }
    }
    val qKey = scala.collection.mutable.LinkedHashMap[(Int, Double, Boolean, Boolean), String]()
    val colOfExpr = calls.map { pc =>
      val names = pc.qs.map { q =>
        qKey.getOrElseUpdate((measureIdx(pc.value), q, pc.disc, pc.rev), s"__q${qKey.size}")
      }
      (pc, names)
    }
    val kNames = partitionSpec.indices.map(i => s"__k$i")
    def c(e: Expression): Column = GraftSqlShims.column(e)
    val df0 = GraftSqlShims.ofRows(spark, base).select(
      partitionSpec.zip(kNames).map { case (g, n) => c(g).as(n) } ++
        valueExprs.zipWithIndex.map { case (v, j) => c(v).as(s"__pv$j") }: _*)
    val measures = valueExprs.indices.map { j =>
      val qs = qKey.collect { case ((`j`, q, disc, rev), name) => (name, q, disc, rev) }.toSeq
      (s"m$j", org.apache.spark.sql.functions.col(s"__pv$j"), qs)
    }
    val out = PercentileOps.exactQuantilesSelectRev(df0, kNames, measures)
    val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      GraftSqlShims.analyzedPlan(out))
    val outAttr = analyzed.output.map(a => a.name -> a).toMap
    // join the per-group quantiles onto every accumulated row. With an
    // empty partitionSpec (OVER ()) the quantile side is exactly one
    // row — a Cross join, so the planner's cartesian check stays quiet.
    val cond = partitionSpec.zip(kNames)
      .map { case (p, n) => EqualNullSafe(p, outAttr(n)): Expression }
      .reduceOption(And)
    val joinType = if (cond.isEmpty) Cross else Inner
    val joined = Join(acc, analyzed, joinType, cond, JoinHint.NONE)
    val restored = windowExprs.zip(colOfExpr).map { case (ne, (pc, names)) =>
      Alias(restoreCall(pc, names, outAttr), ne.name)(exprId = ne.exprId)
    }
    (joined, restored)
  }

  /** The expression that reproduces one original percentile call from
    * the substituted plan's per-fraction output columns: the column
    * itself for the scalar forms; for `percentile(c, array(...))` the
    * fractions re-assemble into one array with the built-in's exact
    * type and NULL shape — ArrayType(Double, containsNull = false),
    * and a NULL ARRAY (not an array of NULLs) for a group with no
    * values. All fractions of a call share one group's value multiset,
    * so one column is NULL iff all are.
    */
  private def restoreCall(pc: PctCall, names: Seq[String],
      outAttr: Map[String, Attribute]): Expression =
    if (!pc.array) outAttr(names.head)
    else If(IsNull(outAttr(names.head)),
      Literal.create(null, ArrayType(DoubleType, containsNull = false)),
      CreateArray(names.map(n => KnownNotNull(outAttr(n)))))

  /** One PctCall per window expression, or None unless EVERY window
    * expression is a rewritable whole-partition percentile call.
    */
  private def windowCalls(windowExprs: Seq[NamedExpression])
      : Option[Seq[PctCall]] = {
    if (windowExprs.isEmpty) return None
    val calls = windowExprs.map {
      case Alias(WindowExpression(ae: AggregateExpression,
          WindowSpecDefinition(_, Nil, SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        pctCall(ae.aggregateFunction)
      case _ => None
    }
    if (calls.exists(_.isEmpty)) None else Some(calls.flatten)
  }

  /** The non-aggregate parts of an output expression must be computable
    * from the grouping expressions alone (SQL guarantees this for
    * analyzer-accepted queries; re-checked here because this runs mid-
    * optimizer where previous rules may have rearranged the tree).
    */
  private def substitutable(ne: NamedExpression, grouping: Seq[Expression],
      calls: Map[ExprId, PctCall]): Boolean = {
    def ok(e: Expression): Boolean = e match {
      case ae: AggregateExpression => calls.contains(ae.resultId)
      case e if grouping.exists(_.semanticEquals(e)) => true
      case _: Attribute => false // column that is neither grouping nor aggregate
      case l: LeafExpression => l.foldable // literals and other constants
      case other => other.children.forall(ok)
    }
    ne match {
      case Alias(c, _) => ok(c)
      case a: Attribute => ok(a)
      case _ => false
    }
  }

  private def rewrite(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan,
      calls: Map[ExprId, PctCall]): LogicalPlan = {
    val spark = SparkSession.active

    // one measure per distinct value expression (3 percentiles over one
    // column share a single unpivot arm); one output column per distinct
    // (value, q, disc, rev) — duplicate calls (and repeated fractions in
    // one array) collapse onto it
    val valueExprs = scala.collection.mutable.ArrayBuffer[Expression]()
    def measureIdx(v: Expression): Int = {
      val i = valueExprs.indexWhere(_.semanticEquals(v))
      if (i >= 0) i else { valueExprs += v; valueExprs.length - 1 }
    }
    val qKey = scala.collection.mutable.LinkedHashMap[(Int, Double, Boolean, Boolean), String]()
    val colOfCall = calls.map { case (rid, pc) =>
      val names = pc.qs.map { q =>
        qKey.getOrElseUpdate((measureIdx(pc.value), q, pc.disc, pc.rev), s"__q${qKey.size}")
      }
      rid -> ((pc, names))
    }

    // child projection: grouping exprs + measure value exprs, built with
    // the public DataFrame API over the already-optimized child plan
    val kNames = groupingExprs.indices.map(i => s"__k$i")
    def c(e: Expression): Column = GraftSqlShims.column(e)
    val df0 = GraftSqlShims.ofRows(spark, child).select(
      groupingExprs.zip(kNames).map { case (g, n) => c(g).as(n) } ++
        valueExprs.zipWithIndex.map { case (v, j) => c(v).as(s"__pv$j") }: _*)
    val measures = valueExprs.indices.map { j =>
      val qs = qKey.collect { case ((`j`, q, disc, rev), name) => (name, q, disc, rev) }.toSeq
      (s"m$j", org.apache.spark.sql.functions.col(s"__pv$j"), qs)
    }
    val out = PercentileOps.exactQuantilesSelectRev(df0, kNames, measures)
    // the spliced subtree is analyzed but NOT optimized, and this rule
    // runs after the optimizer's Finish-Analysis batch — the broadcast()
    // hint inside the window plan would reach the planner as a raw
    // ResolvedHint (internal error). Fold it into the Join node here.
    val analyzed = org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
      GraftSqlShims.analyzedPlan(out))
    val outAttr = analyzed.output.map(a => a.name -> a).toMap

    // final Project: re-evaluate each original output expression over the
    // substituted plan — percentile calls become their picked column,
    // grouping expressions their __k column — pinning name + exprId so
    // the parent plan's references keep resolving
    val groupAttr = groupingExprs.zip(kNames).map { case (g, n) => g -> outAttr(n) }
    def substitute(e: Expression): Expression = e match {
      case ae: AggregateExpression if colOfCall.contains(ae.resultId) =>
        val (pc, names) = colOfCall(ae.resultId)
        restoreCall(pc, names, outAttr)
      case other => groupAttr.find(_._1.semanticEquals(other)) match {
        case Some((_, attr)) => attr
        case None => other.mapChildren(substitute)
      }
    }
    val restored = aggExprs.map { ne =>
      val core = ne match {
        case Alias(childE, _) => substitute(childE)
        case a: Attribute => substitute(a)
        case other => substitute(other)
      }
      Alias(core, ne.name)(exprId = ne.exprId)
    }
    Project(restored, analyzed)
  }
}
