package graft.plans

import org.apache.spark.sql.{Column, SparkSession, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.operators.FuzzyJoin

/** Optimizer rule: rewrite the naive edit-distance join —
  * `A JOIN B ON levenshtein(a, b) <= k` (or the equivalent filter over a
  * cross join) — into the PassJoin blocking plan of
  * [[graft.operators.FuzzyJoin]].
  *
  * Spark plans a levenshtein join condition as a nested-loop cartesian
  * product: every row pair is compared — the O(n·m) cliff users hit the
  * first time they write a fuzzy join. The rewrite computes the DISTINCT
  * string pairs within distance k via pigeonhole segment blocking
  * (sound superset + exact rescore, see FuzzyJoin), then equi-joins both
  * inputs back on string equality. Multiplicity, duplicates and NULL
  * semantics are preserved exactly: each (left row, right row) pair with
  * lev ≤ k matches exactly one pairs row, and NULL strings — for which
  * the original predicate is NULL → filtered — drop in the equi-join.
  * The conformance query's DuckDB oracle runs the naive form; identical
  * hashes prove the rewrite is semantics-preserving.
  *
  * Matched narrowly (the rule must be a pure win, never a risk):
  * plain column references on each side, an integer literal bound
  * 1 ≤ k ≤ 6, inner/cross joins only; all other conjuncts stay as a
  * residual filter on top. The rule's output contains only
  * condition-bearing equi-joins, so it cannot re-match its own output
  * (safe under the optimizer's fixed-point batch).
  */
object LevenshteinJoinRewrite extends Rule[LogicalPlan] {

  private val MaxK = 6

  /** Re-entrance guard: predicate pushdown later merges the rewrite's own
    * exact-rescore filter into its internal segment equi-join, which would
    * re-match this rule on the next fixed-point pass (and recurse
    * forever). Joins produced by the rewrite carry this tag and are
    * skipped; the `__`-prefixed internal column names are excluded as a
    * second line of defense.
    */
  private val Rewritten =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.levJoinRewritten")

  /** (levAttrLeft, levAttrRight, k, residual conjuncts) when `cond` is a
    * conjunction containing exactly one rewritable lev-bound.
    *
    * Two families are recognized:
    *  - the unbounded form `levenshtein(a, b) ≤/< k` (and the mirrored
    *    `k ≥ lev`), where the comparison itself supplies the bound;
    *  - the thresholded 3-arg form Spark ≥ 3.5 documents as the fast
    *    path, `levenshtein(a, b, t)`, which returns the distance when it
    *    is ≤ t and −1 otherwise. The ONLY comparisons of it that denote
    *    a pure distance bound are the not-exceeded tests `≥ 0`, `> −1`
    *    and `≠ −1` (each ⟺ lev ≤ t). A `levenshtein(a,b,t) ≤ k` is NOT
    *    a bound — the −1 sentinel passes it — so it is deliberately not
    *    matched; when a user writes `lev3 ≥ 0 AND lev3 ≤ k`, the `≥ 0`
    *    conjunct drives the rewrite and the `≤ k` survives as the
    *    residual filter, which is exactly right.
    */
  private def extract(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Attribute, Attribute, Int, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    object Lev2 {
      def unapply(e: Expression): Option[(AttributeReference, AttributeReference)] = e match {
        case Levenshtein(a: AttributeReference, b: AttributeReference, None) => Some((a, b))
        case _ => None
      }
    }
    object Lev3 {
      def unapply(e: Expression): Option[(AttributeReference, AttributeReference, Int)] = e match {
        case Levenshtein(a: AttributeReference, b: AttributeReference,
            Some(Literal(t: Int, IntegerType))) => Some((a, b, t))
        case _ => None
      }
    }
    val hits = conjuncts.collect {
      // 2-arg form: both argument orders of every comparison
      case p @ LessThanOrEqual(Lev2(a, b), Literal(k: Int, IntegerType)) =>
        (p, a, b, k)
      case p @ LessThan(Lev2(a, b), Literal(k: Int, IntegerType)) =>
        (p, a, b, k - 1)
      case p @ GreaterThanOrEqual(Literal(k: Int, IntegerType), Lev2(a, b)) =>
        (p, a, b, k)
      case p @ GreaterThan(Literal(k: Int, IntegerType), Lev2(a, b)) =>
        (p, a, b, k - 1)
      // 3-arg bounded form: the not-exceeded tests, both argument orders
      case p @ GreaterThanOrEqual(Lev3(a, b, t), Literal(0, IntegerType)) =>
        (p, a, b, t)
      case p @ LessThanOrEqual(Literal(0, IntegerType), Lev3(a, b, t)) =>
        (p, a, b, t)
      case p @ GreaterThan(Lev3(a, b, t), Literal(-1, IntegerType)) =>
        (p, a, b, t)
      case p @ LessThan(Literal(-1, IntegerType), Lev3(a, b, t)) =>
        (p, a, b, t)
      case p @ Not(EqualTo(Lev3(a, b, t), Literal(-1, IntegerType))) =>
        (p, a, b, t)
      case p @ Not(EqualTo(Literal(-1, IntegerType), Lev3(a, b, t))) =>
        (p, a, b, t)
    }
    // EQUALITY forms — `levenshtein(a,b) = d` (the typo-join users
    // write) and the bounded `levenshtein(a,b,t) = d` with 0 ≤ d ≤ t.
    // `lev = d` implies `lev ≤ d`, so d drives the blocking; UNLIKE the
    // bound forms the equality itself must survive as a residual filter
    // (the rewrite's rescore only enforces ≤).
    val eqHits = conjuncts.collect {
      case p @ EqualTo(Lev2(a, b), Literal(d: Int, IntegerType)) => (p, a, b, d)
      case p @ EqualTo(Literal(d: Int, IntegerType), Lev2(a, b)) => (p, a, b, d)
      case p @ EqualTo(Lev3(a, b, t), Literal(d: Int, IntegerType)) if d >= 0 && d <= t =>
        (p, a, b, d)
      case p @ EqualTo(Literal(d: Int, IntegerType), Lev3(a, b, t)) if d >= 0 && d <= t =>
        (p, a, b, d)
    }
    // a BOUND hit drives the rewrite when present (any equality on the
    // same call simply stays in the residual, as every non-driving
    // conjunct does); only a lone equality drives via its implied bound
    val all = (hits, eqHits) match {
      case (Seq(h), _) => Seq((h._1, h._2, h._3, h._4, false))
      case (Seq(), Seq(e)) => Seq((e._1, e._2, e._3, e._4, true))
      case _ => Nil
    }
    // second line of defense, load-bearing for the equality forms:
    // their residual KEEPS a levenshtein predicate, which predicate
    // pushdown can merge into the rewrite's own internal joins (whose
    // instance tags a copy may not carry) — a side emitting the
    // rewrite's OWN working columns is our output, never a user join.
    // (Matched by exact name, not `__` prefix: a user column that
    // happens to start with __ must not silently disable the rewrite.)
    val rewriteInternals = Set("__sa", "__sb", "__seg", "__lb", "__one")
    all match {
      case Seq((p, a, b, k, keepPredicate)) if k >= 1 && k <= MaxK
          && a.dataType == StringType && b.dataType == StringType
          && !a.name.startsWith("__") && !b.name.startsWith("__")
          && !(l.output ++ r.output).exists(att => rewriteInternals(att.name)) =>
        val residual =
          if (keepPredicate) conjuncts else conjuncts.filterNot(_ eq p)
        if (l.outputSet.contains(a) && r.outputSet.contains(b))
          Some((a, b, k, residual))
        else if (l.outputSet.contains(b) && r.outputSet.contains(a))
          Some((b, a, k, residual))
        else None
      case _ => None
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan,
      a: Attribute, b: Attribute, k: Int): LogicalPlan = {
    val spark = SparkSession.active
    def colOf(attr: Attribute): Column = GraftSqlShims.column(attr)
    val lDs = GraftSqlShims.ofRows(spark, l)
    val rDs = GraftSqlShims.ofRows(spark, r)

    // distinct string pairs within k edits — segments(left strings)
    // equi-join substrings(right strings), exact rescore; ALL ordered
    // pairs incl. identical strings (lev = 0 ≤ k). NOTE: dedup is an
    // explicit Aggregate, NOT .distinct() — this rule runs AFTER the
    // optimizer's ReplaceDeduplicateWithAggregate batch, so a spliced
    // Deduplicate node would reach the planner unreplaced and throw.
    def dedup(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.groupBy(cols.map(col): _*).agg(max(lit(1)).as("__one"))
        .select(cols.map(col): _*)
    val sa = dedup(lDs.select(colOf(a).as("__sa")).filter(col("__sa").isNotNull), "__sa")
    val sb = dedup(rDs.select(colOf(b).as("__sb")).filter(col("__sb").isNotNull), "__sb")
    val pairs = dedup(FuzzyJoin.candidatePairs(sa, sb, k), "__sa", "__sb")
      .filter(levenshtein(col("__sa"), col("__sb")) <= k)

    // join both inputs back on string equality: one pairs row per
    // matched string pair restores the original multiplicity exactly
    val joined = lDs.join(pairs, colOf(a) === col("__sa"))
      .join(rDs, col("__sb") === colOf(b))
    val analyzed = GraftSqlShims.analyzedPlan(joined)

    // the analyzer may have re-instanced attributes (self-join dedup);
    // select the original l/r output POSITIONS and pin the original
    // exprIds so the parent plan's references keep resolving
    val out = analyzed.output
    val nL = l.output.length
    val lOut = out.take(nL)
    val rOut = out.takeRight(r.output.length)
    val restored = (l.output zip lOut).map { case (orig, cur) =>
      Alias(cur, orig.name)(exprId = orig.exprId)
    } ++ (r.output zip rOut).map { case (orig, cur) =>
      Alias(cur, orig.name)(exprId = orig.exprId)
    }
    val result = Project(restored, analyzed)
    result.foreach {
      case jn: Join => jn.setTagValue(Rewritten, true)
      case _ =>
    }
    result
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner | Cross, Some(cond), _)
        if j.getTagValue(Rewritten).isEmpty =>
      extract(cond, l, r) match {
        case Some((a, b, k, residual)) =>
          val core = rewrite(l, r, a, b, k)
          residual.reduceOption(And).map(Filter(_, core)).getOrElse(core)
        case None => j
      }
    case f @ Filter(cond, j @ Join(l, r, Inner | Cross, None, _))
        if j.getTagValue(Rewritten).isEmpty =>
      extract(cond, l, r) match {
        case Some((a, b, k, residual)) =>
          val core = rewrite(l, r, a, b, k)
          residual.reduceOption(And).map(Filter(_, core)).getOrElse(core)
        case None => f
      }
  }
}
