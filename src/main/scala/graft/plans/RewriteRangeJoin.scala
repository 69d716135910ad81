package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, Cast, EqualTo, Explode, Expression,
  GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan,
  LessThanOrEqual, Literal, Multiply, PredicateHelper, Sequence,
  Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Rewrites a naive range-containment join into the bin-decomposed
  * form [[graft.operators.IntervalJoin]] implements by hand — so plain
  * SQL
  *
  *   `FROM p JOIN i ON p.key = i.key AND p.ts >= i.s AND p.ts < i.e`
  *
  * stops planning as the per-key-quadratic equi-join-with-residual
  * (or, with no equi key at all, a BroadcastNestedLoopJoin — the scan
  * product that cannot finish at corpus scale) and becomes: intervals
  * replicated to the bins they touch (`explode(sequence(bin(s),
  * bin(e)))`), points tagged with their one bin, an ordinary shuffled
  * equi-join on the bin (plus any original equi keys), and the
  * ORIGINAL predicate kept as the residual. Catalyst has no
  * range-join planning of its own; this is the optimizer-rule form of
  * the published bucketed range join (Databricks' range-join hint,
  * 1-D spatial partitioning).
  *
  * Correctness: the bin equi-join is a strict SUPERSET of the
  * original join (bin() is monotone, so `s ≤ pt ≤ e` implies
  * `bin(s) ≤ bin(pt) ≤ bin(e)`), every original conjunct is
  * re-applied as the residual, and multiplicity is preserved because
  * a point row carries exactly ONE bin and `sequence` emits distinct
  * bins — each qualifying pair meets exactly once. Interval rows with
  * `e < s` (impossible window) or a null bound are dropped
  * pre-replication; an inner join discards them under the original
  * plan too (the comparison is false or null). Bins floor-divide the
  * LONG-cast operand exactly ([[graft.operators.AsofJoin]]'s
  * IntegralDivide rationale — double division drifts past 2^53).
  *
  * OPT-IN, like the Databricks hint: fires only when
  * `spark.graft.rangeJoin.binWidth` is set positive (in the units of
  * the LONG-cast operand — epoch seconds for timestamps). The width
  * trades replication (≤ maxWindow/width + 1 copies of each interval
  * row) against bin selectivity; correctness never depends on it.
  * Fires on inner joins whose condition contains a lower AND an upper
  * bound on one same-side point expression, both bounds from the
  * other side, over integral/timestamp types; the injected
  * `__graft_bin*` attributes mark a rewritten join so the fixed-point
  * re-visit is a no-op.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BIN_WIDTH_KEY = "spark.graft.rangeJoin.binWidth"

  /** point `pt` on `ptLeft` side, `bound` from the other side */
  private case class Bound(pt: Expression, bound: Expression,
      ptLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BIN_WIDTH_KEY, "0").toLong
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _)
          if !cond.references.exists(_.name.startsWith("__graft_bin")) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def supported(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | TimestampType => true
    case _ => false
  }

  /** Exact floor(t / w) over the LONG cast, as a Catalyst tree. */
  private def bin(t: Expression, w: Long): Expression = {
    val tl = Cast(t, LongType, Some(conf.sessionLocalTimeZone))
    val q0 = new IntegralDivide(tl, Literal(w))
    val r = Subtract(tl, Multiply(q0, Literal(w)))
    Subtract(q0,
      If(LessThan(r, Literal(0L)), Literal(1L), Literal(0L)))
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    def mk(pt: Expression, bound: Expression): Option[Bound] =
      (sideOf(pt), sideOf(bound)) match {
        case (Some(pl), Some(bl))
            if pl != bl && supported(pt) && supported(bound) =>
          Some(Bound(pt, bound, pl))
        case _ => None
      }
    // each comparison reads two ways; collect both (a >= b is a lower
    // bound on a AND an upper bound on b)
    def lowers(c: Expression): Seq[Bound] = (c match {
      case GreaterThanOrEqual(a, b) => mk(a, b)
      case GreaterThan(a, b) => mk(a, b)
      case LessThanOrEqual(b, a) => mk(a, b)
      case LessThan(b, a) => mk(a, b)
      case _ => None
    }).toSeq
    def uppers(c: Expression): Seq[Bound] = (c match {
      case LessThanOrEqual(a, b) => mk(a, b)
      case LessThan(a, b) => mk(a, b)
      case GreaterThanOrEqual(b, a) => mk(a, b)
      case GreaterThan(b, a) => mk(a, b)
      case _ => None
    }).toSeq

    val lows = conjuncts.zipWithIndex.flatMap { case (c, i) =>
      lowers(c).map((_, i)) }
    val ups = conjuncts.zipWithIndex.flatMap { case (c, i) =>
      uppers(c).map((_, i)) }
    val pair = (for {
      (lo, li) <- lows
      (up, ui) <- ups
      if li != ui && lo.ptLeft == up.ptLeft &&
        lo.pt.semanticEquals(up.pt)
    } yield (lo, up)).headOption

    pair.map { case (lo, up) =>
      val (points, intervals) =
        if (lo.ptLeft) (j.left, j.right) else (j.right, j.left)
      val binp = Alias(bin(lo.pt, w), "__graft_binp")()
      val taggedPoints = Project(points.output :+ binp, points)
      // e < s (or a null bound) cannot match under the original inner
      // join; dropping pre-replication also keeps `sequence` ascending
      val live = Filter(
        LessThanOrEqual(lo.bound, up.bound), intervals)
      val seq = Sequence(bin(lo.bound, w), bin(up.bound, w),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
      val bing = AttributeReference("__graft_bing", LongType,
        nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(bing), child = live)
      val newCond = (conjuncts :+
        EqualTo(binp.toAttribute, bing)).reduce(And)
      val newJoin =
        if (lo.ptLeft) Join(taggedPoints, gen, Inner, Some(newCond), j.hint)
        else Join(gen, taggedPoints, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
