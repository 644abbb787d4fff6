package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/**
 * Optimizer rule: rewrite a big-big point-in-interval theta join into a binned
 * equi join — the plan-level twin of `Relational.rangeJoinBinned`, applied
 * AUTOMATICALLY to any qualifying inner join (DataFrame or SQL) so users who
 * write the natural `ON p BETWEEN lo AND hi` get the linear plan instead of a
 * BroadcastNestedLoopJoin.
 *
 * Opt-in via `spark.graft.rangeJoin.binWidth` (a positive double; unset = rule
 * dormant), mirroring the hint-driven activation of the same optimization in
 * commercial Spark runtimes: bin width is a semantic tuning choice (≈ the p95
 * interval length) that only the user can make, so the engine never guesses.
 *
 * A join qualifies when its condition splits into conjuncts containing a lower
 * and an upper bound (`>=`/`>` and `<`/`<=`, either operand order) on the SAME
 * deterministic numeric point expression from one side, with both bound
 * expressions from the other side — and NO equi conjunct (an equi-keyed join
 * already hash-partitions; the interval predicate rides along as a residual
 * and the rewrite would only add explode cost).
 *
 * The rewrite binds each point to `floor(p / w)`, explodes each interval row
 * to `sequence(floor(lo / w), floor(hi / w))` (empty/NULL intervals are
 * pre-filtered — `sequence` would count DOWN for lo > hi), joins on bin
 * equality, and keeps the ORIGINAL condition verbatim as the residual — the
 * rewrite can only be exact: bins over-approximate, the residual decides.
 * Exactly-once pairing holds because a point's bin is unique. After the
 * rewrite the join carries an equi conjunct, so the rule skips it on the next
 * fixpoint pass (idempotent by construction).
 *
 * Bounds: values must stay within 2^53 (double-exact longs) for the binning
 * division to be exact — unix micros (~9e15 max) and money-in-cents scales
 * qualify. Width must keep `(hi-lo)/w` under Spark's sequence length cap.
 */
case class BinRangeJoinRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"
  // Warn ONCE per distinct malformed value: the rule runs inside a
  // fixed-point optimizer batch (up to maxIterations times per query, every
  // query), and re-warning each invocation would drown the one actionable
  // line in hundreds of duplicates.
  @volatile private var warnedFor: String = _

  override def apply(plan: LogicalPlan): LogicalPlan =
    // A malformed width must leave the rule dormant (with a warning), not
    // throw from the optimizer into every query in the session.
    session.conf.getOption(WidthKey).flatMap { v =>
      val d = v.toDoubleOption
      if (d.isEmpty && v != warnedFor) {
        warnedFor = v
        logWarning(s"$WidthKey='$v' is not a number — bin-range rewrite disabled")
      }
      d
    }.filter(_ > 0) match {
      case None => plan
      case Some(w) => plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), _) =>
          rewrite(j, left, right, cond, w).getOrElse(j)
      }
    }

  /** 0 = no references, 1 = left-only, 2 = right-only, 3 = mixed. */
  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Int = {
    val refs = e.references
    if (refs.isEmpty) 0
    else if (refs.subsetOf(left.outputSet)) 1
    else if (refs.subsetOf(right.outputSet)) 2
    else 3
  }

  private case class Bound(point: Expression, bound: Expression, lower: Boolean,
                           pointSide: Int)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    val hasEqui = conjuncts.exists {
      case Equality(a, b) =>
        val (sa, sb) = (sideOf(a, left, right), sideOf(b, left, right))
        (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
      case _ => false
    }
    if (hasEqui) return None

    // x cmp y with x and y from opposite sides reads as a bound in BOTH
    // directions: x >= y bounds x below by y AND y above by x.
    def oneSided(x: Expression, y: Expression, xLower: Boolean): Seq[Bound] = {
      val (sx, sy) = (sideOf(x, left, right), sideOf(y, left, right))
      if ((sx == 1 && sy == 2) || (sx == 2 && sy == 1))
        Seq(Bound(x, y, xLower, sx), Bound(y, x, !xLower, sy))
      else Nil
    }
    val cands = conjuncts.flatMap {
      case GreaterThanOrEqual(x, y) => oneSided(x, y, xLower = true)
      case GreaterThan(x, y)        => oneSided(x, y, xLower = true)
      case LessThanOrEqual(x, y)    => oneSided(x, y, xLower = false)
      case LessThan(x, y)           => oneSided(x, y, xLower = false)
      case _ => Nil
    }.filter(b => b.point.dataType.isInstanceOf[NumericType] &&
      b.bound.dataType.isInstanceOf[NumericType] &&
      b.point.deterministic && b.bound.deterministic)

    val pair = (for {
      lo <- cands if lo.lower
      hi <- cands if !hi.lower
      if hi.point.semanticEquals(lo.point) && hi.pointSide == lo.pointSide
    } yield (lo, hi)).headOption

    pair.map { case (lo, hi) =>
      // Non-finite values have no bin: Spark's total double order puts NaN
      // above everything, so `p <= NaN` is TRUE and an interval with a NaN
      // (or +Inf) upper bound matches unboundedly many bins — un-enumerable.
      // Silently flooring them (NaN -> 0, Inf -> overflow/sequence blow-up)
      // would DROP matches the original theta join returned, or crash deep
      // in sequence(). Rows carrying such values raise a CLEAR error naming
      // the conf instead: the opt-in rewrite refuses loudly rather than
      // answer wrong. Only floating-typed inputs pay the check; integral
      // bins stay unguarded (non-finite is unrepresentable there).
      def bin(e: Expression): Expression = {
        val d = Cast(e, DoubleType)
        val floored = Floor(Divide(d, Literal(w)))
        e.dataType match {
          case DoubleType | org.apache.spark.sql.types.FloatType =>
            If(Or(IsNaN(d), EqualTo(Abs(d), Literal(Double.PositiveInfinity))),
              Cast(RaiseError(Literal(
                "bin-range rewrite: non-finite point/bound value in the " +
                  s"range-join columns — unset $WidthKey for queries whose " +
                  "join columns can hold NaN/Infinity")), LongType),
              floored)
          case _ => floored
        }
      }

      val (pointChild, intervalChild) =
        if (lo.pointSide == 1) (left, right) else (right, left)

      val pBin = Alias(bin(lo.point), "__graft_bin_p")()
      val pointPlan = Project(pointChild.output :+ pBin, pointChild)

      // lo > hi would make sequence() count DOWN and fabricate bins; such
      // rows can never satisfy the residual, so dropping them is exact.
      val ivValid = Filter(
        LessThanOrEqual(Cast(lo.bound, DoubleType), Cast(hi.bound, DoubleType)),
        intervalChild)
      val iBin = AttributeReference("__graft_bin_i", LongType, nullable = false)()
      // Sequence is TimeZoneAware — an undefined zone leaves the plan
      // unresolved and fails optimizer plan validation.
      val seq = new Sequence(bin(lo.bound), bin(hi.bound), None)
        .withTimeZone(session.sessionState.conf.sessionLocalTimeZone)
      val ivPlan = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), child = ivValid)

      val newCond = And(EqualTo(pBin.toAttribute, iBin), cond)
      val rejoined =
        if (lo.pointSide == 1) Join(pointPlan, ivPlan, Inner, Some(newCond), j.hint)
        else Join(ivPlan, pointPlan, Inner, Some(newCond), j.hint)
      Project(j.output, rejoined)
    }
  }
}
