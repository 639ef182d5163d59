package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Automatic range-join rewrite (the Catalyst rule form of the
  * ev_interval_join pattern): an inner join whose condition is a pure
  * interval overlap —
  *
  *   a.start <= b.end AND b.start <= a.end
  *
  * — plans as a BroadcastNestedLoopJoin/cartesian in stock Spark, a
  * scale-killer at any real row count. This rule rewrites it into the
  * bounded-fan-out bucket form: both sides explode into the DAY
  * BUCKETS their interval touches, the join runs as a hash equi-join
  * on the bucket key (with the original predicate kept as an exact
  * filter), and each qualifying pair is emitted EXACTLY once by
  * pinning it to its canonical bucket — max(day(a.start),
  * day(b.start)), which provably lies in both sides' bucket ranges —
  * so no dedup pass is needed and duplicate input rows keep their
  * multiplicity.
  *
  * Fires only on timestamp-typed pure range conditions (any equality
  * conjunct means the join already has a hash key — and makes the
  * rewrite idempotent, since the rewritten join gains one).
  * Session-gated via spark.graft.rangeJoin.enabled (default true when
  * the extensions are installed); bucket width is one day — matched
  * to intervals of minutes-to-days, the telemetry/session case.
  * Registered through GraftExtensions (injectOptimizerRule).
  */
case class RangeJoinRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.rangeJoin.enabled", "true") == "true"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def dayOf(ts: Expression): Expression =
    IntegralDivide(Cast(ts, LongType), Literal(86400L))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && cond.deterministic =>
        val conjuncts = splitConjuncts(cond)
        val hasEquality = conjuncts.exists {
          case EqualTo(_, _) | EqualNullSafe(_, _) => true
          case _ => false
        }
        def sideOf(e: Expression): Option[Boolean] = {
          val refs = e.references
          if (refs.isEmpty) None
          else if (refs.subsetOf(left.outputSet)) Some(true)
          else if (refs.subsetOf(right.outputSet)) Some(false)
          else None
        }
        // X: leftExpr <=/< rightExpr gives (a.start, b.end);
        // Y: rightExpr <=/< leftExpr gives (b.start, a.end).
        // Strict bounds are fine: the bucket-coverage proof only needs
        // the NON-strict consequence of each conjunct, and the exact
        // original predicate rides along as the final filter.
        object Lower {
          def unapply(e: Expression): Option[(Expression, Expression)] = e match {
            case LessThanOrEqual(a, b) => Some((a, b))
            case LessThan(a, b) => Some((a, b))
            case GreaterThanOrEqual(a, b) => Some((b, a))
            case GreaterThan(a, b) => Some((b, a))
            case _ => None
          }
        }
        val lowerLeft = conjuncts.collectFirst {
          case Lower(e1, e2)
              if e1.dataType == TimestampType && e2.dataType == TimestampType &&
                sideOf(e1).contains(true) && sideOf(e2).contains(false) =>
            (e1, e2)
        }
        val lowerRight = conjuncts.collectFirst {
          case Lower(e1, e2)
              if e1.dataType == TimestampType && e2.dataType == TimestampType &&
                sideOf(e1).contains(false) && sideOf(e2).contains(true) =>
            (e1, e2)
        }
        if (hasEquality || lowerLeft.isEmpty || lowerRight.isEmpty) j
        else {
          val (aStart, bEnd) = lowerLeft.get
          val (bStart, aEnd) = lowerRight.get
          val bl = AttributeReference("__graft_rj_bl", LongType,
            nullable = false)()
          val br = AttributeReference("__graft_rj_br", LongType,
            nullable = false)()
          // Fan-out guard: a row's bucket count is its interval's day
          // span. An unbounded span (a 10-year validity window) would
          // silently explode a 1M-row side into billions of rows —
          // fail LOUDLY at that row instead, with the cap and the
          // opt-out named, rather than degrade into an OOM.
          val maxDays = session.conf
            .get("spark.graft.rangeJoin.maxDaysPerRow", "3700").toLong
          def buckets(s: Expression, e: Expression): Expression = {
            val (ds, de) = (dayOf(s), dayOf(e))
            val lo = Least(Seq(ds, de))
            val hi = Greatest(Seq(ds, de))
            // Sequence is TimeZoneAware: without a zone it reads as
            // unresolved and fails optimizer plan validation
            val seq = Sequence(lo, hi, Some(Literal(1L)),
              Some(session.sessionState.conf.sessionLocalTimeZone))
            If(GreaterThan(Subtract(hi, lo), Literal(maxDays)),
              Cast(RaiseError(Literal(
                s"range-join rewrite: interval spans more than $maxDays " +
                  "days per row; raise spark.graft.rangeJoin.maxDaysPerRow " +
                  "or disable spark.graft.rangeJoin.enabled")), seq.dataType),
              seq)
          }
          val genL = Generate(Explode(buckets(aStart, aEnd)), Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bl),
            child = left)
          val genR = Generate(Explode(buckets(bStart, bEnd)), Nil,
            outer = false, qualifier = None, generatorOutput = Seq(br),
            child = right)
          val canonical = EqualTo(bl,
            Greatest(Seq(dayOf(aStart), dayOf(bStart))))
          val newCond = And(And(EqualTo(bl, br), canonical), cond)
          Project(j.output,
            Join(genL, genR, Inner, Some(newCond), hint))
        }
    }
  }
}
