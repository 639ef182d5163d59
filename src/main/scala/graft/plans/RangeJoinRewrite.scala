package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, TimestampType}

/** Idempotency marker for the range-join rewrite's fallback branches:
  * a non-foldable always-true conjunct. A plain `Literal(true)` would
  * be erased by ConstantFolding/BooleanSimplification — which run in
  * the SAME fixed-point batch as injected optimizer rules — and the
  * rewrite would fire again on its own fallback joins forever. The
  * marker also deliberately REFERENCES one expression from EACH join
  * side: a reference-free conjunct would be pushed out of the join
  * condition by PushDownPredicates (same batch again), un-marking the
  * join — under the production injectOptimizerRule registration that
  * re-fired the rewrite every fixed-point iteration and grew the plan
  * until the driver OOM'd. Referencing both sides pins it inside the
  * join condition; evaluation ignores the children and returns true
  * (one constant per row). */
case class RangeJoinNoRewrite(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode.forNonNullValue(
      org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .literal("true", BooleanType))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

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
  * Fan-out control: a row's bucket count is its interval's day span,
  * so an unbounded span (an SCD-2 sentinel 9999-12-31 validity end)
  * would explode one row into millions. Rows spanning more than
  * spark.graft.rangeJoin.maxDaysPerRow (default 3700) are therefore
  * NOT exploded: they route through a residual non-exploded join
  * branch (the original nested-loop shape, fine because such rows are
  * rare by construction — sentinel/dimension rows), unioned with the
  * bucket join of the capped rows. Pair coverage is a disjoint
  * partition — (okL×okR) via buckets, (bigL×allR) and (okL×bigR)
  * residual — so multiplicity is exact. The residual branches re-scan
  * their inputs with a highly selective span filter; pipelines that
  * would rather fail loudly than pay that set
  * spark.graft.rangeJoin.overflow=error.
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
        val isFallback = conjuncts.exists(_.isInstanceOf[RangeJoinNoRewrite])
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
        if (hasEquality || isFallback || lowerLeft.isEmpty || lowerRight.isEmpty) j
        else {
          val (aStart, bEnd) = lowerLeft.get
          val (bStart, aEnd) = lowerRight.get
          val bl = AttributeReference("__graft_rj_bl", LongType,
            nullable = false)()
          val br = AttributeReference("__graft_rj_br", LongType,
            nullable = false)()
          val maxDays = session.conf
            .get("spark.graft.rangeJoin.maxDaysPerRow", "3700").toLong
          val strictOverflow = session.conf
            .get("spark.graft.rangeJoin.overflow", "union") == "error"
          def loHi(s: Expression, e: Expression): (Expression, Expression) = {
            val (ds, de) = (dayOf(s), dayOf(e))
            (Least(Seq(ds, de)), Greatest(Seq(ds, de)))
          }
          def span(s: Expression, e: Expression): Expression = {
            val (lo, hi) = loHi(s, e); Subtract(hi, lo)
          }
          // span comparisons are null for null intervals, so BOTH the
          // ok- and big-filters drop such rows — sound, because a null
          // bound can never satisfy the overlap condition either way
          def spanOk(s: Expression, e: Expression): Expression =
            LessThanOrEqual(span(s, e), Literal(maxDays))
          def spanBig(s: Expression, e: Expression): Expression =
            GreaterThan(span(s, e), Literal(maxDays))
          def buckets(s: Expression, e: Expression): Expression = {
            val (lo, hi) = loHi(s, e)
            // Sequence is TimeZoneAware: without a zone it reads as
            // unresolved and fails optimizer plan validation
            val seq = Sequence(lo, hi, Some(Literal(1L)),
              Some(session.sessionState.conf.sessionLocalTimeZone))
            if (!strictOverflow) seq
            else If(GreaterThan(Subtract(hi, lo), Literal(maxDays)),
              Cast(RaiseError(Literal(
                s"range-join rewrite: interval spans more than $maxDays " +
                  "days per row; raise spark.graft.rangeJoin.maxDaysPerRow, " +
                  "set spark.graft.rangeJoin.overflow=union, " +
                  "or disable spark.graft.rangeJoin.enabled")), seq.dataType),
              seq)
          }
          def gen(child: LogicalPlan, s: Expression, e: Expression,
              out: AttributeReference): LogicalPlan =
            Generate(Explode(buckets(s, e)), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(out), child = child)
          val canonical = EqualTo(bl,
            Greatest(Seq(dayOf(aStart), dayOf(bStart))))
          val newCond = And(And(EqualTo(bl, br), canonical), cond)
          if (strictOverflow) {
            // legacy strict mode: every row explodes (the guard inside
            // buckets() raises on overflow), single-branch plan
            Project(j.output,
              Join(gen(left, aStart, aEnd, bl), gen(right, bStart, bEnd, br),
                Inner, Some(newCond), hint))
          } else {
            val bucketJoin = Project(j.output,
              Join(gen(Filter(spanOk(aStart, aEnd), left), aStart, aEnd, bl),
                gen(Filter(spanOk(bStart, bEnd), right), bStart, bEnd, br),
                Inner, Some(newCond), hint))
            val residualCond = And(RangeJoinNoRewrite(aStart, bStart), cond)
            // bigL joins ALL of right; okL joins bigR — together with
            // okL×okR above this partitions the pair space exactly once
            val bigLeft = Project(j.output,
              Join(Filter(spanBig(aStart, aEnd), left), right,
                Inner, Some(residualCond), hint))
            val bigRight = Project(j.output,
              Join(Filter(spanOk(aStart, aEnd), left),
                Filter(spanBig(bStart, bEnd), right),
                Inner, Some(residualCond), hint))
            Union(Seq(bucketJoin, bigLeft, bigRight))
          }
        }
    }
  }
}
