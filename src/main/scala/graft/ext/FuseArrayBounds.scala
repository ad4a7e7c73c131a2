package graft.ext

import graft.compile.ArrayBoundsCheck
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite `forall(arr, x -> <integral bounds on x>)` into
  * the fused single-pass [[ArrayBoundsCheck]] codegen expression.
  *
  * Spark's higher-order functions evaluate their lambda interpreted, per
  * element, with boxing — at 10^12 rows the bounds check becomes the
  * dominant allocation site. The fused expression runs the same
  * three-valued `forall` semantics (out-of-bounds → false; else NULL if
  * any element NULL; NULL array → NULL) inside whole-stage codegen with
  * zero allocation. Injected via `spark.sql.extensions`
  * ([[GraftExtensions]]) or `spark.experimental.extraOptimizations`.
  *
  * Only fires when the rewrite is semantics-preserving: integral element
  * type, the lambda body a conjunction of comparisons between the lambda
  * variable (possibly widened by an implicit cast) and foldable integral
  * literals, at most one lower and one upper bound.
  */
object FuseArrayBounds extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case f @ ArrayForAll(arg, LambdaFunction(body, Seq(v: NamedLambdaVariable), _))
          if integralArray(arg.dataType) =>
        extractBounds(body, v) match {
          case Some((lo, hi, loEx, hiEx)) =>
            ArrayBoundsCheck(arg, lo, hi, loEx, hiEx,
              failOnNull = false, forallSemantics = true)
          case None => f
        }
    }

  private def integralArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType | LongType | ShortType | ByteType, _) => true
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def width(dt: DataType): Int = dt match {
    case ByteType => 1; case ShortType => 2; case IntegerType => 4
    case LongType => 8; case _ => 99
  }

  /** The lambda variable, allowing an implicit WIDENING cast around it
    * (int element compared to a long literal). Widening preserves the
    * comparison, so the fused long-space compare is exact; a narrowing
    * cast (user-written) would overflow-wrap and must not fuse. */
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case Cast(inner, LongType | IntegerType | ShortType, _, _)
        if width(inner.dataType) <= width(e.dataType) => isVar(inner, v)
    case _ => false
  }

  /** Evaluate a foldable integral operand — the post-cast value is what
    * the original comparison used, so folding the whole expression is
    * exact where peeking through casts would not be. */
  private def intLit(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.dataType match {
      case IntegerType | LongType | ShortType | ByteType =>
        Option(e.eval()).map {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
          case s: java.lang.Short => s.longValue()
          case b: java.lang.Byte => b.longValue()
        }
      case _ => None
    }

  /** (lo, hi, loExclusive, hiExclusive) when the whole body is bounds. */
  private def extractBounds(body: Expression, v: NamedLambdaVariable)
      : Option[(Option[Long], Option[Long], Boolean, Boolean)] = {
    var lo: Option[(Long, Boolean)] = None
    var hi: Option[(Long, Boolean)] = None
    def setLo(x: Long, ex: Boolean): Boolean =
      if (lo.isEmpty) { lo = Some((x, ex)); true } else false
    def setHi(x: Long, ex: Boolean): Boolean =
      if (hi.isEmpty) { hi = Some((x, ex)); true } else false

    val ok = conjuncts(body).forall {
      case GreaterThanOrEqual(l, r) if isVar(l, v) && intLit(r).isDefined =>
        setLo(intLit(r).get, ex = false)
      case GreaterThan(l, r) if isVar(l, v) && intLit(r).isDefined =>
        setLo(intLit(r).get, ex = true)
      case LessThanOrEqual(l, r) if isVar(l, v) && intLit(r).isDefined =>
        setHi(intLit(r).get, ex = false)
      case LessThan(l, r) if isVar(l, v) && intLit(r).isDefined =>
        setHi(intLit(r).get, ex = true)
      // literal-on-the-left variants
      case GreaterThanOrEqual(l, r) if isVar(r, v) && intLit(l).isDefined =>
        setHi(intLit(l).get, ex = false)
      case GreaterThan(l, r) if isVar(r, v) && intLit(l).isDefined =>
        setHi(intLit(l).get, ex = true)
      case LessThanOrEqual(l, r) if isVar(r, v) && intLit(l).isDefined =>
        setLo(intLit(l).get, ex = false)
      case LessThan(l, r) if isVar(r, v) && intLit(l).isDefined =>
        setLo(intLit(l).get, ex = true)
      case _ => false
    }
    if (ok && (lo.isDefined || hi.isDefined))
      Some((lo.map(_._1), hi.map(_._1),
        lo.exists(_._2), hi.exists(_._2)))
    else None
  }
}
