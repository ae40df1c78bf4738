package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a band/range theta-join
  * `A JOIN B ON abs(a - b) <= c` (no equi conjuncts — Spark would plan a
  * BroadcastNestedLoopJoin or cartesian product, O(|A|x|B|)) into the
  * bucketed equi-join: bucket each side by `floorDiv(value, c)`, explode
  * the probe side into buckets {b-1, b, b+1}, and join on bucket
  * equality with the original predicate kept as the exact filter. A
  * bucket-difference of <= 1 is necessary for |a-b| <= c, and every
  * qualifying pair matches exactly one probe value, so the rewrite is an
  * exact equivalence with no dedup step. Candidate volume drops from
  * O(n^2) to O(n x neighbors-per-2c-window), and the join becomes a
  * plain shuffled hash join that survives any scale.
  *
  * This automates what [[graft.operators.Events.rangeJoinPairs]] spells
  * out by hand — users write the natural theta-join and get the scaled
  * plan (e07_range_join_auto is the oracle-checked proof). Registered
  * via [[graft.GraftExtensions]] (injectOptimizerRule); runs inside the
  * fixed-point operator-optimization batch and is idempotent because the
  * rewritten join HAS an equi conjunct, which the matcher rejects.
  *
  * Conservative scope: inner joins, a single abs(x - y) <= literal
  * conjunct with integer-typed operands (one referencing each side), a
  * positive literal, and no pre-existing equi conjunct.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private val BucketCol = "__graft_range_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasEquiConjunct(cond, left, right) =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.iterator.flatMap(matchBand(_, left, right))
        .nextOption() match {
        case Some((lExpr, rExpr, width)) =>
          val lBucket = Alias(floorDiv(lExpr, width), BucketCol)()
          val newLeft = Project(left.output :+ lBucket, left)
          val rBase = floorDiv(rExpr, width)
          val probes = CreateArray(Seq(
            Subtract(rBase, Literal(1L)), rBase, Add(rBase, Literal(1L))))
          val gen = Explode(probes)
          val genOut = AttributeReference(BucketCol,
            gen.elementSchema.head.dataType,
            gen.elementSchema.head.nullable)()
          val newRight = Generate(gen, unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = right)
          val newCond = And(EqualTo(lBucket.toAttribute, genOut), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** True if any conjunct is `leftSide = rightSide` — Spark can already
    * plan those as hash joins, and the rewrite must not re-fire on its
    * own output. */
  private def hasEquiConjunct(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a, b) => sidesSplit(a, b, left, right).isDefined
      case EqualNullSafe(a, b) => sidesSplit(a, b, left, right).isDefined
      case _ => false
    }

  /** Orient (a, b) as (references-left, references-right) if they split
    * cleanly across the join. */
  private def sidesSplit(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression)] = {
    def refs(e: Expression, p: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    if (refs(a, left) && refs(b, right)) Some((a, b))
    else if (refs(b, left) && refs(a, right)) Some((b, a))
    else None
  }

  /** Match `abs(x - y) <= c` (or `c >= abs(x - y)`) with x, y splitting
    * across the join, integral types, deterministic, c a positive
    * integral literal. Returns (leftExpr, rightExpr, width). */
  private def matchBand(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def integral(e: Expression) =
      e.dataType == LongType || e.dataType == IntegerType
    def fromAbs(x: Expression, y: Expression, lim: Expression) = lim match {
      case Literal(v, t) if (t == LongType || t == IntegerType) &&
          v.asInstanceOf[Number].longValue() > 0 &&
          integral(x) && integral(y) &&
          x.deterministic && y.deterministic =>
        sidesSplit(x, y, left, right)
          .map { case (l, r) => (l, r, v.asInstanceOf[Number].longValue()) }
      case _ => None
    }
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lim) =>
        fromAbs(x, y, lim)
      case GreaterThanOrEqual(lim, Abs(Subtract(x, y, _), _)) =>
        fromAbs(x, y, lim)
      case _ => None
    }
  }

  /** Exact floor division for a positive literal divisor (IntegralDivide
    * truncates toward zero, which disagrees with floor for negative
    * dividends — e.g. pre-1970 timestamps). */
  private def floorDiv(x: Expression, c: Long): Expression = {
    val xL = if (x.dataType == LongType) x else Cast(x, LongType)
    val cL = Literal(c)
    val div = IntegralDivide(xL, cL)
    val rem = Remainder(xL, cL)
    If(And(LessThan(xL, Literal(0L)),
        Not(EqualTo(rem, Literal(0L)))),
      Subtract(div, Literal(1L)), div)
  }
}
