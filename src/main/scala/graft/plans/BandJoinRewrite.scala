package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a 1-D *band theta-join* — the temporal/numeric
  * sibling of [[SpatialJoinRewrite]] (SURVEY.md §2.4 J1 in one dimension).
  *
  * A user writing the natural form —
  * {{{
  *   purchases.crossJoin(clicks)
  *     .filter(abs(p_us - c_us) <= lit(60_000_000L))   // within a minute
  * }}}
  * — gets an O(n·m) CartesianProduct / BroadcastNestedLoop plan. This rule
  * rebuilds it as a binned equi-join:
  *
  *  - the LARGER side (by plan statistics) gets ONE bin `⌊x/2c⌋` — never
  *    replicated;
  *  - the smaller side explodes to its bin ±1 (|x−y| ≤ c ⟹ the real bin
  *    distance is ≤ ½, so the floor-bins differ by at most one — a proven
  *    over-cover). Bin width 2c, not c, for overflow-freedom: ⌊x/2c⌋ is
  *    within ±2⁶²/c of zero for ANY Long input, so the ±1 neighbor can
  *    never overflow — with width-c bins, c = 1 and x = Long.MaxValue
  *    would make `bin + 1` an ANSI ARITHMETIC_OVERFLOW in a query the
  *    un-rewritten plan runs fine;
  *  - the sides meet in an equi-join on the bin and the ORIGINAL predicate
  *    is re-applied above it, so the rewrite can only be wrong by missing
  *    pairs, which the ±1 fan-out rules out — never by admitting false
  *    ones.
  *
  * Applies to INTEGRAL operands and a positive integral threshold (the
  * realistic band keys: unix_micros timestamps, sequence numbers, integer
  * positions) — bins are computed with exact Long floor-division, so there
  * is no floating-point edge where two in-band rows could land more than
  * one bin apart. Fractional thresholds/operands are left to run as
  * written.
  *
  * Known limitation (shared with any static rule): the value RANGE is not
  * knowable at plan time, so a threshold wide relative to the data
  * collapses the keyspace to a few bins — the shuffled equi-join then
  * leans on AQE's skew-join handling (on by default) the way any
  * low-cardinality key join does; correctness is unaffected (the original
  * predicate is re-applied). The spatial sibling can decline past 60°
  * because its domain is bounded; an unbounded Long domain has no such
  * line to draw.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  /** Bin-helper column prefix; also the idempotence marker (see
    * [[SpatialJoinRewrite.Tag]]). */
  private val Tag = "__band_"

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) &&
          !cond.references.exists(_.name.startsWith(Tag)) =>
      rewrite(left, right, splitConjunctivePredicates(cond), hint, j.output)
        .getOrElse(j)
    case f @ Filter(cond, Join(left, right, jt, None, hint))
        if jt == Inner || jt == Cross =>
      rewrite(left, right, splitConjunctivePredicates(cond), hint, f.output)
        .getOrElse(f)
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, ByteType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** An inter-side equality conjunct means the join already carries a real
    * equi-key (e.g. a keyed interval join written with abs()): Spark plans
    * it as a hash/sort-merge join on that key, and the x3 explode + bin
    * shuffle of this rewrite would only regress it. Correctness would be
    * preserved either way (every conjunct is re-applied), so this is purely
    * a cost decision: decline. */
  private def hasInterSideEquiKey(left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression]): Boolean =
    conjuncts.exists {
      case Equality(x, y) =>
        x.references.nonEmpty && y.references.nonEmpty &&
          ((x.references.subsetOf(left.outputSet) &&
            y.references.subsetOf(right.outputSet)) ||
            (y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet)))
      case _ => false
    }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression], hint: JoinHint,
      out: Seq[Attribute]): Option[LogicalPlan] = {
    if (hasInterSideEquiKey(left, right, conjuncts)) return None
    val hit = conjuncts.collectFirst {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), lc)
          if litLong(lc).isDefined => (a, b, litLong(lc).get)
      case LessThan(Abs(Subtract(a, b, _), _), lc)
          if litLong(lc).isDefined => (a, b, litLong(lc).get)
      case GreaterThanOrEqual(lc, Abs(Subtract(a, b, _), _))
          if litLong(lc).isDefined => (a, b, litLong(lc).get)
      case GreaterThan(lc, Abs(Subtract(a, b, _), _))
          if litLong(lc).isDefined => (a, b, litLong(lc).get)
    }
    hit.flatMap { case (a, b, c) =>
      // c upper bound: binW = 2c must not overflow (absurd thresholds
      // select everything anyway — let the join run as written)
      if (c < 1 || c > Long.MaxValue / 2 - 1 || !integral(a) || !integral(b) ||
        !a.deterministic || !b.deterministic) None
      else {
        // one operand per side, either orientation
        val sides: Option[(Expression, Expression)] =
          if (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) Some((a, b))
          else if (b.references.subsetOf(left.outputSet) &&
            a.references.subsetOf(right.outputSet)) Some((b, a))
          else None
        sides.map { case (exprL, exprR) =>
          // Exact Long floor-division by 2c (see the class doc for why the
          // doubled width): IntegralDivide truncates toward zero, so shift
          // negative non-multiples down one bin.
          val binW = 2 * c
          def bin(e0: Expression): Expression = {
            val e = Cast(e0, LongType)
            val q = IntegralDivide(e, Literal(binW))
            val r = Remainder(e, Literal(binW))
            If(And(LessThan(e, Literal(0L)), Not(EqualTo(r, Literal(0L)))),
              Subtract(q, Literal(1L)), q)
          }
          // explode the smaller side ×3; the larger side is never replicated
          val explodeLeft = left.stats.sizeInBytes < right.stats.sizeInBytes
          val (ptPlan, ptExpr, exPlan, exExpr) =
            if (explodeLeft) (right, exprR, left, exprL)
            else (left, exprL, right, exprR)

          val bP = Alias(bin(ptExpr), s"${Tag}b")()
          val pProj = Project(ptPlan.output :+ bP, ptPlan)

          val kAttr = AttributeReference(s"${Tag}k", IntegerType, nullable = false)()
          val gen = Generate(
            Explode(Literal.create(Seq(-1, 0, 1),
              ArrayType(IntegerType, containsNull = false))),
            Nil, outer = false, None, Seq(kAttr), exPlan)
          val bE = Alias(Add(bin(exExpr), Cast(kAttr, LongType)), s"${Tag}gb")()
          val eProj = Project(exPlan.output :+ bE, gen)

          val joinCond = EqualTo(bP.toAttribute, bE.toAttribute)
          val (nl, nr) = if (explodeLeft) (eProj, pProj) else (pProj, eProj)
          val joined = Join(nl, nr, Inner, Some(joinCond), hint)
          // every original conjunct — including the band predicate —
          // re-applied above the equi-join
          Project(out, Filter(conjuncts.reduce(And), joined))
        }
      }
    }
  }

  /** Register on an existing session (see [[SpatialJoinRewrite.ensure]]).
    * Idempotent. */
  def ensure(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(BandJoinRewrite)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ BandJoinRewrite
    }
}
