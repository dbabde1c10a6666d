package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

import graft.functions.HaversineArgExpr

/** Optimizer rule: rewrite a *distance theta-join* into the binned
  * equi-join the engine uses internally (SURVEY.md §2.4 J1, §7.1).
  *
  * A user writing the natural form —
  * {{{
  *   grid.crossJoin(profiles)
  *       .filter(HaversineArgExpr.havArg($"clon",$"clat",$"lon",$"lat") < lit(c))
  * }}}
  * — gets an O(cells × profiles) CartesianProduct / BroadcastNestedLoop
  * plan: at 3M profiles × a 1/4° grid that is ~10¹² pair evaluations. The
  * reference solves this with hand-rolled tiles and halos
  * (/root/reference/src/argostats/atlas.py:327-338,497-514); this rule
  * solves it where a Spark-native engine should — in Catalyst:
  *
  *  - the LARGER side (by plan statistics) gets ONE spatial bin of width
  *    `radius/4` degrees — it is never replicated (bins a FRACTION of the
  *    radius for the same reason as Atlas.pairs: radius-wide bins collapse
  *    the join key space at large radii);
  *  - the smaller side explodes to the ±4 neighboring latitude bins and,
  *    per row, to the longitude bins within the radius at its latitude
  *    (±⌈Δλmax/binW⌉+1 where Δλmax = 2·asin(sin(r/2)/cos φ), the exact
  *    in-radius bound — when |lat|+r reaches the pole this saturates to
  *    the full ring, so high-latitude rows are never under-covered;
  *    longitude bins wrap at ±180° via pmod);
  *  - the two sides meet in an equi-join on the bin pair, and the ORIGINAL
  *    predicate is re-applied after it — the rewrite can only ever be
  *    wrong by *missing* pairs, and the fan-out bounds above are proven
  *    over-covers, never by admitting false ones.
  *
  * The equi-join unlocks everything Catalyst knows: broadcast vs shuffle
  * by size, AQE skew splitting, partial aggregation above it. Correctness
  * contract: rewrite only Inner/Cross joins whose condition (or a filter
  * directly above a condition-free join) contains the
  * [[HaversineArgExpr]] `< literal` conjunct with one point per side.
  */
object SpatialJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  /** Bin-helper column prefix; also the idempotence marker (a join whose
    * condition already references __hav_ attributes is our own output —
    * the surrounding batch runs to fixed point and may push the re-applied
    * distance filter back into the rewritten join's condition). */
  private val Tag = "__hav_"

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(left, right, jt, Some(cond), hint)
        if (jt == Inner || jt == Cross) && !cond.references.exists(_.name.startsWith(Tag)) =>
      rewrite(left, right, splitConjunctivePredicates(cond), hint, j.output).getOrElse(j)
    case f @ Filter(cond, Join(left, right, jt, None, hint))
        if jt == Inner || jt == Cross =>
      rewrite(left, right, splitConjunctivePredicates(cond), hint, f.output).getOrElse(f)
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      conjuncts: Seq[Expression], hint: JoinHint,
      out: Seq[Attribute]): Option[LogicalPlan] = {
    val hit = conjuncts.collectFirst {
      case LessThan(h: HaversineArgExpr, Literal(c: Double, DoubleType)) => (h, c)
      case GreaterThan(Literal(c: Double, DoubleType), h: HaversineArgExpr) => (h, c)
      case LessThanOrEqual(h: HaversineArgExpr, Literal(c: Double, DoubleType)) => (h, c)
      case GreaterThanOrEqual(Literal(c: Double, DoubleType), h: HaversineArgExpr) => (h, c)
    }
    hit.flatMap { case (h, c) =>
      // hav < c ⟺ arc < 2·asin(√c); past ~60° of arc the bins stop
      // pruning anything and the rewrite is pure overhead.
      val radiusDeg =
        if (c <= 0 || c >= 1) Double.NaN
        else math.toDegrees(2 * math.asin(math.sqrt(c)))
      // Lower bound: below ~1e-4° (≈11 m) nBi explodes past 10⁷ and the
      // polar full-ring fan-out (and Int bin indices) stop being sane —
      // decline and let the join run as written.
      if (!h.deterministic || radiusDeg.isNaN || radiusDeg < 1e-4 || radiusDeg > 60) None
      else {
        val r1 = h.lon1.references ++ h.lat1.references
        val r2 = h.lon2.references ++ h.lat2.references
        // one point per side, either orientation
        val sides: Option[((Expression, Expression), (Expression, Expression))] =
          if (r1.subsetOf(left.outputSet) && r2.subsetOf(right.outputSet))
            Some(((h.lon1, h.lat1), (h.lon2, h.lat2)))
          else if (r2.subsetOf(left.outputSet) && r1.subsetOf(right.outputSet))
            Some(((h.lon2, h.lat2), (h.lon1, h.lat1)))
          else None
        sides.map { case (coordsL, coordsR) =>
          // Explode the smaller side: its rows are multiplied by the
          // neighborhood fan-out, the larger side is never replicated.
          val explodeLeft = left.stats.sizeInBytes < right.stats.sizeInBytes
          val (ptPlan, ptCoords, exPlan, exCoords) =
            if (explodeLeft) (right, coordsR, left, coordsL)
            else (left, coordsL, right, coordsR)

          // Bins are radius/4, as in Atlas.pairs (Atlas.scala:105-111):
          // with bin = radius the whole planet collapses onto a handful of
          // join keys at large radii (≈28 keys at 55°) and a shuffled hash
          // join cannot spread — finer bins keep the key space dense at
          // the cost of a wider constant fan-out on the exploded side.
          val nSub = 4
          val binW = radiusDeg / nSub
          val nBi = math.max(1L, math.ceil(360.0 / binW).toLong)
          def bin(v: Expression, off: Double): Expression =
            Floor(Divide(Add(Cast(v, DoubleType), Literal(off)), Literal(binW)))

          // point side: one (bi, bj) bin
          val biP = Alias(Pmod(bin(ptCoords._1, 180.0), Literal(nBi)), s"${Tag}bi")()
          val bjP = Alias(bin(ptCoords._2, 90.0), s"${Tag}bj")()
          val pProj = Project(ptPlan.output ++ Seq(biP, bjP), ptPlan)

          // exploded side: ±nSub latitude bins (lat differs by ≤ radius =
          // nSub bins)...
          val kjAttr = AttributeReference(s"${Tag}kj", IntegerType, nullable = false)()
          val g1 = Generate(
            Explode(Literal.create((-nSub to nSub).toSeq,
              ArrayType(IntegerType, containsNull = false))),
            Nil, outer = false, None, Seq(kjAttr), exPlan)
          // ...and per-row longitude fan-out from the exact in-radius
          // Δλ bound at the row's worst-case |lat| (its own lat ± radius).
          // When that edge reaches the pole the bound must SATURATE to the
          // full ring — clamping the latitude and evaluating the formula
          // there silently under-covers once cos(clamp) > sin(r/2) (a
          // sub-0.2° radius near the pole), dropping in-radius pairs.
          val latEdge = Add(Abs(Cast(exCoords._2, DoubleType)), Literal(radiusDeg))
          val sinHalf = math.sin(math.toRadians(radiusDeg) / 2)
          val ratio = If(GreaterThanOrEqual(latEdge, Literal(89.99)), Literal(1.0),
            Least(Seq(Literal(1.0),
              Divide(Literal(sinHalf), Cos(Multiply(latEdge, Literal(math.Pi / 180)))))))
          val dLonMax = Multiply(Literal(360.0 / math.Pi), Asin(ratio))
          // nBi ≤ 1.5e7 by the radius lower bound, so these fit Int
          val kAlias = Alias(Least(Seq(Literal((nBi / 2 + 1).toInt),
            Add(Cast(Ceil(Divide(dLonMax, Literal(binW))), IntegerType), Literal(1)))),
            s"${Tag}k")()
          val gProj = Project(g1.output :+ kAlias, g1)
          val kiAttr = AttributeReference(s"${Tag}ki", IntegerType, nullable = false)()
          // Sequence is TimeZoneAwareExpression: unresolved until tzId is
          // set (the analyzer's ResolveTimeZone has already run by now)
          val g2 = Generate(
            Explode(Sequence(UnaryMinus(kAlias.toAttribute), kAlias.toAttribute,
              Some(Literal(1)), Some(conf.sessionLocalTimeZone))),
            Nil, outer = false, None, Seq(kiAttr), gProj)
          // Injectivity window: when the fan-out saturates to the full ring
          // (polar rows), ±k spans MORE than nBi bins and two ki values can
          // land on the same pmod residue — the equi-join would then emit
          // the same pair twice. Keep exactly one representative of each
          // residue: nBi consecutive ki values.
          val kiLo = (-((nBi - 1) / 2)).toInt
          val kiHi = (nBi / 2).toInt
          val g2w = Filter(And(
            GreaterThanOrEqual(kiAttr, Literal(kiLo)),
            LessThanOrEqual(kiAttr, Literal(kiHi))), g2)
          val biE = Alias(Pmod(Add(bin(exCoords._1, 180.0), Cast(kiAttr, LongType)),
            Literal(nBi)), s"${Tag}gbi")()
          val bjE = Alias(Add(bin(exCoords._2, 90.0), Cast(kjAttr, LongType)), s"${Tag}gbj")()
          val eProj = Project(exPlan.output ++ Seq(biE, bjE), g2w)

          val joinCond = And(EqualTo(biP.toAttribute, biE.toAttribute),
            EqualTo(bjP.toAttribute, bjE.toAttribute))
          val (nl, nr) = if (explodeLeft) (eProj, pProj) else (pProj, eProj)
          val joined = Join(nl, nr, Inner, Some(joinCond), hint)
          // every original conjunct — including the distance predicate —
          // re-applied above the equi-join
          Project(out, Filter(conjuncts.reduce(And), joined))
        }
      }
    }
  }

  /** Register on an existing session (Verify/Bench build plain sessions
    * per the driver contract; [[GraftExtensions]] covers sessions created
    * through GraftSession). Idempotent. */
  def ensure(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(SpatialJoinRewrite)) {
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ SpatialJoinRewrite
    }
}
