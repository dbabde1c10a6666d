package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the haversine argument
  * hav(d) = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2) — the quantity the
  * reference thresholds and weights on directly
  * (/root/reference/src/argostats/atlas.py:59-66,104-113).
  *
  * Two reasons this is an `Expression` rather than the composed built-ins
  * of [[Geo.haversineArg]]:
  *  - it generates ONE static call per row inside whole-stage codegen
  *    (identical arithmetic, same `java.lang.Math` ops in the same order,
  *    so results are bit-equal to the composed form);
  *  - it is a *recognizable node*: the [[graft.plans.SpatialJoinRewrite]]
  *    optimizer rule pattern-matches it inside join conditions to turn a
  *    naive O(n·m) theta-join into the binned equi-join. A 4-deep tree of
  *    Sin/Cos/Multiply built-ins cannot be matched robustly.
  */
case class HaversineArgExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  def lon1: Expression = first
  def lat1: Expression = second
  def lon2: Expression = third
  def lat2: Expression = fourth

  override def dataType: DataType = DoubleType

  // Inputs must arrive as doubles — the factories ([[HaversineArgExpr.of]])
  // insert casts; AbstractDataType/ImplicitCastInputTypes are private[sql].
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_arg expects 4 DOUBLE arguments, got ${children.map(_.dataType)}")

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineArgExpr.hav(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.HaversineArgExpr.hav($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HaversineArgExpr =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)

  override def prettyName: String = "haversine_arg"
}

object HaversineArgExpr {
  /** Called from generated code — mirrors [[Geo.haversineArg]]'s built-in
    * composition op for op (same Math calls, same association) so the two
    * forms are bit-identical. */
  def hav(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val sdlat = Math.sin(Math.toRadians(lat2 - lat1) / 2)
    val sdlon = Math.sin(Math.toRadians(lon2 - lon1) / 2)
    sdlat * sdlat + Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) * sdlon * sdlon
  }

  /** Factory inserting the double casts the analyzer would have added. */
  def of(exprs: Seq[Expression]): HaversineArgExpr = {
    require(exprs.length == 4, "haversine_arg(lon1, lat1, lon2, lat2)")
    val Seq(a, b, c, d) = exprs.map(e =>
      if (e.resolved && e.dataType == DoubleType) e else Cast(e, DoubleType))
    HaversineArgExpr(a, b, c, d)
  }

  /** Column-API handle. */
  def havArg(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    ColumnBridge.column(of(Seq(lon1, lat1, lon2, lat2).map(ColumnBridge.expression)))

  /** SQL registry entry (`SELECT haversine_arg(lon1, lat1, lon2, lat2)`),
    * injected by [[graft.plans.GraftExtensions]]. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("haversine_arg"),
      new ExpressionInfo(classOf[HaversineArgExpr].getName, "haversine_arg"),
      { exprs => of(exprs) })
}
