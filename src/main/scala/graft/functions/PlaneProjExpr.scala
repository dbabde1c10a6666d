package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the hyperplane projection Σ vᵢ·signsᵢ
  * ([[VecFns.planeProj]]): the LSH band builds evaluate `tables × bits`
  * of these per ROW (q41 builds them per invocation; the q43/q67/q36
  * memo builds pay them on every cold pass and at every scale10 build),
  * and the HOF form ran one interpreted lambda per ELEMENT — 64 dims ×
  * up to 32 planes × corpus of interpreted dispatch per band pass.
  *
  * Bit-identical to the HOF spec `aggregate(sequence(1, n), 0.0,
  * (acc, i) -> acc + element_at(vec, i) * element_at(signs, i))` and the
  * DuckDB twin ([[VecFns.sqlPlaneProj]]): the same left-to-right IEEE
  * double fold against the same driver-precomputed ±1 sign literals, and
  * a NULL element folds the sum to NULL exactly like `acc + null`
  * (VecFnsSpec pins the equivalence). A vector SHORTER than the sign
  * table throws like ANSI `element_at` past the end — out of contract
  * (the validity gate pins the width upstream), never a silent partial
  * projection.
  *
  * The sign table is a `Seq` member (value equality, so repeated builds
  * stay `sameResult` and exchange reuse keeps firing) shipped into
  * generated code as a reference object.
  */
case class PlaneProjExpr(child: Expression, signs: Seq[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_proj needs array<float> or array<double>, got $other")
  }

  @transient private lazy val signsArr: Array[Double] = signs.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (isFloat) PlaneProjExpr.projFloat(arr, signsArr)
      else PlaneProjExpr.projDouble(arr, signsArr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("planeSigns", signsArr, "double[]")
    val helper =
      if (isFloat) "graft.functions.PlaneProjExpr.projFloat"
      else "graft.functions.PlaneProjExpr.projDouble"
    val boxed = ctx.freshName("proj")
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        java.lang.Double $boxed = $helper(${c.value}, $ref);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneProjExpr =
    copy(child = newChild)

  override def prettyName: String = "plane_proj"
}

object PlaneProjExpr {
  /** Called from generated code — keep public and static-shaped. Boxed
    * return so a NULL element folds to NULL like the HOF's `acc + null`;
    * same left-to-right double fold over the first `signs.length`
    * elements. */
  def projDouble(arr: ArrayData, signs: Array[Double]): java.lang.Double = {
    val n = signs.length
    if (arr.numElements() < n)
      throw new IllegalArgumentException(
        s"plane_proj: vector has ${arr.numElements()} elements, " +
          s"sign table expects $n — width must be gated upstream")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc += arr.getDouble(i) * signs(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Float flavor: exact float → double widening before the multiply. */
  def projFloat(arr: ArrayData, signs: Array[Double]): java.lang.Double = {
    val n = signs.length
    if (arr.numElements() < n)
      throw new IllegalArgumentException(
        s"plane_proj: vector has ${arr.numElements()} elements, " +
          s"sign table expects $n — width must be gated upstream")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc += arr.getFloat(i).toDouble * signs(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API handle. */
  def planeProjNative(vec: Column, signs: Seq[Double]): Column =
    ColumnBridge.column(PlaneProjExpr(ColumnBridge.expression(vec), signs))
}
