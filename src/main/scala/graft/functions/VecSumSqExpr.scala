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

/** Native Catalyst expression for the vector sum of squares — the kernel
  * behind both the embedding validity gate (`Σx² > 0` drops zero-norm
  * vectors) and the L2 norm (`sqrt(Σx²)`), which previously evaluated as
  * an interpreted `aggregate` higher-order function per ROW on every
  * corpus-wide embedding scan (HOF lambdas never enter whole-stage
  * codegen — one interpreted closure dispatch per ELEMENT × 64 dims ×
  * corpus, on every member of the ANN/near-dup family).
  *
  * Bit-identical to the HOF spec `aggregate(cast(a as array<double>),
  * 0.0, (acc, x) -> acc + x*x)` and the DuckDB oracle
  * ([[VecFns.sqlDot]] of a vector with itself): the same left-to-right
  * IEEE double fold (float elements widen exactly before the multiply),
  * and an array containing a NULL element folds to NULL exactly like
  * `acc + null` does (VecFnsSpec pins the equivalence, EdgeVecsSpec the
  * dirty-corpus behavior).
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class VecSumSqExpr(child: Expression) extends UnaryExpression {
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
      s"vec_sum_sq needs array<float> or array<double>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (isFloat) VecSumSqExpr.sumSqFloat(arr)
      else VecSumSqExpr.sumSqDouble(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val helper =
      if (isFloat) "graft.functions.VecSumSqExpr.sumSqFloat"
      else "graft.functions.VecSumSqExpr.sumSqDouble"
    val boxed = ctx.freshName("sumSq")
    ev.copy(code = c.code + code"""
      boolean ${ev.isNull} = ${c.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        java.lang.Double $boxed = $helper(${c.value});
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): VecSumSqExpr =
    copy(child = newChild)

  override def prettyName: String = "vec_sum_sq"
}

object VecSumSqExpr {
  /** Called from generated code — keep public and static-shaped. Boxed
    * return so a NULL element can fold to NULL like the HOF's
    * `acc + null`; same left-to-right double fold. */
  def sumSqDouble(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = arr.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Float flavor: the float → double widening is exact, so the fold is
    * bit-identical to casting the array first. */
  def sumSqFloat(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = arr.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API handle. */
  def sumSqNative(a: Column): Column =
    ColumnBridge.column(VecSumSqExpr(ColumnBridge.expression(a)))
}
