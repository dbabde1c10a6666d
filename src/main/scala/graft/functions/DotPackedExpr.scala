package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the packed-vector dot product
  * ([[VecFns.dotPacked]]): one codegen'd static call per PAIR instead of a
  * ScalaUDF invocation, so the similarity hot path (candidates ×
  * dimension — kNN scoring, embedding near-dup, quantized rescale) stays
  * inside whole-stage codegen with no per-row UDF dispatch or closure
  * boxing. Bit-identical to the HOF form [[VecFns.dot]] and the DuckDB
  * oracle ([[VecFns.sqlDot]]): the same left-to-right IEEE double fold
  * over the same big-endian packed bytes.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class DotPackedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotPackedExpr.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotPackedExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotPackedExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_packed"
}

object DotPackedExpr {
  /** Called from generated code — keep public and static-shaped. Same
    * left-to-right fold as the interpreted twin; ByteBuffer's default
    * big-endian order matches [[VecFns.packVec]]. */
  def dot(a: Array[Byte], b: Array[Byte]): Double = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    var acc = 0.0
    var off = 0
    val n = math.min(a.length, b.length)
    while (off < n) { acc += ba.getDouble(off) * bb.getDouble(off); off += 8 }
    acc
  }

  /** Column-API handle. */
  def dotPackedNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotPackedExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
