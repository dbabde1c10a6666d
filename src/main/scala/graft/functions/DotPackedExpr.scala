package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expression for the packed-vector dot product
  * ([[VecFns.dotPacked]]): one codegen'd static call per PAIR instead of a
  * ScalaUDF invocation, so the similarity hot path (candidates ×
  * dimension — kNN scoring, embedding near-dup, quantized rescale) stays
  * inside whole-stage codegen with no per-row UDF dispatch or closure
  * boxing. Bit-identical to the HOF form [[VecFns.dot]] and the DuckDB
  * oracle ([[VecFns.sqlDot]]): the same left-to-right IEEE double fold
  * over the same big-endian packed bytes.
  *
  * Null semantics are SQL's (and the HOF spec's: `zip_with`/`aggregate`
  * over a NULL list): NULL on either side ⇒ NULL, where the replaced UDF
  * crashed. Mismatched non-null lengths THROW — packed vectors come from
  * one embedding column, so unequal dimensions mean an upstream bug, and
  * a truncated partial dot would be a silently wrong score.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class DotPackedExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
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
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"dot_packed: mismatched packed lengths ${a.length} vs ${b.length} " +
          "bytes — both sides must pack the same embedding dimension")
    val ba = java.nio.ByteBuffer.wrap(a)
    val bb = java.nio.ByteBuffer.wrap(b)
    var acc = 0.0
    var off = 0
    while (off < a.length) { acc += ba.getDouble(off) * bb.getDouble(off); off += 8 }
    acc
  }

  /** Column-API handle. */
  def dotPackedNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotPackedExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registry entry (`SELECT dot_packed(a, b)`), injected by
    * [[graft.plans.GraftExtensions]]: the pairwise-similarity kernel
    * over packed vectors, reachable from plain SQL. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("dot_packed"),
      new ExpressionInfo(classOf[DotPackedExpr].getName, "dot_packed"),
      { exprs =>
        require(exprs.length == 2, "dot_packed(a, b)")
        DotPackedExpr(exprs(0), exprs(1))
      })
}
