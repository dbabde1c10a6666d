package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for the exact packed-set Jaccard
  * ([[TextFns.jaccardMicroPacked]]): the near-dup pair paths (MinHash
  * LSH candidates, exact n-gram verification) score each candidate pair
  * with one codegen'd static call instead of a ScalaUDF dispatch —
  * same merge-walk over two sorted packed hash streams, zero per-pair
  * allocation, bit-identical fixed-point rounding.
  *
  * Null semantics are SQL's: NULL on either side ⇒ NULL (a null packed
  * set means null/degenerate upstream text; the `jaccard_u ≥ threshold`
  * pair filters then drop that pair, same as the DuckDB oracle's NULL
  * comparison). Unequal lengths are FINE here — two documents' shingle
  * sets legitimately differ in size.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class JaccardMicroPackedExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardMicroPackedExpr.jaccardMicro(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaccardMicroPackedExpr.jaccardMicro($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardMicroPackedExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_micro_packed"
}

object JaccardMicroPackedExpr {
  /** Called from generated code — keep public and static-shaped. The
    * same merge-walk and half-away rounding as the UDF it replaces. */
  def jaccardMicro(a: Array[Byte], b: Array[Byte]): Long = {
    val ba = java.nio.ByteBuffer.wrap(a)
    val bbf = java.nio.ByteBuffer.wrap(b)
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = ba.getLong(i)
      val y = bbf.getLong(j)
      if (x == y) { inter += 1; i += 8; j += 8 }
      else if (x < y) i += 8
      else j += 8
    }
    val union = a.length / 8 + b.length / 8 - inter
    FP.roundHalfAway(inter.toDouble / union.toDouble * 1e6)
  }

  /** Column-API handle. */
  def jaccardMicroNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardMicroPackedExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
