package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression for the 2-D Morton (Z-order) code: the
  * bits of two non-negative 31-bit dimension indexes interleaved into one
  * 62-bit long, so that sorting by the code clusters rows that are close
  * in BOTH dimensions.
  *
  * This is the multi-dimensional data-layout key (Delta Lake's `OPTIMIZE
  * ZORDER BY`, Hudi/Iceberg space-filling-curve clustering): a table
  * range-partitioned and sorted by the code lands files whose min/max
  * column statistics are tight little rectangles in (x, y) space, so a
  * predicate selective in EITHER dimension prunes row groups at scan
  * time — a linear sort order can only ever prune its leading column.
  * At 100 TB the difference is reading ~√s of the files instead of all
  * of them for a second-dimension predicate (ZOrderSpec measures it).
  *
  * Inputs are masked to 31 bits (callers normalize a dimension to a
  * bucket index first — rank, offset-scale, or epoch-bucket); the code is
  * therefore always non-negative and orders correctly as a signed long.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderExpr.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrderExpr.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}

object ZOrderExpr {
  /** Spread the low 31 bits of v across the even bit positions of a
    * long — the standard mask-shift Morton dilation. */
  @inline def spread(v0: Int): Long = {
    var v = v0.toLong & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Called from generated code — keep public and static-shaped.
    * x occupies even bit positions, y odd. */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)

  /** Column-API handle. */
  def zorder2(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrderExpr(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
