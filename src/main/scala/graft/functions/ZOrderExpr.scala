package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, ExpectsInputTypes, Expression, ExpressionInfo}
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

  /** 3-D Morton dilation: the low 21 bits of v, one per bit triple. */
  @inline def spread3(v0: Int): Long = {
    var v = v0.toLong & 0x1FFFFFL
    v = (v | (v << 32)) & 0x001F00000000FFFFL
    v = (v | (v << 16)) & 0x001F0000FF0000FFL
    v = (v | (v << 8)) & 0x100F00F00F00F00FL
    v = (v | (v << 4)) & 0x10C30C30C30C30C3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** 3-D Morton code (21 bits per dimension, 63-bit positive result). */
  def interleave3(x: Int, y: Int, z: Int): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)

  /** Column-API handle. */
  def zorder2(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrderExpr(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** 3-column Z code — real lakehouse layouts commonly cluster 2–4
    * columns; past that the per-dimension resolution (⌊62/n⌋ bits)
    * stops paying for itself, which is why the engines cap the list. */
  def zorder3(x: Column, y: Column, z: Column): Column =
    ColumnBridge.column(ZOrder3Expr(ColumnBridge.expression(x),
      ColumnBridge.expression(y), ColumnBridge.expression(z)))

  private def asInt(e: Expression): Expression = Cast(e, IntegerType)

  /** SQL registry entries (`SELECT zorder2(x, y)` / `zorder3(x, y, z)`),
    * injected by [[graft.plans.GraftExtensions]]: a SQL-only user can
    * run the lakehouse layout recipe — `INSERT ... SELECT * ORDER BY
    * zorder2(bucketized dims)` — against the same codegen'd Morton
    * kernel [[graft.sources.Layout]] writes with. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrderExpr].getName, "zorder2"),
      { exprs =>
        require(exprs.length == 2, "zorder2(x, y)")
        ZOrderExpr(asInt(exprs(0)), asInt(exprs(1)))
      })

  val registryEntry3: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("zorder3"),
      new ExpressionInfo(classOf[ZOrder3Expr].getName, "zorder3"),
      { exprs =>
        require(exprs.length == 3, "zorder3(x, y, z)")
        ZOrder3Expr(asInt(exprs(0)), asInt(exprs(1)), asInt(exprs(2)))
      })
}

/** 3-D sibling of [[ZOrderExpr]]: 21 bits per dimension. */
case class ZOrder3Expr(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOrderExpr.interleave3(x.asInstanceOf[Int], y.asInstanceOf[Int],
      z.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, z) => s"graft.functions.ZOrderExpr.interleave3($x, $y, $z)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZOrder3Expr =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "zorder3"
}
