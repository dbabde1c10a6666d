package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the canonical polynomial char hash
  * ([[TextFns.charHash]]): one codegen'd static call per row instead of a
  * per-CHARACTER interpreted lambda chain (`split` → `transform` →
  * `aggregate`), so document fingerprinting stays inside whole-stage
  * codegen with zero per-element overhead. Bit-identical to the HOF form
  * and the DuckDB oracle (`TextFns.sqlCharHash`) for ASCII/BMP input.
  *
  * This is the expression tier of SURVEY.md §7.3's preference order:
  * compose built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class CharHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    CharHashExpr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHashExpr =
    copy(child = newChild)

  override def prettyName: String = "char_hash"
}

object CharHashExpr {
  /** Called from generated code — keep public and static-shaped. */
  def hash(s: UTF8String): Long = TextFns.charHashJvm(s.toString)

  /** Column-API handle. */
  def charHashNative(c: Column): Column =
    ColumnBridge.column(CharHashExpr(ColumnBridge.expression(c)))

  /** SQL registry entry (`SELECT char_hash(s)`), injected by
    * [[graft.plans.GraftExtensions]]: the rolling content hash behind
    * the fingerprint/shingle family, reachable from plain SQL. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("char_hash"),
      new ExpressionInfo(classOf[CharHashExpr].getName, "char_hash"),
      { exprs =>
        require(exprs.length == 1, "char_hash(text)")
        CharHashExpr(Cast(exprs.head, org.apache.spark.sql.types.StringType))
      })
}
