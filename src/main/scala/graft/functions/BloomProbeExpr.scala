package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Native Catalyst expression for the Bloom membership test
  * ([[graft.operators.Sketches.Bloom.mightContain]]): the runtime
  * semi-join filter's hot path — one codegen'd static call per CORPUS row
  * testing its fingerprint against the broadcast batch filter — stays
  * inside whole-stage codegen, right next to the scan it prunes.
  *
  * The filter bytes arrive as a `lit(...)` (built by one tiny job over
  * the small side, ≤ m/8 bytes on the driver — the same bounded-model
  * shape as Spark's own InSubqueryExec/runtime-filter results), so
  * generated code references ONE array object; nothing is copied per row.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class BloomProbeExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bits: Any, h: Any): Any =
    graft.operators.Sketches.Bloom.mightContain(
      bits.asInstanceOf[Array[Byte]], h.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (bits, h) => s"graft.functions.BloomProbeExpr.mightContain($bits, $h, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomProbeExpr {
  /** Called from generated code — Janino needs a Java-visible STATIC path,
    * and a nested Scala object (`Sketches.Bloom`) has none (its compiled
    * form is an instance method on `Sketches$Bloom$`). A top-level
    * companion method gets a static forwarder on the `BloomProbeExpr`
    * class, the same discipline as [[CharHashExpr.hash]] and
    * [[ZOrderExpr]]'s interleave helpers. */
  def mightContain(bits: Array[Byte], h: Long, k: Int): Boolean =
    graft.operators.Sketches.Bloom.mightContain(bits, h, k)

  /** Column-API handle: `bits` is the packed filter (normally a literal),
    * `h` the per-row 64-bit key, `k` the builder's hash count. */
  def bloomMightContain(bits: Column, h: Column, k: Int): Column =
    ColumnBridge.column(
      BloomProbeExpr(ColumnBridge.expression(bits), ColumnBridge.expression(h), k))

  /** SQL registry entry (`SELECT ... WHERE bloom_might_contain(bits, h, k)`),
    * injected by [[graft.plans.GraftExtensions]]. `k` must be an integer
    * LITERAL — it parameterizes the probe's generated code (a hash
    * count), exactly like the builder aggregate's `k`. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomProbeExpr].getName, "bloom_might_contain"),
      { exprs =>
        require(exprs.length == 3, "bloom_might_contain(bits, hash, k)")
        val k = exprs(2) match {
          case Literal(i: Int, _) => i
          case other => throw new IllegalArgumentException(
            s"bloom_might_contain: k must be an integer literal, got $other")
        }
        BloomProbeExpr(exprs(0), exprs(1), k)
      })
}
