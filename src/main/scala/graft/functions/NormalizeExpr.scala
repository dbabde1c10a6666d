package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization
  * (`java.text.Normalizer`): canonical composition of combining
  * sequences, so text that RENDERS identically fingerprints identically.
  *
  * Real corpora carry the same content in different Unicode forms —
  * "café" with a precomposed U+00E9 from one crawl, "cafe" + combining
  * U+0301 from another; macOS filenames decompose, most web content
  * composes — and every byte-level dedup key (md5, the rolling char
  * hash) sees the forms as distinct documents. Normalizing BEFORE
  * fingerprinting is standard pipeline hygiene (and what keeps an
  * at-rest DocStore key stable across ingest sources); Spark has no
  * built-in for it, so this is the expression tier: one codegen'd static
  * call per row, no UDF dispatch. The DuckDB oracle twin is
  * `nfc_normalize(...)` — both implement the same Unicode standard, and
  * q131 hash-verifies the equivalence end to end.
  *
  * Expression tier of SURVEY.md §7.3's preference order: compose
  * built-ins < native `Expression` with `doGenCode` < UDF.
  */
case class NormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NormalizeExpr {
  /** Called from generated code — keep public and static-shaped. Fast
    * path: `isNormalized` is O(n) with no allocation and true for the
    * overwhelmingly-common already-composed (and all-ASCII) case. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API handle. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(c)))

  /** SQL registry entry (`SELECT nfc_normalize(text)`), injected by
    * [[graft.plans.GraftExtensions]] — SQL-only users reach the same
    * codegen'd kernel the Column API (and the DocStore landing key)
    * uses; DuckDB's identically-named built-in is the oracle twin. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NormalizeExpr].getName, "nfc_normalize"),
      { exprs =>
        require(exprs.length == 1, "nfc_normalize(text)")
        NormalizeExpr(Cast(exprs.head, StringType))
      })
}
