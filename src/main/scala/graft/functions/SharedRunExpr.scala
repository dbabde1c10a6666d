package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the in-row extension step of the
  * suffix-anchored substring dedup (q134): given two token arrays and a
  * fixed offset delta, walk the aligned overlap ONCE and return the
  * maximal shared token run (plus the total matched-token count) as one
  * packed long — `n_matched·2^40 + best_span·2^20 + best_start_a`.
  *
  * The anchor equi-join only proposes CANDIDATE (docA, docB, delta)
  * alignments (one row each); this kernel verifies them exactly against
  * the token text, so anchor-hash collisions and hash sampling can
  * propose false candidates but never a false run. The DuckDB oracle
  * computes the identical result relationally (unnest matched positions
  * → gaps-and-islands window → arg-max run): `best` updates only on a
  * STRICT longer run, which is exactly the oracle's
  * `ORDER BY span DESC, start_a` tie-break (earliest maximal run wins).
  *
  * A compiled single pass rather than HOF built-ins because the overlap
  * walk runs per candidate pair: interpreted per-element lambdas
  * (`filter`/`transform`/`aggregate`) cost ~100× on the hot path (the
  * [[TextFns]] compiled-kernel rationale), while this is one codegen'd
  * static call. Expression tier of SURVEY.md §7.3's preference order.
  */
case class SharedRunExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  private def isStrArr(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true // containsNull-agnostic
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArr(first.dataType) && isStrArr(second.dataType) &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shared_run expects (array<string>, array<string>, bigint), got " +
        children.map(_.dataType).mkString(", "))

  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    SharedRunExpr.pack(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, d) =>
      s"graft.functions.SharedRunExpr.pack($a, $b, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SharedRunExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "shared_run"
}

object SharedRunExpr {
  /** Bits per packed field — positions/spans up to 2^20 tokens, far
    * above any tokenized document this engine feeds the kernel. */
  private val FieldBits = 20
  private val FieldMask = (1L << FieldBits) - 1

  /** Called from generated code — keep public and static-shaped.
    * Position i of `a` is compared against position i − delta of `b`
    * over the full aligned overlap; a null token (can't arise from
    * [[TextFns.tokens]], guarded anyway) never matches. */
  def pack(a: ArrayData, b: ArrayData, delta: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val lo = math.max(0L, delta).toInt
    val hi = (math.min(na.toLong, nb + delta) - 1).toInt
    var i = lo
    var cur = 0L
    var curStart = 0L
    var best = 0L
    var bestStart = 0L
    var matched = 0L
    while (i <= hi) {
      val ta = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val j = i - delta.toInt
      val tb = if (b.isNullAt(j)) null else b.getUTF8String(j)
      if (ta != null && ta.equals(tb)) {
        if (cur == 0L) curStart = i.toLong
        cur += 1L
        matched += 1L
        if (cur > best) { best = cur; bestStart = curStart }
      } else cur = 0L
      i += 1
    }
    ((matched & FieldMask) << (2 * FieldBits)) |
      ((best & FieldMask) << FieldBits) | (bestStart & FieldMask)
  }

  /** Decode helpers for the packed long (Column API). */
  def nMatched(packed: Column): Column =
    org.apache.spark.sql.functions.shiftright(packed, 2 * FieldBits)
  def bestSpan(packed: Column): Column =
    org.apache.spark.sql.functions.shiftright(packed, FieldBits)
      .bitwiseAND(org.apache.spark.sql.functions.lit(FieldMask))
  def bestStart(packed: Column): Column =
    packed.bitwiseAND(org.apache.spark.sql.functions.lit(FieldMask))

  /** Column-API handle. */
  def sharedRun(a: Column, b: Column, delta: Column): Column =
    ColumnBridge.column(SharedRunExpr(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(delta)))
}
