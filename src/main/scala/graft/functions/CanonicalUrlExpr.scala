package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalizer for cross-snapshot crawl dedup (q136): the key a
  * crawl-curation pass collapses on BEFORE any content fingerprint —
  * re-fetches of one page differ in scheme, host case, `www.`, tracking
  * parameters and fragments long before their bytes are compared.
  *
  * Canonical form, applied in this exact order (the DuckDB oracle chain
  * in q136 mirrors it step for step; UrlDedupSpec pins the variants):
  *   1. strip a leading `http://` or `https://`;
  *   2. drop everything from the first `#` (fragment);
  *   3. split at the first `/` into host and tail (no `/` → tail empty);
  *   4. host: lowercase, then strip one leading `www.`;
  *   5. tail splits at the first `?` into path and query;
  *   6. path: strip ONE trailing `/`;
  *   7. query: drop `&`-separated params starting with `utm_`, `gclid`
  *      or `fbclid`; if none survive the `?` goes too.
  *
  * A compiled single pass (not chained `regexp_replace` built-ins)
  * because canonicalization runs once per crawl record — the hottest
  * scan of a snapshot merge; one codegen'd static call per row, zero
  * regex machinery. Registered in SQL as `canonical_url` (the
  * VERDICT r12 task-8 surface), so a SQL-only user keys on the same
  * expression the Column API uses. Expression tier of SURVEY.md §7.3's
  * preference order.
  */
case class CanonicalUrlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    CanonicalUrlExpr.canon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonicalUrlExpr.canon($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrlExpr =
    copy(child = newChild)

  override def prettyName: String = "canonical_url"
}

object CanonicalUrlExpr {
  /** Called from generated code — keep public and static-shaped. */
  def canon(u: UTF8String): UTF8String =
    UTF8String.fromString(canonJvm(u.toString))

  private def dropTracking(p: String): Boolean =
    p.startsWith("utm_") || p.startsWith("gclid") || p.startsWith("fbclid")

  /** The canonicalization spec (see class doc) over a JVM string. */
  private[graft] def canonJvm(url: String): String = {
    val noScheme =
      if (url.startsWith("https://")) url.substring(8)
      else if (url.startsWith("http://")) url.substring(7)
      else url
    val hashAt = noScheme.indexOf('#')
    val s1 = if (hashAt >= 0) noScheme.substring(0, hashAt) else noScheme
    val slashAt = s1.indexOf('/')
    val rawHost = if (slashAt >= 0) s1.substring(0, slashAt) else s1
    val tail = if (slashAt >= 0) s1.substring(slashAt) else ""
    val lowered = rawHost.toLowerCase(java.util.Locale.ROOT)
    val host = if (lowered.startsWith("www.")) lowered.substring(4) else lowered
    val qAt = tail.indexOf('?')
    val path0 = if (qAt >= 0) tail.substring(0, qAt) else tail
    val qs = if (qAt >= 0) tail.substring(qAt + 1) else ""
    val path =
      if (path0.endsWith("/")) path0.substring(0, path0.length - 1) else path0
    // split(-1) keeps empty params, matching DuckDB's string_split (an
    // empty query yields one empty param, which joins back to "")
    val keep = qs.split("&", -1).filterNot(dropTracking)
    val q2 = keep.mkString("&")
    if (q2.isEmpty) host + path else host + path + "?" + q2
  }

  /** Column-API handle. */
  def canonicalUrl(c: Column): Column =
    ColumnBridge.column(CanonicalUrlExpr(ColumnBridge.expression(c)))

  /** SQL registry entry (`SELECT canonical_url(s)`), injected by
    * [[graft.plans.GraftExtensions]]. */
  val registryEntry: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("canonical_url"),
      new ExpressionInfo(classOf[CanonicalUrlExpr].getName, "canonical_url"),
      { exprs =>
        require(exprs.length == 1, "canonical_url(url)")
        CanonicalUrlExpr(Cast(exprs.head, StringType))
      })
}
