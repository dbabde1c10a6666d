package graft

import org.apache.spark.sql.functions._

import graft.functions.CanonicalUrlExpr

/** q136 / canonical_url — cross-snapshot URL dedup (VERDICT r13 task 8).
  *
  * The canonicalizer's documented steps, pinned variant by variant, plus
  * the SQL registration (SqlFunctionsSpec pattern) and the query-level
  * collapse-keep-newest contract.
  */
class UrlDedupSpec extends SparkSuite {
  import spark.implicits._

  private def canon(u: String): String = {
    val r = Seq(u).toDF("u")
      .select(CanonicalUrlExpr.canonicalUrl($"u")).as[String].head()
    r
  }

  test("canonicalizer: each variant axis collapses as documented") {
    val want = "site1.example.com/doc/9?id=3"
    // scheme, www, host case, trailing slash, tracking params, fragment
    assert(canon("http://site1.example.com/doc/9?id=3") == want)
    assert(canon("https://site1.example.com/doc/9?id=3") == want)
    assert(canon("https://www.site1.example.com/doc/9?id=3") == want)
    assert(canon("https://SITE1.Example.COM/doc/9?id=3") == want)
    assert(canon("http://site1.example.com/doc/9/?id=3") == want)
    assert(canon("http://site1.example.com/doc/9?utm_source=x&id=3") == want)
    assert(canon("http://site1.example.com/doc/9?id=3&gclid=abc") == want)
    assert(canon("http://site1.example.com/doc/9?id=3&fbclid=z#frag") == want)
    // all-tracking query: the '?' goes too
    assert(canon("http://site1.example.com/doc/9?utm_a=1&utm_b=2")
      == "site1.example.com/doc/9")
    // path case is SIGNIFICANT (only the host folds)
    assert(canon("http://site1.example.com/Doc/9")
      == "site1.example.com/Doc/9")
    // non-tracking params survive in order
    assert(canon("http://a.example.com/p?b=2&a=1&utm_x=9")
      == "a.example.com/p?b=2&a=1")
  }

  test("canonical_url: SQL ≡ Column API (registered, codegen'd)") {
    val urls = Seq(
      "https://www.Site7.example.com/doc/4/?utm_source=f&id=2#top",
      "http://plain.example.com/x?id=1",
      "host.only.example.com/p/").toDF("u").localCheckpoint()
    urls.createOrReplaceTempView("curl_in")
    val viaSql = spark.sql("SELECT canonical_url(u) AS c FROM curl_in")
      .as[String].collect().toSeq
    val viaCol = urls.select(CanonicalUrlExpr.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(viaSql == viaCol && viaSql.nonEmpty)
    assert(viaSql.head == "site7.example.com/doc/4?id=2")
  }

  test("CanonicalUrlExpr generated code COMPILES and agrees with interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = CanonicalUrlExpr(
      BoundReference(0, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val row = InternalRow(
      UTF8String.fromString("https://www.A.example.com/p/?utm_x=1&id=2#f"))
    val want = expr.eval(row).asInstanceOf[UTF8String]
    assert(want.toString == "a.example.com/p?id=2")
    assert(proj(row).getUTF8String(0) == want,
      "compiled canonical_url disagrees with interpreted eval")
    assert(expr.eval(InternalRow(null)) == null)
  }

  test("q136: every snapshot group collapses to one row, newest kept") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q136_url_dedup")(spark, d)
      .select($"curl", $"n_snapshots", $"keep_id")
      .as[(String, Long, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    // groups of 3 consecutive doc_ids share a page; the last group may be
    // partial — so the row count is ceil(nDocs / 3)
    assert(out.size == ((nDocs + 2) / 3))
    assert(out.map(_._2).sum == nDocs)
    // keep_id is the group's newest fetch (max doc_id ≡ max fetch_ts):
    // a group starting at 3b with n members keeps 3b + n − 1
    assert(out.forall { case (_, n, keep) => keep % 3 == n - 1 })
    // no tracking debris or scheme survives canonicalization
    assert(out.forall { case (c, _, _) =>
      !c.contains("utm_") && !c.contains("gclid") && !c.contains("http") })
  }
}
