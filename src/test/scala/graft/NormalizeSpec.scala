package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharHashExpr, NormalizeExpr}

/** NFC normalization as a fingerprint-stability guarantee: visually
  * identical Unicode forms must hash identically AFTER normalization and
  * distinctly before (otherwise the operator is vacuous), ASCII and
  * already-composed text must pass through untouched, and the q131
  * registered query must group cross-form duplicates. */
class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  // explicit escapes: raw literals are one editor-side NFC pass away
  // from silently collapsing the two forms
  private val pre = "caf\u00e9 r\u00e9sum\u00e9"
  private val dec = "cafe\u0301 re\u0301sume\u0301"

  test("NFC collapses combining sequences to the precomposed form") {
    val got = Seq(dec).toDF("t")
      .select(NormalizeExpr.nfcNormalize($"t")).as[String].head()
    assert(got == pre)
    assert(dec != pre, "fixture degenerate: forms already equal")
  }

  test("ASCII and already-composed text pass through byte-identical") {
    val probes = Seq("plain ascii text 123", pre, "")
    val got = probes.toDF("t")
      .select(NormalizeExpr.nfcNormalize($"t")).as[String].collect().toSeq
    assert(got == probes)
  }

  test("fingerprints: distinct before normalization, identical after") {
    val hashes = Seq(pre, dec).toDF("t")
      .select(CharHashExpr.charHashNative($"t").as("raw"),
        CharHashExpr.charHashNative(NormalizeExpr.nfcNormalize($"t")).as("norm"))
      .as[(Long, Long)].collect().toSeq
    assert(hashes(0)._1 != hashes(1)._1, "raw hashes must differ by form")
    assert(hashes(0)._2 == hashes(1)._2, "normalized hashes must collide")
  }

  test("null propagates, no crash") {
    val got = Seq(Some("a"), None).toDF("t")
      .select(NormalizeExpr.nfcNormalize($"t")).as[Option[String]]
      .collect().toSeq
    assert(got == Seq(Some("a"), None))
  }

  test("q131: every content group unifies across forms; raw keys split them") {
    val rows = SparkEntry.queries("q131_unicode_dedup")(
      spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"raw_h", $"norm_h", $"recomposed", $"is_dup")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    // 20 normalized groups, 40 raw keys: normalization halves the keys
    assert(rows.map(_._3).distinct.size == 20, "normalized group count")
    assert(rows.map(_._2).distinct.size == 40, "raw key count")
    // the decomposed rows are exactly the odd (doc_id div 20) stripes
    rows.foreach { case (id, _, _, rec, _) =>
      assert(rec == ((id / 20) % 2 == 1)) }
    // within every normalized group, everything but the min id is a dup
    val nonDup = rows.filter(!_._5)
    assert(nonDup.size == 20, s"one canonical per group: ${nonDup.size}")
  }
}
