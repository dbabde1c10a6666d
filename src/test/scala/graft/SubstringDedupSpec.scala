package graft

import org.apache.spark.sql.functions._

import graft.functions.SharedRunExpr

/** q134 — suffix-anchored exact substring dedup (VERDICT r13 task 3).
  *
  * The load-bearing case: a verbatim passage duplicated at an UNALIGNED
  * offset. q68's fixed 16-token span grid provably misses it (the two
  * copies' spans never line up, so no span hash repeats), while q134's
  * every-offset anchors propose the alignment and the in-row extension
  * recovers the exact maximal run.
  */
class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  /** 40-token passage, duplicated: doc 1 carries it at token 0, doc 2 at
    * token 5 (NOT a multiple of q68's 16-token grid), doc 3 is unrelated. */
  private val passage: Seq[String] =
    (0 until 40).map(i => s"p$i")

  private lazy val dir: String = {
    val d = TempDirs.create("graft-subdedup").toString
    val texts = Seq(
      1L -> passage.mkString(" "),
      2L -> ((0 until 5).map(i => s"f$i") ++ passage).mkString(" "),
      3L -> (100 until 140).map(i => s"z$i").mkString(" "))
    texts.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q68's span grid misses the shifted passage (the blind spot)") {
    val rows = SparkEntry.queries("q68_span_dedup")(spark, dir)
      .select($"doc_id", $"n_spans", $"n_kept")
      .as[(Long, Long, Long)].collect()
    // every span of every doc is kept — the grid sees NO duplicate span
    // even though 40 consecutive tokens are shared verbatim
    assert(rows.nonEmpty && rows.forall { case (_, n, k) => n == k },
      s"q68 unexpectedly deduped: ${rows.mkString(", ")}")
  }

  test("q134 finds the shifted passage with its exact offsets and span") {
    val out = SparkEntry.queries("q134_substring_dedup")(spark, dir)
      .select($"doc_a", $"doc_b", $"start_a", $"start_b", $"span_tokens",
        $"n_matched")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L, 5L, 40L, 40L)))
  }

  test("q134 IGNORES null-text documents instead of crashing (r14 advice)") {
    // T.tokens of a NULL text is a NULL array; the expression pipeline
    // the compiled anchor kernel replaced silently skipped such docs
    // (size(null) = -1 < k) and the kernel must keep that contract —
    // same pair set as the clean corpus, no NPE on the dirty one
    val d = TempDirs.create("graft-subdedup-null").toString
    val texts = Seq(
      (1L, passage.mkString(" ")),
      (2L, ((0 until 5).map(i => s"f$i") ++ passage).mkString(" ")),
      (4L, null.asInstanceOf[String]), // the dirty document
      (5L, "tiny")) // sub-anchor-length: the in-kernel short guard
    texts.map { case (id, t) =>
      (id, t, "en", "web", if (t == null) 0L else t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("q134_substring_dedup")(spark, d)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)),
      s"null/short docs must be invisible to the anchor join: $out")
  }

  test("SharedRunExpr: exact runs, tie-break, and overlap bounds") {
    def run(a: Seq[String], b: Seq[String], delta: Long): (Long, Long, Long) = {
      val packed = Seq((a, b, delta)).toDF("a", "b", "d")
        .select(SharedRunExpr.sharedRun($"a", $"b", $"d").as("p"))
        .select(SharedRunExpr.nMatched($"p"), SharedRunExpr.bestSpan($"p"),
          SharedRunExpr.bestStart($"p"))
        .as[(Long, Long, Long)].head()
      packed
    }
    // two runs, second longer: best = the longer; matched counts both
    assert(run(Seq("a", "b", "x", "c", "d", "e"),
      Seq("a", "b", "y", "c", "d", "e"), 0L) == ((5L, 3L, 3L)))
    // equal-length runs: the EARLIEST wins (strict > update ≡ the
    // oracle's ORDER BY span DESC, start_a)
    assert(run(Seq("a", "b", "x", "c", "d"),
      Seq("a", "b", "y", "c", "d"), 0L) == ((4L, 2L, 0L)))
    // negative delta: a's position i aligns to b's i - delta
    assert(run(Seq("p", "q"), Seq("z", "z", "z", "p", "q"), -3L)
      == ((2L, 2L, 0L)))
    // disjoint alignment (delta beyond overlap): zero everything
    assert(run(Seq("a"), Seq("a"), 5L) == ((0L, 0L, 0L)))
  }

  test("SharedRunExpr generated code COMPILES and agrees with interpreted eval") {
    // the Bloom/Janino lesson (EmbeddingCodegenSpec): a Janino reject
    // falls back to interpreted eval SILENTLY — same results, 100× the
    // candidate-extension wall — so the compile is pinned loudly here
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = SharedRunExpr(
      BoundReference(0, ArrayType(StringType), nullable = true),
      BoundReference(1, ArrayType(StringType), nullable = true),
      BoundReference(2, LongType, nullable = false))
    val proj = GenerateMutableProjection.generate(Seq(expr))
    def arr(xs: String*) =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val row = InternalRow(arr("a", "b", "c"), arr("z", "a", "b", "c"), -1L)
    val want = expr.eval(row).asInstanceOf[Long]
    assert(SharedRunExpr.pack(arr("a", "b", "c"),
      arr("z", "a", "b", "c"), -1L) == want)
    assert(proj(row).getLong(0) == want,
      "compiled shared_run disagrees with interpreted eval")
    assert(expr.eval(InternalRow(null, arr("a"), 0L)) == null)
  }

  test("intra-document repetition collapses to first-occurrence anchors") {
    // the spam shape the df cap cannot see: TWO documents (df = 2, well
    // under the cap) each repeating one 8-token window many times — the
    // per-(doc, hash) first-occurrence dedup must keep the join at one
    // row per (doc, hash), and the extension still finds the shared run
    val d = TempDirs.create("graft-subspam").toString
    val unit = (0 until 8).map(i => s"s$i").mkString(" ")
    val spam = Seq.fill(50)(unit).mkString(" ") // 400 tokens, 1 window ×393
    Seq((1L, spam), (2L, spam))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    // candidate alignments stay bounded: one row per (doc, hash) means
    // at most df² = 4 join rows per sampled hash — never 393²
    val cand = graft.queries.TextQueries.substringCandidates(spark, d)
      .collect()
    assert(cand.length <= 16,
      s"repetition must not multiply candidates: ${cand.length}")
    // and the full shared text is still recovered at delta 0
    val out = SparkEntry.queries("q134_substring_dedup")(spark, d)
      .select($"doc_a", $"doc_b", $"start_a", $"span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.contains((1L, 2L, 0L, 400L)), s"got $out")
  }

  test("anchor df cap drops boilerplate-grade anchors") {
    // 20 docs all sharing one 30-token boilerplate passage: every anchor
    // of it lives in 20 > 16 docs, so NO candidate forms — the cap keeps
    // a stopword-grade window from fanning out df² pairs
    val d = TempDirs.create("graft-subcap").toString
    val boiler = (0 until 30).map(i => s"b$i").mkString(" ")
    (0 until 20).map(i => (i.toLong, boiler, "en", "web", boiler.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(SparkEntry.queries("q134_substring_dedup")(spark, d).count() == 0L)
  }
}
