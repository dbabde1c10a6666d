package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-document robustness: the generator's corpus never ships a
  * 1-2 word or empty document, so the driver's oracle gate cannot catch a
  * kernel that only crashes on one. This suite runs the text queries most
  * exposed to short inputs over a corpus built to contain them.
  *
  * Regression anchor: the Column-form `TextFns.shingles` indexes
  * element_at past the array end when size(words) < k —
  * sequence(0, greatest(size−k, −1)) yields [0, −1], not an empty array —
  * so an unguarded consumer aborts the whole job on the first short doc
  * (observed: INVALID_ARRAY_INDEX_IN_ELEMENT_AT on a 2-word doc). */
class EdgeDocsSpec extends SparkSuite {
  import spark.implicits._

  /** A documents table whose ids 0/50 are eval-mod rows and which mixes
    * normal docs with every short-doc shape the tokenizer can produce. */
  private lazy val dir: String = {
    val d = graft.TempDirs.create("graft-edgedocs").toString
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "one",
      2L -> "one two",
      3L -> " ", // whitespace only → zero tokens
      4L -> "the quick brown fox jumps over the lazy dog",
      5L -> "", // zero-LENGTH text → NaN quality ratios
      50L -> "spark filter stream spark filter",
      51L -> "a b",
      52L -> "completely unrelated words appear here today")
    texts.map { case (id, t) =>
      (id, t, "en", if (id % 2 == 0) "web" else "books", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q79 contamination spans survives sub-shingle-length documents") {
    val out = SparkEntry.queries("q79_contam_spans")(spark, dir)
      .select($"doc_id", $"n_hit_pos", $"max_run", $"max_span_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // every non-eval doc appears, short ones with zeros
    assert(out.map(_._1).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 51L, 52L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 0L, 0L, 0L)))
    assert(byId(3L) == ((3L, 0L, 0L, 0L)))
    // doc 4 is a verbatim copy of EVAL doc 0 (0 % 50 == 0): all 7 of its
    // 3-shingles match, in one contiguous run spanning the whole 9 words
    assert(byId(4L) == ((4L, 7L, 7L, 9L)))
  }

  test("q101 near-dup first-seen handles unshingleable docs as their own canonical") {
    val out = SparkEntry.queries("q101_stream_neardup")(spark, dir)
      .select($"doc_id", $"dup_of", $"is_dup")
      .as[(Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // short docs: no bands → own canonical, never duplicates of each other
    for (id <- Seq(1L, 2L, 3L, 5L, 51L)) assert(byId(id) == ((id, id, false)))
    // the verbatim repeat resolves to the first copy
    assert(byId(4L) == ((4L, 0L, true)))
  }

  test("q34/q36 pair queries return cleanly on a corpus with short docs") {
    val pairs34 = SparkEntry.queries("q34_minhash_lsh")(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs34.contains((0L, 4L))) // the verbatim near-dup pair
    // short docs never pair with each other just for being short
    assert(!pairs34.exists { case (a, b) => Set(1L, 2L, 3L, 51L)(a) && Set(1L, 2L, 3L, 51L)(b) })
    val n36 = SparkEntry.queries("q36_ngram_jaccard")(spark, dir).count()
    assert(n36 >= 1L) // 0 and 4 share source 'web' and all shingles
  }

  test("q104 classifier trains and scores through NaN-feature documents") {
    // the empty doc's ratios are 0/0 = NaN; the nanvl guards must turn
    // them into zero features and a "not keep" label instead of an ANSI
    // cast abort or NaN-poisoned gradients
    val out = SparkEntry.queries("q104_quality_classifier")(spark, dir)
      .select($"doc_id", $"label", $"score_u")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).length == 9) // every doc, including the empty one
    assert(out.forall { case (_, _, s) => s >= 0L && s <= 1000000L })
    val empty = out.find(_._1 == 5L).get
    assert(empty._2 == 0L)
  }

  /** sf0.001 with its documents table REPLACED by the degenerate corpus —
    * so every registered query (whatever tables it reads) can run. */
  private lazy val fullDir: String = {
    val dst = graft.TempDirs.create("graft-edgefull")
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p, dst.resolve(p.getFileName.toString))
    }
    java.nio.file.Files.delete(dst.resolve("documents.parquet"))
    spark.read.parquet(s"$dir/documents.parquet")
      .coalesce(1).write.mode("overwrite")
      .parquet(dst.resolve("documents.parquet").toString)
    dst.toString
  }

  test("sweep: every registered query survives the degenerate corpus") {
    // The generator never ships empty/1-word/dup-of-eval documents, so the
    // driver's oracle gate cannot catch a kernel that only crashes on one
    // (ANSI division by zero, out-of-range element_at, NaN casts…). Every
    // query must RUN — result values are the per-query tests' business.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, fullDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"queries crashed on the degenerate corpus:\n${failures.mkString("\n")}")
  }

  test("q103 BPE tokenization counts zero-token docs as zero") {
    val out = SparkEntry.queries("q103_bpe_tokenize")(spark, dir)
      .select($"doc_id", $"n_words", $"n_subtok").as[(Long, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(3L) == ((3L, 0L, 0L)))
    assert(byId(1L)._2 == 1L && byId(1L)._3 >= 1L)
  }

  test("q100 ranks NULL-quality (empty) docs FIRST — a quality gate drops them") {
    // doc 5 has zero-LENGTH text → alphaRatio = x/nullif(0) = NULL →
    // quality_u NULL. Spark's default ascending sort is NULLS FIRST,
    // DuckDB's is NULLS LAST: without an explicit placement on BOTH
    // sides, doc 5 would shift every percent_rank in source 'books' off
    // the oracle — a divergence the driver gate can never see (its
    // generator has no empty docs). NULLS FIRST is pinned as the
    // semantics: rank 1 ⇒ pct 0 ⇒ keep=false — the gate must DROP a
    // degenerate document, never crown it top percentile (the q109
    // NULL-loses contract).
    val out = SparkEntry.queries("q100_quality_calibrate")(spark, dir)
      .select($"doc_id", $"source", $"quality_u", $"pct_u", $"keep")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3), r.getBoolean(4))))
      .toMap
    val (src5, q5, pct5, keep5) = out(5L)
    assert(q5.isEmpty, "empty doc must carry NULL quality_u")
    assert(pct5 == 0L,
      s"NULL quality must percent_rank FIRST (and be dropped), got $pct5")
    assert(!keep5, "a quality gate must not keep an empty document")
    // the non-NULL docs of that source take ranks 2.. → pct in (0, 1]
    val sameSrc = out.collect { case (id, (s, q, p, _)) if s == src5 && id != 5L => p }
    assert(sameSrc.min > 0L && sameSrc.max == 1000000L)
  }
}
