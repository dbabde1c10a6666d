package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q112 (token-budget corpus selection) — the histogram-refinement
  * engine path must equal the naive global-prefix definition row for
  * row, on corpora the gate never shows it:
  *  - the gate corpus, reconstructed here from the VERIFIED q32/q31
  *    outputs (the naive Spark-side twin of the DuckDB oracle);
  *  - a single-quality corpus, where every document lands in ONE
  *    bucket and the whole selection is the boundary-refinement path;
  *  - a corpus with an empty document (NULL quality), which must sort
  *    last under the sentinel and never be selected at a 2/5 budget.
  * Plus the budget contract: the selection fits, and the best excluded
  * document would not.
  */
class BudgetSelectSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  /** The naive definition, built from verified queries: order docs by
    * (quality desc, doc_id), keep the prefix whose running token sum is
    * within 2/5 of the corpus total. */
  private def naive(s: SparkSession, dir: String): DataFrame = {
    val t = SparkEntry.queries("q32_quality_score")(s, dir)
      .select(col("doc_id"),
        coalesce(col("quality_u"), lit(-1024L)).as("q_u"))
      .join(SparkEntry.queries("q31_token_count")(s, dir)
        .select(col("doc_id"), col("n_ws_tokens").as("tok")), Seq("doc_id"))
    val total = t.agg(sum(col("tok"))).head.getLong(0)
    val budget = total * 2 / 5
    t.withColumn("cum", sum(col("tok")).over(
      Window.orderBy(col("q_u").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select(col("doc_id"), col("q_u"), col("tok"))
  }

  private def assertSelectionExact(dir: String): Unit = {
    val got = SparkEntry.queries("q112_budget_select")(spark, dir)
    val want = naive(spark, dir)
    val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert(diff == 0, s"histogram selection differs from the naive prefix " +
      s"by $diff rows (got ${got.count()}, want ${want.count()})")
  }

  test("histogram refinement equals the naive global prefix on the gate corpus") {
    assertSelectionExact(d)
  }

  test("the selection fits the budget and is maximal") {
    val sel = SparkEntry.queries("q112_budget_select")(spark, d)
      .agg(sum(col("tok"))).head.getLong(0)
    val total = SparkEntry.queries("q31_token_count")(spark, d)
      .agg(sum(col("n_ws_tokens"))).head.getLong(0)
    val budget = total * 2 / 5
    assert(sel <= budget, s"selection ($sel tokens) exceeds budget $budget")
    // maximality: the BEST excluded doc (next in global order) overflows
    val selIds = SparkEntry.queries("q112_budget_select")(spark, d)
      .select(col("doc_id"))
    val nextTok = naiveAll(spark, d)
      .join(selIds, Seq("doc_id"), "left_anti")
      .orderBy(col("q_u").desc, col("doc_id")).limit(1)
      .select(col("tok")).head.getLong(0)
    assert(sel + nextTok > budget,
      s"selection not maximal: next doc ($nextTok tokens) still fits " +
        s"($sel of $budget used)")
  }

  private def naiveAll(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q32_quality_score")(s, dir)
      .select(col("doc_id"),
        coalesce(col("quality_u"), lit(-1024L)).as("q_u"))
      .join(SparkEntry.queries("q31_token_count")(s, dir)
        .select(col("doc_id"), col("n_ws_tokens").as("tok")), Seq("doc_id"))

  /** Land a corpus (doc_id, text, lang, source, n_chars) and return its
    * dir — the documents.parquet contract of the test tables. */
  private def landCorpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = TempDirs.create("graft-budget-corpus").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("single-quality corpus: the whole selection is the boundary-refinement path") {
    // identical text → identical quality → ONE histogram bucket; the
    // full-bucket fast path selects nothing and the entire prefix comes
    // from the boundary window, tie-broken by doc_id
    val dir = landCorpus((0L until 20L).map(i => (i, "the same words again")))
    assertSelectionExact(dir)
    val got = SparkEntry.queries("q112_budget_select")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 20 docs × 4 tokens = 80 total; budget = 32 → exactly docs 0..7
    assert(got.toSeq == (0L until 8L), s"expected docs 0..7, got ${got.toSeq}")
  }

  test("empty document (NULL quality) sorts last and is never selected") {
    val dir = landCorpus(
      (0L until 9L).map(i => (i, "a reasonably normal document text here")) :+
        (9L, ""))
    assertSelectionExact(dir)
    val got = SparkEntry.queries("q112_budget_select")(spark, dir)
      .filter(col("doc_id") === 9L).count()
    assert(got == 0, "the empty document was selected inside a 2/5 budget")
  }
}
