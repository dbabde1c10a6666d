package graft

import org.apache.spark.sql.functions._

/** q110's verdict branches on a PLANTED corpus. The driver's oracle gate
  * proves engine≡DuckDB on the synthetic documents table, but that
  * corpus contains no cross-split exact duplicates, so the 'exact' tier
  * never fires there — this spec plants all three verdicts (corpus
  * exact, earlier-batch exact, near-dup, kept) with hand-computed
  * expected rows, and pins the at-rest DocStore path to identical
  * output over a bucketed scan.
  */
class IngestDedupSpec extends SparkSuite {
  import spark.implicits._

  // long enough to shingle (3-grams) and overlap heavily when one token
  // differs: 12 tokens → 10 shingles, 1-token edit keeps 7/13 ≈ 0.54
  private def long(tag: String) =
    s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo $tag"

  // batch = doc_id % 10 == 7; corpus = everything else
  private val planted = Seq(
    (3L, long("one")),           // corpus: exact source for 7 and 17
    (4L, long("two")),           // corpus: near source for 27
    (5L, "completely different words entirely unrelated text here okay"),
    (7L, long("one")),           // batch: exact dup of corpus 3
    (17L, long("one")),          // batch: dup of 3 AND of earlier 7 → min 3
    (27L, long("two") + " extra"), // batch: near-dup of corpus 4
    (37L, "zebra yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar"), // batch: kept
    (47L, "november mike lima kilo juliet india hotel golf foxtrot echo delta charlie"), // batch: kept, exact source for 57
    (57L, "november mike lima kilo juliet india hotel golf foxtrot echo delta charlie")) // batch: exact dup of EARLIER batch 47

  private def land(): String = {
    val dir = graft.TempDirs.create("graft-ingest").toString
    planted.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q110 verdicts: corpus exact, earlier-batch exact, near, kept") {
    val d = land()
    val got = SparkEntry.queries("q110_ingest_dedup")(spark, d)
      .select($"doc_id", $"verdict", $"match_id")
      .as[(Long, String, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (7L, "exact", Some(3L)),   // same fp as corpus 3
      (17L, "exact", Some(3L)),  // least(corpus 3, earlier batch 7) = 3
      (27L, "near", Some(4L)),   // band collision + jaccard ≥ 0.5 vs 4
      (37L, "kept", None),
      (47L, "kept", None),       // first holder of its fingerprint
      (57L, "exact", Some(47L))), // EARLIER-BATCH tier: no corpus copy
      s"unexpected verdicts: $got")
    // the near verdict must carry its measured similarity; exacts must not
    val nearJ = SparkEntry.queries("q110_ingest_dedup")(spark, d)
      .filter($"verdict" === "near").select($"jaccard_u")
      .as[Long].collect().toSeq
    assert(nearJ.nonEmpty && nearJ.forall(j => j >= 500000L && j < 1000000L),
      s"near jaccard out of range: $nearJ")
  }

  test("q110 over the at-rest DocStore matches the recompute path on a bucketed scan") {
    val d = land()
    val want = SparkEntry.queries("q110_ingest_dedup")(spark, d).collect().toSeq
    val tmp = graft.TempDirs.create("graft-ingest-store")
    graft.sources.DocStore.saveBucketed(
      spark.read.parquet(s"$d/documents.parquet"), "ingest_docstore",
      buckets = 4, path = Some(tmp.resolve("t").toString))
    try {
      spark.conf.set("spark.graft.docStore", s"$d=ingest_docstore")
      try {
        val df = SparkEntry.queries("q110_ingest_dedup")(spark, d)
        assert(df.collect().toSeq == want,
          "q110 over the store must equal the recompute path")
        assert(df.queryExecution.executedPlan.toString.contains("Bucketed: true"),
          "q110's exact tier must scan the bucketed store")
      } finally spark.conf.unset("spark.graft.docStore")
    } finally spark.sql("DROP TABLE IF EXISTS ingest_docstore")
  }
}
