package graft

import org.apache.spark.sql.functions._

import graft.sources.TermStore

/** The doc_id-bucketed forward index must make the sparse-retrieval
  * aggregations exchange-free while producing exactly the plain-path
  * results. */
class TermStoreSpec extends SparkSuite {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$d/documents.parquet")

  test("per-doc aggregations over the bucketed index are exchange-free and exact") {
    val tmp = graft.TempDirs.create("graft-termstore")
    TermStore.saveBucketed(docs, "terms_bucketed", buckets = 8,
      path = Some(tmp.resolve("t").toString))
    try {
      val bd = TermStore.loadBucketed(spark, "terms_bucketed")
      // norms shape: groupBy(doc_id) — the store's bucket key
      val norms = bd.groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("tf")).as("n2"))
      val p1 = norms.queryExecution.executedPlan.toString
      assert(!p1.contains("Exchange"),
        s"per-doc aggregation over the store must not shuffle:\n$p1")
      assert(p1.contains("Bucketed: true"), p1)
      // dots shape: doc_id is a SUBSET of the grouping keys — hash
      // clustering on doc_id already co-locates every (doc_id, w) group
      val dots = bd.groupBy(col("doc_id"), col("w"))
        .agg(sum(col("tf")).as("s"))
      val p2 = dots.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange"),
        s"subset-keyed aggregation must not shuffle either:\n$p2")
      // and the values are exactly the plain-path ones
      val got = norms.as[(Long, Long)].collect().sorted.toSeq
      val want = TermStore.forwardIndex(docs).groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("tf")).as("n2"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, "bucketed norms must equal the plain path")
      assert(got.nonEmpty)
    } finally TermStore.tablesOf("terms_bucketed")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("registered q97/q102 ride the store when spark.graft.termStore points at it") {
    // The round-5 layout proof lived only on hand-built frames; this is
    // the REGISTERED retrieval queries over the at-rest index: identical
    // results, a bucketed scan instead of a per-session re-tokenize, no
    // checkpoint materialization, and every doc_id exchange fed by a
    // map-side partial aggregate (the postings themselves are never
    // reshuffled by doc_id — at 100 TB the per-session
    // repartition+checkpoint is a full postings shuffle on session start).
    val tmp = graft.TempDirs.create("graft-termstore-q")
    TermStore.saveBucketed(docs, "terms_q97", buckets = 8,
      path = Some(tmp.resolve("t").toString))
    try {
      val want97 = SparkEntry.queries("q97_sparse_cosine")(spark, d).collect().toSeq
      val want102 = SparkEntry.queries("q102_hybrid_rank")(spark, d).collect().toSeq
      spark.conf.set("spark.graft.termStore", s"$d=terms_q97")
      try {
        val df97 = SparkEntry.queries("q97_sparse_cosine")(spark, d)
        assert(df97.collect().toSeq == want97,
          "q97 over the store must equal the recompute path")
        df97.queryExecution.executedPlan // force final AQE plan after collect
        val p = df97.queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true"),
          s"q97 must scan the bucketed store:\n$p")
        assert(!p.contains("Scan ExistingRDD"),
          s"no per-session checkpoint materialization over the store:\n$p")
        // any doc_id exchange must carry AGGREGATED rows (partial-combined
        // norms, finished dots), never the raw postings: an aggregate must
        // sit between the exchange and whatever it reads
        val lines = p.linesIterator.toVector
        lines.zipWithIndex.foreach { case (ln, i) =>
          if (ln.contains("Exchange hashpartitioning(doc_id")) {
            val below = lines.drop(i + 1).take(4).mkString("\n")
            assert(below.contains("HashAggregate"),
              s"doc_id exchange fed by raw postings, not an aggregate:\n$ln\n$below")
          }
        }
        // the norms subtree must come from the at-rest sidecar, not a
        // per-session re-aggregation of the postings (VERDICT r13
        // task 5: q97fwd's 0.56 s residual on the store path)
        assert(p.contains("terms_q97_norms"),
          s"q97 must serve norms from the _norms sidecar:\n$p")
        // sidecar values ≡ the in-query norms expression (same µ-rounded
        // integers over the same landed postings, by construction)
        val landed = TermStore.loadBucketed(spark, "terms_q97")
        val wantNorms = TermStore.docNorms(landed,
          spark.table("terms_q97_df"), spark.table("terms_q97_meta"))
          .as[(Long, Long)].collect().sorted.toSeq
        val gotNorms = spark.table("terms_q97_norms")
          .as[(Long, Long)].collect().sorted.toSeq
        assert(gotNorms == wantNorms && gotNorms.nonEmpty)
        assert(SparkEntry.queries("q102_hybrid_rank")(spark, d).collect().toSeq
          == want102, "q102 over the store must equal the recompute path")
      } finally spark.conf.unset("spark.graft.termStore")
    } finally TermStore.tablesOf("terms_q97")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
