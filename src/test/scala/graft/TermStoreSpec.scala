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
    val tmp = java.nio.file.Files.createTempDirectory("graft-termstore")
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
    } finally spark.sql("DROP TABLE IF EXISTS terms_bucketed")
  }
}
